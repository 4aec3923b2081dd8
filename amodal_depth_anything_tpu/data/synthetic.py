"""Synthetic SAM-amodal fixture generator.

The reference's training data (pix2gestalt_occlusions_release, ~480k
samples) is external and its train split is a missing LFS blob
(SURVEY.md §2.6) — so the training pipeline must be testable without it.
This writes a miniature on-disk tree with the exact directory layout the
SAMAmodalDataset expects (occlusion/ whole/ whole_mask/
visible_object_mask/ depth_da_update_occ/ depth_da_update_combine/ and a
filename list), with geometrically consistent masks/depths.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["make_synthetic_sam_tree"]


def make_synthetic_sam_tree(root: str, n: int = 4, hw: int = 64,
                            seed: int = 0) -> str:
    """Create the tree under `root`; returns the filename-list path."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    dirs = ["occlusion", "whole", "whole_mask", "visible_object_mask",
            "depth", "depth_da_update_occ", "depth_da_update_combine"]
    for d in dirs:
        os.makedirs(os.path.join(root, d), exist_ok=True)

    lines = []
    for i in range(n):
        rgb = (rng.random((hw, hw, 3)) * 255).astype(np.uint8)
        whole_rgb = (rng.random((hw, hw, 3)) * 255).astype(np.uint8)

        # amodal object: a rectangle; occluder hides its right part
        y0, x0 = rng.integers(4, hw // 3, 2)
        y1, x1 = y0 + hw // 3, x0 + hw // 2
        whole_mask = np.zeros((hw, hw), np.uint8)
        whole_mask[y0:y1, x0:x1] = 255
        visible = whole_mask.copy()
        visible[:, (x0 + x1) // 2:] = 0

        depth = (rng.random((hw, hw)) * 0.5 + 0.25)
        depth_occ = (depth * 65535).astype(np.uint16)
        depth_combine = (np.clip(depth + 0.1 * (whole_mask > 0), 0, 1)
                         * 65535).astype(np.uint16)

        stem = f"{i:04d}"
        Image.fromarray(rgb).save(os.path.join(root, "occlusion",
                                               f"{stem}_occlusion.png"))
        # the dataset derives the whole-RGB path by replacing "occlusion" ->
        # "whole" in the FULL relative path (directory AND filename), and the
        # visible mask keeps the depth entry's basename — mirror that here.
        Image.fromarray(whole_rgb).save(os.path.join(root, "whole",
                                                     f"{stem}_whole.png"))
        Image.fromarray(whole_mask).save(os.path.join(root, "whole_mask",
                                                      f"{stem}_occlusion.png"))
        Image.fromarray(visible).save(os.path.join(
            root, "visible_object_mask", f"{stem}_occlusion.png"))
        Image.fromarray(depth_occ).save(os.path.join(
            root, "depth_da_update_occ", f"{stem}_occlusion.png"))
        Image.fromarray(depth_combine).save(os.path.join(
            root, "depth_da_update_combine", f"{stem}_occlusion.png"))
        # the filename list references rgb + depth/ entries; loaders rewrite
        # "depth" into the sibling dirs (sam_amodal_dataset path derivation)
        lines.append(f"occlusion/{stem}_occlusion.png depth/{stem}_occlusion.png")

    list_path = os.path.join(root, "train.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return list_path
