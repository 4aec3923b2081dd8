"""Pseudo-label factory: composite amodal depth GT from a frozen DAV2.

TPU re-design of the reference dataset factory
(`src/scripts/sam_pl_gen_dav2.py:40-152`): for each pix2gestalt sample,
run the frozen base DAV2 on the *whole* (un-occluded) render and on the
*occluded* render, least-squares-align whole-depth to occluded-depth over
the visible mask, and composite the aligned whole-depth into the occluded
depth under the whole mask -> `depth_da_update_combine/` (and the occluded
depth -> `depth_da_update_occ/`), both uint16/65535.

TPU-first: the two DAV2 forwards, the min-max normalization, the masked
least-squares fit (closed form, `utils.alignment.fit_scale_shift`) and the
composite all run in ONE jitted program per sample batch; chunking over
`--data_index` keeps SLURM-array compatibility (reference :53-57).

    python -m amodal_depth_anything_tpu.scripts.sam_pl_gen \
        --data_root /data/pix2gestalt_occlusions_release \
        --base_ckpt work_dir/ckp/depth_anything_v2_vitg.pth \
        --data_index 0 --num_chunks 12 [--batch 8]
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="pix2gestalt_occlusions_release root")
    p.add_argument("--base_ckpt", required=True)
    p.add_argument("--data_index", type=int, default=0)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--out_size", type=int, default=512)
    p.add_argument("--encoder", type=str, default="vitg")
    return p


def make_label_fn(raw_cfg, size):
    import jax
    import jax.numpy as jnp

    from ..models.amodal_dav2 import apply_raw_dav2
    from ..utils.alignment import fit_scale_shift

    @jax.jit
    def label(params, whole_img, occ_img, visible_mask, whole_mask):
        """All [B,S,S,*] f32; images in [0,1]. Returns (occ_depth,
        combined_depth) in [0,1]."""
        def depth_of(img):
            d = apply_raw_dav2(params, raw_cfg, img)
            lo = jnp.min(d, axis=(-1, -2), keepdims=True)
            hi = jnp.max(d, axis=(-1, -2), keepdims=True)
            return (d - lo) / jnp.maximum(hi - lo, 1e-8)

        whole_depth = depth_of(whole_img)
        occ_depth = depth_of(occ_img)
        scale, shift = fit_scale_shift(whole_depth, occ_depth,
                                       visible_mask[..., 0])
        aligned = whole_depth * scale[:, None, None] + shift[:, None, None]
        combined = jnp.where(whole_mask[..., 0] > 0, aligned, occ_depth)
        return occ_depth, combined

    return label


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from PIL import Image

    from ..convert.torch_to_jax import convert_dav2, infer_dav2_config, \
        load_state_dict
    from ..data.base_depth_dataset import resize_nearest_exact_np

    sd = load_state_dict(args.base_ckpt)
    raw_cfg = infer_dav2_config(sd, raw=True)
    params = convert_dav2(sd, raw_cfg)
    label = make_label_fn(raw_cfg, args.size)

    occ_dir = os.path.join(args.data_root, "occlusion")
    stems = sorted(f.replace("_occlusion.png", "")
                   for f in os.listdir(occ_dir) if f.endswith(".png"))
    chunks = np.array_split(np.asarray(stems), max(args.num_chunks, 1))
    stems = chunks[args.data_index].tolist()

    out_occ = os.path.join(args.data_root, "depth_da_update_occ")
    out_comb = os.path.join(args.data_root, "depth_da_update_combine")
    os.makedirs(out_occ, exist_ok=True)
    os.makedirs(out_comb, exist_ok=True)

    def load_img(path):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return resize_nearest_exact_np(img, (args.size, args.size))

    def load_mask(path):
        m = (np.asarray(Image.open(path)) > 0).astype(np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        return resize_nearest_exact_np(m[..., None], (args.size, args.size))

    for i in range(0, len(stems), args.batch):
        batch = stems[i:i + args.batch]
        whole = np.stack([load_img(os.path.join(
            args.data_root, "whole", f"{s}_whole.png")) for s in batch])
        occ = np.stack([load_img(os.path.join(
            occ_dir, f"{s}_occlusion.png")) for s in batch])
        vis = np.stack([load_mask(os.path.join(
            args.data_root, "visible_object_mask", f"{s}_visible_mask.png"))
            for s in batch])
        wm = np.stack([load_mask(os.path.join(
            args.data_root, "whole_mask", f"{s}_whole_mask.png"))
            for s in batch])
        occ_depth, combined = label(params, jnp.asarray(whole),
                                    jnp.asarray(occ), jnp.asarray(vis),
                                    jnp.asarray(wm))
        occ_depth = np.asarray(occ_depth)
        combined = np.asarray(combined)
        for b, stem in enumerate(batch):
            for arr, out_dir in ((occ_depth[b], out_occ),
                                 (combined[b], out_comb)):
                u16 = (np.clip(arr, 0, 1) * 65535.0).astype(np.uint16)
                Image.fromarray(u16).resize(
                    (args.out_size, args.out_size)).save(
                    os.path.join(out_dir, f"{stem}_depth.png"))
        print(f"[{i + len(batch)}/{len(stems)}]", flush=True)


if __name__ == "__main__":
    main()
