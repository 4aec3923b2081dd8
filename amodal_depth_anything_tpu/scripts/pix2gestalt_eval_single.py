"""Qualitative pix2gestalt baseline: depth on ONE pre-computed
reconstruction.

Equivalent of the reference `src/scripts/pix2gestalt_eval_single.py`
(a hardcoded-path one-off): given a pix2gestalt whole-object
reconstruction, the raw scene depth, and the visible mask, run the
frozen DAV2 on the reconstruction, min-max normalize, and least-squares
align it to the scene depth over the visible region; write both 16-bit
maps. The reference's exact protocol (:108-148): inputs resized to 256,
model input bilinear-resized to 266 (= 14x19), depth nearest-resized
back to 256, uint16/65535 encoding.

    python -m amodal_depth_anything_tpu.scripts.pix2gestalt_eval_single \
        --reconstruction pred_reconstructions.jpg \
        --raw_depth depth_raw.png --visible_mask visible_mask.png \
        --checkpoint work_dir/ckp/depth_anything_v2_vitg.pth \
        --output_dir out/
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reconstruction", required=True,
                   help="pix2gestalt whole-object RGB render")
    p.add_argument("--raw_depth", required=True,
                   help="16-bit scene depth PNG (the alignment target)")
    p.add_argument("--visible_mask", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="raw DAV2 torch .pth / safetensors / Orbax dir")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--size", type=int, default=266,
                   help="model input size (multiple of 14; reference 266)")
    p.add_argument("--out_size", type=int, default=256)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..cli.eval import load_params_any
    from ..models import get_model
    from ..ops.resize import resize2d, resize_nearest
    from ..utils.alignment import align_depth_least_square_np

    s = args.out_size
    rec = np.asarray(Image.open(args.reconstruction).convert("RGB")
                     .resize((s, s))).astype(np.float32)
    gt_depth = np.asarray(Image.open(args.raw_depth).resize((s, s))
                          ).astype(np.float32) / 65535.0
    vis = np.asarray(Image.open(args.visible_mask).resize((s, s))) > 0
    if vis.ndim == 3:
        vis = vis[..., 0]

    from ..convert.torch_to_jax import load_state_dict, infer_dav2_config
    sd = load_state_dict(args.checkpoint)
    cfg = infer_dav2_config(sd, raw=True)
    model = get_model("DepthAnythingV2Raw", encoder=cfg.encoder)
    params = load_params_any(args.checkpoint, model)

    @jax.jit
    def run(params, rec01):
        # bilinear to the model size, forward, min-max, nearest back
        # (reference :117-128); our raw model normalizes in-graph
        x = resize2d(rec01, size=(args.size, args.size), method="bilinear")
        from ..models.amodal_dav2 import apply_raw_dav2
        d = apply_raw_dav2(params, cfg, x)
        d = (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-8)
        return resize_nearest(d[..., None], size=(s, s))[..., 0]

    depth = np.asarray(run(params, jnp.asarray(rec[None] / 255.0,
                                               jnp.float32)))[0]

    os.makedirs(args.output_dir, exist_ok=True)
    Image.fromarray((depth * 65535.0).astype(np.uint16)).save(
        os.path.join(args.output_dir, "pred_depth.png"))

    aligned, scale, shift = align_depth_least_square_np(gt_depth, depth, vis)
    Image.fromarray((np.clip(aligned, 0, 1) * 65535.0).astype(np.uint16)
                    ).save(os.path.join(args.output_dir,
                                        "combined_depth.png"))
    print(f"scale={float(scale):.5f} shift={float(shift):.5f}")
    return depth, aligned


if __name__ == "__main__":
    main()
