"""Single-image amodal depth CLI (reference `infer.py:123-141` contract).

    python -m amodal_depth_anything_tpu.cli.infer \
        --input_image_path assets/inference_examples/case1.jpg \
        --input_mask_path assets/inference_masks/case1_mask.png \
        --output_folder out/ \
        --base_ckpt work_dir/ckp/amodal_depth_anything_base.pth \
        --amodal_ckpt work_dir/ckp/amodal_dav2_vitl

Checkpoints are the reference's published files (HF
`Zhyever/Amodal-Depth-Anything-DAV2` safetensors + the raw base .pth),
converted on the fly to JAX pytrees.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native amodal depth inference")
    p.add_argument("--input_image_path", type=str, required=True,
                   help="Path to the input image.")
    p.add_argument("--input_mask_path", type=str, required=True,
                   help="Path to the amodal mask image.")
    p.add_argument("--output_folder", type=str, required=True,
                   help="Output folder.")
    p.add_argument("--base_ckpt", type=str,
                   default="work_dir/ckp/amodal_depth_anything_base.pth",
                   help="Frozen base DAV2 checkpoint (.pth/.safetensors).")
    p.add_argument("--amodal_ckpt", type=str,
                   default="work_dir/ckp/amodal_dav2_vitl",
                   help="AmodalDAv2 checkpoint dir or model.safetensors.")
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from ..pipeline import AmodalDepthPipeline

    pipe = AmodalDepthPipeline.from_checkpoints(
        args.base_ckpt, args.amodal_ckpt, size=args.size,
        dtype=jnp.dtype(args.dtype))
    pipe.infer_single_image(args.input_image_path, args.input_mask_path,
                            args.output_folder)
    print(f"wrote renders to {args.output_folder}")


if __name__ == "__main__":
    main()
