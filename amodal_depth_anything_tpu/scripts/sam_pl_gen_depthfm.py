"""Pseudo-label factory, DepthFM flavor.

Equivalent of the reference `src/scripts/sam_pl_gen.py` (:35-65): run
plain DepthFM (`predict_depth`, 2 steps, ensemble 10) over the raw SAM
images and write `depth/{id}_depth.png` uint16/65535 — the labels the
DAV2 flavor (`scripts/sam_pl_gen.py`) later composites. Chunked over
`--data_index` for SLURM arrays (reference chunk_size 40000).

    python -m amodal_depth_anything_tpu.scripts.sam_pl_gen_depthfm \
        --image_dir /data/sam/images --split valid.txt \
        --ckpt work_dir/ckp/depthfm-v1.ckpt --vae_ckpt vae.safetensors \
        --out_dir /data/sam/pix2gestalt_occlusions_release/depth \
        [--num_steps 2] [--ensemble 10] [--size 512] \
        [--data_index 0 --num_chunks 12]
"""

from __future__ import annotations

import argparse
import functools
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", required=True,
                   help="raw SA-1B images (sa_{id}.jpg)")
    p.add_argument("--split", required=True, help="one id per line")
    p.add_argument("--ckpt", required=True, help="depthfm-v1.ckpt")
    p.add_argument("--vae_ckpt", required=True,
                   help="SD VAE weights (diffusers .safetensors/.bin)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_steps", type=int, default=2)
    p.add_argument("--ensemble", type=int, default=10)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--data_index", type=int, default=0)
    p.add_argument("--num_chunks", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tome", type=float, default=None,
                   help="ToMe-SD ratio in the UNet (opt-in, approximate)")
    p.add_argument("--deep_cache", default=None,
                   help="DeepCache 'interval' or 'interval,groups' over "
                        "the Euler steps (opt-in, approximate; interval "
                        "must divide --num_steps; groups default 3 — the "
                        "gated serving recommendation is '2,2')")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..convert.depthfm_convert import convert_sd_vae, load_depthfm_ckpt
    from ..convert.torch_to_jax import load_state_dict
    from ..models.depthfm import depthfm_predict_depth
    from ..ops.ddim import parse_deep_cache

    with open(args.split) as f:
        ids = [ln.strip() for ln in f if ln.strip()]
    chunks = np.array_split(np.asarray(ids), args.num_chunks)
    ids = list(chunks[args.data_index])

    cfg, params = load_depthfm_ckpt(args.ckpt, guide_type="none")
    params["vae"] = convert_sd_vae(load_state_dict(args.vae_ckpt))
    dtype = jnp.dtype(args.dtype)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)

    predict = jax.jit(functools.partial(
        depthfm_predict_depth, cfg=cfg, num_steps=args.num_steps,
        ensemble_size=args.ensemble,
        tome=(args.tome, 4096) if args.tome else None,
        deep_cache=parse_deep_cache(args.deep_cache)))

    os.makedirs(args.out_dir, exist_ok=True)
    for i, sid in enumerate(ids):
        path = os.path.join(args.image_dir, f"sa_{sid}.jpg")
        im = Image.open(path).convert("RGB").resize((args.size, args.size))
        x = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0,
                        dtype)[None]
        depth = np.asarray(predict(
            params=params, rng=jax.random.PRNGKey(args.seed + i),
            ims=x)[0, :, :, 0], np.float32)
        Image.fromarray((depth * 65535.0).astype(np.uint16)).save(
            os.path.join(args.out_dir, f"{sid}_depth.png"))
    print(f"wrote {len(ids)} labels to {args.out_dir}")


if __name__ == "__main__":
    main()
