"""Drive the framework end-to-end WITHOUT any checkpoints.

Tiny seeded random weights — outputs are meaningless numbers, but every
seam is real: preprocessing, the one-program amodal pipeline, the
generative pipeline, colorized PNG output. Swap `init_random` blocks for
`*.from_checkpoints(...)` when the released weights are on disk
(README "Quick start").

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_cpu_parallel_codegen_split_count=1 \
        python examples/quickstart_random.py out/
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from amodal_depth_anything_tpu.pipeline import (AmodalDepthPipeline,
                                                DepthFMPipeline)
from amodal_depth_anything_tpu.utils.image import colorize_depth

out_dir = sys.argv[1] if len(sys.argv) > 1 else "out"
os.makedirs(out_dir, exist_ok=True)
rng = np.random.default_rng(0)

# a synthetic scene: image + the amodal mask of the occluded object
image = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
mask = np.zeros((96, 128), np.float32)
mask[30:70, 40:90] = 1.0

# --- discriminative flagship: frozen base DAV2 + guided AmodalDAv2 ----
pipe = AmodalDepthPipeline.init_random(jax.random.PRNGKey(0), size=56)
base, blended = pipe(image, mask)
print("amodal pipeline:", base.shape, blended.shape,
      "finite:", bool(np.isfinite(blended).all()))

from PIL import Image

Image.fromarray((colorize_depth(blended) * 255).astype(np.uint8)).save(
    os.path.join(out_dir, "blended_depth.png"))

# --- generative family: DepthFMAmodal 2-step Euler ---------------------
# deep_cache="2,2" is the gated serving recommendation (trained-proxy
# quality-gate PASS, +21% throughput at full size — docs/ROADMAP.md
# "THE SERVING MENU"); every deep_cache surface accepts "interval[,groups]"
dpipe = DepthFMPipeline.init_random(jax.random.PRNGKey(2), size=32,
                                    num_steps=2, deep_cache="2,2")
depth = dpipe(image, mask, base)  # base depth as the observation
print("depthfm pipeline:", depth.shape,
      "finite:", bool(np.isfinite(depth).all()))
Image.fromarray((colorize_depth(depth) * 255).astype(np.uint8)).save(
    os.path.join(out_dir, "depthfm_depth.png"))

print(f"wrote {out_dir}/blended_depth.png and {out_dir}/depthfm_depth.png")
print("next: HTTP serving without weights ->")
print("  python -m amodal_depth_anything_tpu.cli.serve --random")
