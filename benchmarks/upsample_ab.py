"""A/B on the real TPU: nearest2x+conv3x3 vs fused_upsample2x_conv, b8
bf16, at the three SD VAE decoder upsampler shapes + full `vae_decode`
(which uses the fused path by default).

    python benchmarks/upsample_ab.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.vae import init_vae, vae_decode
from amodal_depth_anything_tpu.ops.conv import (conv2d, conv2d_init,
                                                fused_upsample2x_conv)
from amodal_depth_anything_tpu.ops.resize import resize_nearest

B = 8
key = jax.random.PRNGKey(0)


def old(p, x):
    return conv2d(p, resize_nearest(x, scale_factor=2.0), padding=1)


def timed(jf, *args, reps=10):
    """Compile, then async launches with ONE scalar sync (the eager
    per-rep sync pattern costs ~0.8 s/op through the tunnel)."""
    t0 = time.time()
    float(jf(*args))
    tc = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = jf(*args)
    float(out)
    return (time.time() - t0) / reps * 1e3, tc


shapes = [("up0 64->128 c512", 64, 512), ("up1 128->256 c512", 128, 512),
          ("up2 256->512 c256", 256, 256)]
for name, hw, c in shapes:
    p = jax.jit(lambda k, c=c: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        conv2d_init(k, 3, 3, c, c)))(key)
    x = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
    for tag, fn in [("old", old), ("fused", fused_upsample2x_conv)]:
        jf = jax.jit(lambda pp, xx, f=fn: jnp.sum(f(pp, xx)
                                                  ).astype(jnp.float32))
        dt, tc = timed(jf, p, x)
        print(f"{name:20s} {tag:6s} {dt:8.2f} ms   (compile {tc:.1f}s)",
              flush=True)

params = jax.jit(lambda k: jax.tree.map(
    lambda a: a.astype(jnp.bfloat16), init_vae(k)))(key)
z = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
jf = jax.jit(lambda pp, zz: jnp.sum(vae_decode(pp, zz)
                                    ).astype(jnp.float32))
dt, tc = timed(jf, params, z, reps=5)
print(f"vae_decode (fused path) b8 @64->512: {dt:.2f} ms "
      f"(compile {tc:.1f}s)", flush=True)
