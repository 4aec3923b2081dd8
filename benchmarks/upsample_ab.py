"""A/B on the real TPU: nearest2x+conv3x3 vs fused_upsample2x_conv, b8 bf16,
at the three SD VAE decoder upsampler shapes + full vae_decode."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from amodal_depth_anything_tpu.ops.conv import conv2d, conv2d_init, fused_upsample2x_conv
from amodal_depth_anything_tpu.ops.resize import resize_nearest
from amodal_depth_anything_tpu.models.vae import init_vae, vae_decode

B = 8
key = jax.random.PRNGKey(0)

def old(p, x):
    return conv2d(p, resize_nearest(x, scale_factor=2.0), padding=1)

shapes = [("up0 64->128 c512", 64, 512), ("up1 128->256 c512", 128, 512),
          ("up2 256->512 c256", 256, 256)]
for name, hw, c in shapes:
    p = jax.jit(lambda k: conv2d_init(k, 3, 3, c, c))(key)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    x = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
    for tag, fn in [("old", old), ("fused", fused_upsample2x_conv)]:
        jf = jax.jit(fn)
        float(jnp.sum(jf(p, x).astype(jnp.float32)))  # compile
        t0 = time.time(); acc = 0.0
        for _ in range(5):
            acc += float(jnp.sum(jf(p, x).astype(jnp.float32)))
        dt = (time.time() - t0) / 5 * 1e3
        print(f"{name:20s} {tag:6s} {dt:8.2f} ms", flush=True)

params = jax.jit(init_vae)(key)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
z = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
jf = jax.jit(vae_decode)
float(jnp.sum(jf(params, z).astype(jnp.float32)))
t0 = time.time(); acc = 0.0
for _ in range(5):
    acc += float(jnp.sum(jf(params, z).astype(jnp.float32)))
print(f"vae_decode (fused path) b8 @64->512: {(time.time()-t0)/5*1e3:.2f} ms",
      flush=True)
