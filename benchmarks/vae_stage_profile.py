"""Per-stage timing of the SD VAE decoder on the real TPU (b8, bf16).

Stages mirror `vae_decode`: conv_in+mid @64x64x512, up0 (3 resnets + up)
@64->128, up1 @128->256, up2 @256->512ch->256, up3 @512^2 256->128,
final GN+silu+conv_out @512^2 — the decode segment is ~35% of the
DepthFM serving batch (encode 116 / euler4 315 / decode 234 ms b8 @512,
docs/ROADMAP.md). Run with the default (TPU) backend:

    python benchmarks/vae_stage_profile.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.unet_ldm import group_norm
from amodal_depth_anything_tpu.models.vae import SD_VAE, _mid, _resnet, init_vae
from amodal_depth_anything_tpu.ops.conv import conv2d, fused_upsample2x_conv

B = 8
params = jax.jit(init_vae)(jax.random.PRNGKey(0))
params = jax.jit(lambda t: jax.tree.map(
    lambda a: a.astype(jnp.bfloat16), t))(params)
dec = params["decoder"]
cfg = SD_VAE


def stage_conv_in(z):
    z = conv2d(params["post_quant_conv"], z, padding=0)
    return conv2d(dec["conv_in"], z, padding=1)


def stage_mid(h):
    return _mid(dec["mid_block"], h)


def make_up(i, upsample):
    blk = dec["up_blocks"][str(i)]

    def f(h):
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(blk["resnets"][str(j)], h)
        if upsample:
            h = fused_upsample2x_conv(blk["upsampler"], h)
        return h

    return f


def stage_out(h):
    h = jax.nn.silu(group_norm(dec["conv_norm_out"], h, eps=1e-6))
    return conv2d(dec["conv_out"], h, padding=1)


stages = [
    ("conv_in @64", stage_conv_in, (B, 64, 64, 4)),
    ("mid @64x512", stage_mid, (B, 64, 64, 512)),
    ("up0 @64->128 (512)", make_up(0, True), (B, 64, 64, 512)),
    ("up1 @128->256 (512)", make_up(1, True), (B, 128, 128, 512)),
    ("up2 @256->512 (512->256)", make_up(2, True), (B, 256, 256, 512)),
    ("up3 @512 (256->128)", make_up(3, False), (B, 512, 512, 256)),
    ("out GN+conv @512x128", stage_out, (B, 512, 512, 128)),
]

key = jax.random.PRNGKey(1)
for name, fn, shape in stages:
    x = jax.random.normal(key, shape, jnp.bfloat16)
    # fold the scalar sync INTO the jit program: eager sum/astype cost
    # ~0.8 s/op through the tunnel and would dominate ms-scale kernels
    jf = jax.jit(lambda a, f=fn: jnp.sum(f(a)).astype(jnp.float32))
    t0 = time.time()
    float(jf(x))  # compile+run
    tc = time.time() - t0
    reps = 10
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = jf(x)  # async launches back-to-back...
    float(out)       # ...one scalar sync at the end (house pattern)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.2f} ms   (compile+first {tc:.1f}s)", flush=True)
