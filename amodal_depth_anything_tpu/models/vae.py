"""Stable-Diffusion AutoencoderKL (VAE), TPU-native.

The DepthFM branch encodes RGB / guide / depth images into SD-1.5 latents
and decodes depth predictions back (reference `src/models/depthfm/dfm.py:
20-22`, `dfm_amodal.py:37-38,273-302`, diffusers `AutoencoderKL`). This is
a functional NHWC re-implementation of that architecture:

  encoder: conv_in -> 4 down blocks (2 resnets each; stride-2 conv with
  the (0,1,0,1) asymmetric pad between blocks) -> mid (resnet, single-head
  attention, resnet) -> GN/silu/conv_out -> 8ch moments; quant_conv.
  decoder: post_quant_conv -> conv_in -> mid -> 4 up blocks (3 resnets,
  nearest-2x + conv upsample) -> GN/silu/conv_out.

`mode()` (the deterministic posterior mean the reference uses,
`dfm_amodal.py:278`) is the first 4 moment channels; scale 0.18215.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.conv import conv2d, conv2d_init, fused_upsample2x_conv
from ..ops.precision import dot_precision
from ..ops.resize import resize_nearest
from .unet_ldm import group_norm

__all__ = ["VAEConfig", "SD_VAE", "init_vae", "vae_encode_mode", "vae_decode",
           "SD_LATENT_SCALE"]

SD_LATENT_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2


SD_VAE = VAEConfig()


def _gn_init(ch):
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32)}


def _resnet_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _gn_init(cin), "conv1": conv2d_init(k1, 3, 3, cin, cout),
         "norm2": _gn_init(cout), "conv2": conv2d_init(k2, 3, 3, cout, cout)}
    if cin != cout:
        p["conv_shortcut"] = conv2d_init(k3, 1, 1, cin, cout)
    return p


def _lin_init(key, i, o):
    k = 1.0 / math.sqrt(i)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (i, o), jnp.float32, -k, k),
            "b": jax.random.uniform(kb, (o,), jnp.float32, -k, k)}


def _attn_init(key, ch):
    ks = jax.random.split(key, 4)
    return {"group_norm": _gn_init(ch),
            "to_q": _lin_init(ks[0], ch, ch), "to_k": _lin_init(ks[1], ch, ch),
            "to_v": _lin_init(ks[2], ch, ch), "to_out": _lin_init(ks[3], ch, ch)}


def _mid_init(key, ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"resnets": {"0": _resnet_init(k1, ch, ch),
                        "1": _resnet_init(k3, ch, ch)},
            "attentions": {"0": _attn_init(k2, ch)}}


def init_vae(key, cfg: VAEConfig = SD_VAE) -> dict:
    keys = iter(jax.random.split(key, 128))
    chans = list(cfg.block_out_channels)
    enc: dict = {"conv_in": conv2d_init(next(keys), 3, 3, cfg.in_channels,
                                        chans[0]),
                 "down_blocks": {}}
    ch = chans[0]
    for i, out_ch in enumerate(chans):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _resnet_init(next(keys),
                                                  ch if j == 0 else out_ch,
                                                  out_ch)
        ch = out_ch
        if i != len(chans) - 1:
            blk["downsampler"] = conv2d_init(next(keys), 3, 3, ch, ch)
        enc["down_blocks"][str(i)] = blk
    enc["mid_block"] = _mid_init(next(keys), ch)
    enc["conv_norm_out"] = _gn_init(ch)
    enc["conv_out"] = conv2d_init(next(keys), 3, 3, ch,
                                  2 * cfg.latent_channels)

    dec: dict = {"conv_in": conv2d_init(next(keys), 3, 3, cfg.latent_channels,
                                        chans[-1]),
                 "mid_block": _mid_init(next(keys), chans[-1]),
                 "up_blocks": {}}
    ch = chans[-1]
    for i, out_ch in enumerate(reversed(chans)):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _resnet_init(next(keys),
                                                  ch if j == 0 else out_ch,
                                                  out_ch)
        ch = out_ch
        if i != len(chans) - 1:
            blk["upsampler"] = conv2d_init(next(keys), 3, 3, ch, ch)
        dec["up_blocks"][str(i)] = blk
    dec["conv_norm_out"] = _gn_init(ch)
    dec["conv_out"] = conv2d_init(next(keys), 3, 3, ch, cfg.out_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv2d_init(next(keys), 1, 1, 2 * cfg.latent_channels,
                                  2 * cfg.latent_channels),
        "post_quant_conv": conv2d_init(next(keys), 1, 1, cfg.latent_channels,
                                       cfg.latent_channels),
    }


def _lin(p, x):
    if "w4" in p:  # weight-only int4 serving (ops/quant.py)
        from ..ops.quant import w4_linear
        return w4_linear(p, x)
    if "w8" in p:  # weight-only int8 serving (ops/quant.py)
        from ..ops.quant import w8_linear
        return w8_linear(p, x)
    if p["w"].dtype == jnp.int8:  # W8A8 serving (ops/quant.py)
        from ..ops.quant import int8_linear
        return int8_linear(p, x)
    return jnp.dot(x, p["w"].astype(x.dtype),
                   precision=dot_precision(x.dtype)) + p["b"].astype(x.dtype)


def _resnet(p, x):
    h = conv2d(p["conv1"], jax.nn.silu(group_norm(p["norm1"], x, eps=1e-6)),
               padding=1)
    h = conv2d(p["conv2"], jax.nn.silu(group_norm(p["norm2"], h, eps=1e-6)),
               padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn(p, x):
    b, h, w, c = x.shape
    y = group_norm(p["group_norm"], x, eps=1e-6).reshape(b, h * w, c)
    q = _lin(p["to_q"], y)[:, None]  # single head: [B, 1, N, C]
    k = _lin(p["to_k"], y)[:, None]
    v = _lin(p["to_v"], y)[:, None]
    # f32 attention ALWAYS: this single 64x64-token block is cheap, f32
    # softmax is better numerics, and on the v5e toolchain the bf16
    # batched (B>=2) lowering makes the backend fabricate a mixed-
    # precision tpu.matmul Mosaic rejects ("Bad lhs type") — the round-1
    # depthfm_generate compile failure, root-caused to exactly this op.
    o = multi_head_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                             v.astype(jnp.float32), impl="xla")[:, 0]
    o = o.astype(x.dtype)
    return x + _lin(p["to_out"], o).reshape(b, h, w, c)


def _mid(p, x):
    x = _resnet(p["resnets"]["0"], x)
    x = _attn(p["attentions"]["0"], x)
    return _resnet(p["resnets"]["1"], x)


def vae_encode_mode(params: dict, x: jax.Array,
                    cfg: VAEConfig = SD_VAE) -> jax.Array:
    """[B,H,W,3] in [-1,1] -> posterior mean latents [B,H/8,W/8,4] *scale."""
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x, padding=1)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = enc["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk["resnets"][str(j)], h)
        if "downsampler" in blk:
            # diffusers Downsample2D pads (0,1,0,1) then stride-2 VALID
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(blk["downsampler"], h, stride=2, padding="VALID")
    h = _mid(enc["mid_block"], h)
    h = jax.nn.silu(group_norm(enc["conv_norm_out"], h, eps=1e-6))
    moments = conv2d(enc["conv_out"], h, padding=1)
    moments = conv2d(params["quant_conv"], moments, padding=0)
    mean = moments[..., :cfg.latent_channels]
    return mean * SD_LATENT_SCALE


def vae_decode(params: dict, z: jax.Array,
               cfg: VAEConfig = SD_VAE) -> jax.Array:
    """latents [B,h,w,4] (scaled) -> image [B,8h,8w,3] in [-1,1]."""
    z = z / SD_LATENT_SCALE
    z = conv2d(params["post_quant_conv"], z, padding=0)
    dec = params["decoder"]
    h = conv2d(dec["conv_in"], z, padding=1)
    h = _mid(dec["mid_block"], h)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = dec["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(blk["resnets"][str(j)], h)
        if "upsampler" in blk:
            # weight-only 'w8' trees keep the fused path (dequant precedes
            # the fold); W8A8 must unfuse (int8 conv can't fold)
            up = blk["upsampler"]
            if "w8" not in up and "w4" not in up \
                    and up["w"].dtype == jnp.int8:
                h = resize_nearest(h, scale_factor=2.0)
                h = conv2d(up, h, padding=1)
            else:
                h = fused_upsample2x_conv(up, h)
    h = jax.nn.silu(group_norm(dec["conv_norm_out"], h, eps=1e-6))
    return conv2d(dec["conv_out"], h, padding=1)
