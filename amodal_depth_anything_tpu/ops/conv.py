"""NHWC convolution helpers lowering to XLA `conv_general_dilated`.

TPU-native replacements for the reference's cuDNN conv modules (DPT head,
ResidualConvUnit, ASPP, LDM UNet — SURVEY.md §2.11). Kernels are HWIO;
the torch converter transposes OIHW once at load time.

The k==stride ConvTranspose2d resize layers of the DPT head (reference
`depth_anything_v2/dpt.py:88-108`) are implemented as a matmul +
depth-to-space: with kernel==stride and zero padding each input pixel maps
to an independent k x k output block, so the op is exactly
``x @ W[c, o*k*k]`` followed by a reshape — one MXU dot, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import dot_precision

__all__ = ["conv2d", "conv2d_init", "conv_transpose_same_stride",
           "fused_upsample2x_conv", "layer_norm_2d"]


def conv2d_init(key, kh: int, kw: int, c_in: int, c_out: int, *,
                bias: bool = True) -> dict:
    fan_in = kh * kw * c_in
    bound = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    p = {"w": jax.random.uniform(wk, (kh, kw, c_in, c_out), jnp.float32,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound)
    return p


def conv2d(p: dict, x: jax.Array, *, stride: int = 1, padding="SAME") -> jax.Array:
    """NHWC conv. `padding` is an int (symmetric), pair list, or XLA string.

    Dispatches to the W8A8 int8 path when `p` holds an int8 kernel (see
    ops/quant.py::quantize_conv_int8) — v5e runs int8 convs at up to
    3.4x the bf16 rate at DPT-head shapes — and to the weight-only
    dequant path for 'w8' trees (quantize_conv_w8)."""
    if "w4" in p:
        from .quant import w4_conv2d
        return w4_conv2d(p, x, stride=stride, padding=padding)
    if "w8" in p:
        from .quant import w8_conv2d
        return w8_conv2d(p, x, stride=stride, padding=padding)
    if p["w"].dtype == jnp.int8:
        from .quant import int8_conv2d
        return int8_conv2d(p, x, stride=stride, padding=padding)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x.dtype),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def fused_upsample2x_conv(p: dict, x: jax.Array) -> jax.Array:
    """nearest-2x upsample followed by a 3x3 SAME conv, as ONE low-res conv.

    The nearest upsample makes every 3x3 window of the upsampled image read
    a 2x2 low-res neighborhood with repeated taps, so for each output phase
    (di, dj) in {0,1}^2 the 3x3 kernel folds into a 2x2 kernel on the
    low-res input: rows {0}/{1,2} of W collapse onto low-res row offsets
    {0}/{1} for di=0 and rows {0,1}/{2} onto {0}/{1} for di=1 (same for
    columns). Stacking the four phase kernels on output channels gives one
    [2,2,C,4*Cout] conv at H x W — 16 MACs/output vs the naive 36, and the
    [2H,2W,C] nearest-upsampled intermediate is never materialized. A
    depth-to-space interleave recovers y[2i+di, 2j+dj] = phase(di,dj)[i, j].

    Used by the SD VAE decoder and LDM UNet up blocks (the hot upsample
    sites of the DepthFM serving path; reference diffusers Upsample2D /
    ldm openaimodel.py Upsample both do interpolate(nearest,2x)+conv).
    Numerics: the fold sums kernel taps in f32 before the conv's usual
    cast-to-x.dtype, so it matches the unfused op up to one rounding of
    the folded weight (exact at f32/HIGHEST parity settings).
    """
    if "w4" in p:  # weight-only int4: dequant then fold (fold is f32 anyway)
        from .quant import w4_weight
        w = w4_weight(p, jnp.float32)  # [3,3,C,Cout]
    elif "w8" in p:  # weight-only int8: dequant then fold (fold is f32 anyway)
        from .quant import w8_weight
        w = w8_weight(p, jnp.float32)  # [3,3,C,Cout]
    else:
        w = p["w"].astype(jnp.float32)  # [3,3,C,Cout]
    if w.shape[:2] != (3, 3):
        raise ValueError(f"fused_upsample2x_conv needs a 3x3 kernel, got "
                         f"{w.shape}")
    c_in, c_out = w.shape[2], w.shape[3]
    # Row/col fold: F[d] maps kernel taps {0,1,2} onto low-res offsets {0,1}.
    #   d=0: offset0 <- W[0],      offset1 <- W[1]+W[2]
    #   d=1: offset0 <- W[0]+W[1], offset1 <- W[2]
    def fold_rows(wk, d):  # wk: [3, ...] -> [2, ...]
        if d == 0:
            return jnp.stack([wk[0], wk[1] + wk[2]], axis=0)
        return jnp.stack([wk[0] + wk[1], wk[2]], axis=0)

    phases = []
    for di in (0, 1):
        for dj in (0, 1):
            kr = fold_rows(w, di)                      # [2,3,C,Cout]
            kc = fold_rows(kr.transpose(1, 0, 2, 3), dj)  # [2,2,C,Cout]
            phases.append(kc.transpose(1, 0, 2, 3))    # [2,2,C,Cout]
    kernel = jnp.concatenate(phases, axis=-1)          # [2,2,C,4*Cout]

    b, h, wid, _ = x.shape
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],                      # -> [B,H+1,W+1,4Cout]
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x.dtype),
    )
    # phase(di,dj) lives at y[:, di:di+H, dj:dj+W, p*Cout:(p+1)*Cout]
    parts = [y[:, di:di + h, dj:dj + wid, i * c_out:(i + 1) * c_out]
             for i, (di, dj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
    out = jnp.stack(parts, axis=3)                     # [B,H,W,4,Cout]
    out = out.reshape(b, h, wid, 2, 2, c_out)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wid, c_out)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def conv_transpose_same_stride(p: dict, x: jax.Array, *, k: int) -> jax.Array:
    """ConvTranspose2d with kernel_size==stride==k, padding 0.

    Parameter layout: w is [C_in, k, k, C_out] (converter reshapes torch's
    [C_in, C_out, k, k]).
    """
    b, h, w_, c = x.shape
    wmat = p["w"].reshape(c, -1).astype(x.dtype)  # [C_in, k*k*C_out]
    y = jnp.dot(x.reshape(b, h * w_, c), wmat,
                precision=dot_precision(x.dtype))
    c_out = p["w"].shape[-1]
    y = y.reshape(b, h, w_, k, k, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w_ * k, c_out)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def layer_norm_2d(p: dict, x: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """Channel LayerNorm on NHWC (reference dpt.py:37-61 'channels_first'
    LayerNorm normalizes over C; in NHWC that's the last axis)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    y = (xf - u) / jnp.sqrt(s + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)
