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
           "layer_norm_2d"]


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
    3.4x the bf16 rate at DPT-head shapes."""
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
