"""Functional transformer layers with explicit parameter pytrees.

TPU-first design: all layers are pure functions over nested dicts of
arrays; per-depth block parameters are stored *stacked* along a leading
depth axis so the ViT trunk can run under `lax.scan` (fast compiles, no
per-layer HLO duplication). Weight layouts use JAX conventions
(linear: [in, out]; conv: HWIO) — the torch converter transposes once.

Functional parity targets (checked by golden tests against torch):
  * LayerNorm eps 1e-6, f32 statistics (reference `dinov2.py:96`).
  * GELU is the exact erf form (torch `nn.GELU` default).
  * LayerScale multiplies by a learned per-channel gamma
    (reference `dinov2_layers/layer_scale.py`).
  * Mlp is fc1 -> gelu -> fc2 (reference `dinov2_layers/mlp.py`);
    SwiGLUFFNFused is w12 -> split -> silu(x1)*x2 -> w3 with hidden
    size (int(8/3*d)+7)//8*8 (reference `dinov2_layers/swiglu_ffn.py`).
  * Pre-norm residual block: x += ls1(attn(norm1(x)));
    x += ls2(ffn(norm2(x))) (reference `dinov2_layers/block.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.precision import dot_precision

DEFAULT_LN_EPS = 1e-6


# ---------------------------------------------------------------- primitives

def linear_init(key, d_in: int, d_out: int, *, std: float = 0.02) -> dict:
    wk, _ = jax.random.split(key)
    w = jax.random.truncated_normal(wk, -2.0, 2.0, (d_in, d_out)) * std
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((d_out,), jnp.float32)}


def linear(p: dict, x: jax.Array) -> jax.Array:
    if "w4" in p:  # opt-in weight-only int4 serving path (ops/quant.py)
        from ..ops.quant import w4_linear
        return w4_linear(p, x)
    if "w8" in p:  # opt-in weight-only int8 serving path (ops/quant.py)
        from ..ops.quant import w8_linear
        return w8_linear(p, x)
    if p["w"].dtype == jnp.int8:  # opt-in W8A8 serving path (ops/quant.py)
        from ..ops.quant import int8_linear
        return int8_linear(p, x)
    if "smooth" in p:  # SmoothQuant-migrated but not (yet) quantized:
        # the weight rows carry s, the input must carry 1/s to stay exact
        x = x * p["smooth"].astype(x.dtype)
    y = jnp.dot(x, p["w"].astype(x.dtype), precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: dict, x: jax.Array, *, eps: float = DEFAULT_LN_EPS) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def drop_path(rng, x: jax.Array, rate: float) -> jax.Array:
    """Stochastic depth (reference `dinov2_layers/drop_path.py`): drops the
    whole residual branch per sample. The reference trains with rate 0
    (`dinov2.py` defaults); provided for completeness — identity when
    rate == 0 or rng is None."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return x * mask.astype(x.dtype) / keep


# ------------------------------------------------------------------- FFN

def mlp_init(key, dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden), "fc2": linear_init(k2, hidden, dim)}


def mlp_hidden(p: dict, x: jax.Array) -> jax.Array:
    """Input of the FFN's last projection (exposed for int8 calibration)."""
    return gelu(linear(p["fc1"], x))


def mlp(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], mlp_hidden(p, x))


def swiglu_hidden_dim(dim: int, mlp_ratio: float = 4.0) -> int:
    hidden = int(dim * mlp_ratio * 2 / 3)
    return (hidden + 7) // 8 * 8


def swiglu_init(key, dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"w12": linear_init(k1, dim, 2 * hidden), "w3": linear_init(k2, hidden, dim)}


def swiglu_hidden(p: dict, x: jax.Array) -> jax.Array:
    """Input of the FFN's last projection (exposed for int8 calibration)."""
    x12 = linear(p["w12"], x)
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return jax.nn.silu(x1) * x2


def swiglu(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["w3"], swiglu_hidden(p, x))


# ------------------------------------------------------------------- attention

def attention_init(key, dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"qkv": linear_init(k1, dim, 3 * dim), "proj": linear_init(k2, dim, dim)}


def attention_core(p: dict, x: jax.Array, *, num_heads: int,
                   attn_impl: str | None = None,
                   kv_len: int | None = None) -> jax.Array:
    """qkv + attention, WITHOUT the output projection (the pre-proj
    activation is what int8 calibration needs to bound)."""
    b, n, c = x.shape
    d = c // num_heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, num_heads, d)
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))  # [B,H,N,D]
    o = multi_head_attention(q, k, v, impl=attn_impl, kv_len=kv_len)
    return jnp.moveaxis(o, 1, 2).reshape(b, n, c)


def self_attention(p: dict, x: jax.Array, *, num_heads: int,
                   attn_impl: str | None = None,
                   kv_len: int | None = None) -> jax.Array:
    o = attention_core(p, x, num_heads=num_heads, attn_impl=attn_impl,
                       kv_len=kv_len)
    return linear(p["proj"], o)


# ------------------------------------------------------------------- block

def vit_block_init(key, dim: int, *, mlp_ratio: float = 4.0, ffn: str = "mlp",
                   init_values: float | None = 1.0) -> dict:
    k_attn, k_ffn = jax.random.split(key)
    p = {
        "norm1": layer_norm_init(dim),
        "attn": attention_init(k_attn, dim),
        "norm2": layer_norm_init(dim),
    }
    if ffn == "mlp":
        p["mlp"] = mlp_init(k_ffn, dim, int(dim * mlp_ratio))
    elif ffn == "swiglufused":
        p["mlp"] = swiglu_init(k_ffn, dim, swiglu_hidden_dim(dim, mlp_ratio))
    else:
        raise ValueError(f"unknown ffn: {ffn}")
    if init_values is not None:
        p["ls1"] = {"gamma": jnp.full((dim,), init_values, jnp.float32)}
        p["ls2"] = {"gamma": jnp.full((dim,), init_values, jnp.float32)}
    return p


def vit_block(p: dict, x: jax.Array, *, num_heads: int, ffn: str = "mlp",
              attn_impl: str | None = None,
              kv_len: int | None = None) -> jax.Array:
    h = self_attention(p["attn"], layer_norm(p["norm1"], x),
                       num_heads=num_heads, attn_impl=attn_impl,
                       kv_len=kv_len)
    if "ls1" in p:
        h = h * p["ls1"]["gamma"].astype(h.dtype)
    x = x + h
    ffn_fn = mlp if ffn == "mlp" else swiglu
    h = ffn_fn(p["mlp"], layer_norm(p["norm2"], x))
    if "ls2" in p:
        h = h * p["ls2"]["gamma"].astype(h.dtype)
    return x + h
