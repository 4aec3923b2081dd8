"""Opt-in W8A8 int8 quantization for the frozen ViT trunk (serving).

The reference has no quantized path; this is a TPU-native serving
optimization for the frozen base-depth model (ViT-G, ~60% of pipeline
time). v5e MXUs run int8 x int8 -> int32 at up to 2x bf16 rate
(measured 1.37x on the trunk's fused shapes once requant is folded).

Scheme (accuracy-conservative, calibration-free):
  * Weights: symmetric per-output-channel int8
    (`w_q = round(w / s_w)`, `s_w[out] = max|w[:, out]| / 127`).
  * Activations: static per-layer symmetric scale derived from the
    preceding LayerNorm's affine params — LN output is ~N(0,1) per
    channel before the affine, so `|x| <= sigma * max|gamma| + max|beta|`
    with sigma=6 covers ~every value; rare outliers saturate at +-127,
    which is the standard int8 clipping behavior.
  * ONLY the LayerNorm-fed matmuls are quantized (attention qkv and the
    FFN's first projection, 58-69% of trunk matmul FLOPs): their input
    distribution is bounded by construction. attn.proj / fc2 / w3 inputs
    (attention outputs, gelu/silu activations) are unbounded without
    data calibration and stay bf16.

Quantized params keep the pytree structure; `layers.linear` dispatches
on `w.dtype == int8`, so `apply_*` works unchanged (scan-stacked trunks
included). This path intentionally trades the <1e-3 reference-parity
gate for speed — it is opt-in (never default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_linear_int8", "quantize_vit_trunk_int8",
           "int8_linear", "ACT_SIGMA"]

ACT_SIGMA = 6.0


def quantize_linear_int8(p: dict, act_scale: jax.Array) -> dict:
    """Per-output-channel weight quant of a linear {'w': [..., in, out]}.

    Works on scan-stacked weights ([L, in, out]): scales are computed
    per (layer, out) pair. `act_scale` is the static input scale —
    scalar or [L] for stacked params."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0  # [..., 1, out]
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w": w_q, "w_scale": jnp.squeeze(s_w, -2),
           "act_scale": jnp.asarray(act_scale, jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """W8A8 matmul: static-scale activation quant + int8 MXU dot.

    x: [..., in]; p['w']: int8 [in, out]; p['w_scale']: [out];
    p['act_scale']: scalar. For scan-stacked params the leading layer
    axis has already been sliced off by the scan."""
    s_act = p["act_scale"].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_act * p["w_scale"].astype(jnp.float32))
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_act_scale(ln: dict, sigma: float) -> jax.Array:
    """Static input bound for a matmul fed by this LayerNorm."""
    bound = sigma * jnp.max(jnp.abs(ln["scale"]), axis=-1) + \
        jnp.max(jnp.abs(ln["bias"]), axis=-1)
    return jnp.maximum(bound / 127.0, 1e-9)


def quantize_vit_trunk_int8(params: dict, *, sigma: float = ACT_SIGMA) -> dict:
    """Quantize the LN-fed matmuls of a dinov2 param tree in place
    (returns a new tree; everything else is shared).

    `params` is the full model tree with `backbone.blocks.{norm1, attn.qkv,
    norm2, mlp.(fc1|w12)}` stacked [L, ...]."""
    params = dict(params)
    backbone = dict(params["backbone"])
    blocks = dict(backbone["blocks"])

    s_qkv = _ln_act_scale(blocks["norm1"], sigma)      # [L]
    attn = dict(blocks["attn"])
    attn["qkv"] = quantize_linear_int8(attn["qkv"], s_qkv)
    blocks["attn"] = attn

    s_ffn = _ln_act_scale(blocks["norm2"], sigma)      # [L]
    mlp = dict(blocks["mlp"])
    first = "fc1" if "fc1" in mlp else "w12"
    mlp[first] = quantize_linear_int8(mlp[first], s_ffn)
    blocks["mlp"] = mlp

    backbone["blocks"] = blocks
    params["backbone"] = backbone
    return params
