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

Calibrated mode (`act_stats=` from `collect_trunk_act_stats`): one
instrumented forward records per-layer amax of all four matmul inputs;
data-driven scales then cover attn.proj and fc2/w3 too, lifting int8
coverage to ~100% of trunk matmul FLOPs.

Quantized params keep the pytree structure; `layers.linear` dispatches
on `w.dtype == int8`, so `apply_*` works unchanged (scan-stacked trunks
included). This path intentionally trades the <1e-3 reference-parity
gate for speed — it is opt-in (never default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_linear_int8", "quantize_vit_trunk_int8",
           "quantize_diffusion_int8", "smoothquant_vit_trunk", "FAMILIES",
           "collect_trunk_act_stats", "calibrate_amodal_dav2",
           "merge_act_stats", "int8_linear", "int8_conv2d",
           "quantize_linear_w8", "quantize_conv_w8", "w8_weight",
           "w8_linear", "w8_conv2d",
           "quantize_linear_w4", "quantize_conv_w4", "w4_weight",
           "w4_linear", "w4_conv2d", "W4_GROUP",
           "quantize_conv_int8", "collect_dpt_head_act_stats",
           "quantize_dpt_head_int8", "calibrate_dav2_head", "ACT_SIGMA"]

ACT_SIGMA = 6.0


def quantize_linear_int8(p: dict, act_scale: jax.Array | None,
                         layer_mask: jax.Array | None = None) -> dict:
    """Per-output-channel weight quant of a linear {'w': [..., in, out]}.

    Works on scan-stacked weights ([L, in, out]): scales are computed
    per (layer, out) pair. `act_scale` is the static input scale —
    scalar or [L] for stacked params — or None for DYNAMIC per-tensor
    activation quantization at run time (one amax pass per call; no
    calibration needed — the diffusion serving path uses this).

    `layer_mask` ([L] bool, stacked params only): PER-LAYER mixed
    precision — the tree keeps the original weight alongside the int8
    payload plus a `use_q` flag, and `int8_linear` dispatches per layer
    with `lax.cond` inside the scan (only the selected weight is read
    from HBM per layer). This is the greedy gate-walk knob: quantize
    layers in ascending measured-sensitivity order and stop at the
    quality gate (scripts/int8_layer_walk.py)."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0  # [..., 1, out]
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w": w_q, "w_scale": jnp.squeeze(s_w, -2)}
    if act_scale is not None:
        out["act_scale"] = jnp.asarray(act_scale, jnp.float32)
    if "b" in p:
        out["b"] = p["b"]
    if "smooth" in p:  # SmoothQuant pre-multiplier (smoothquant_vit_trunk)
        out["smooth"] = p["smooth"]
    if layer_mask is not None:
        mask = jnp.asarray(layer_mask, jnp.bool_)
        if mask.ndim != 1 or mask.shape[0] != p["w"].shape[0]:
            raise ValueError(f"layer_mask {mask.shape} does not match "
                             f"stacked weight {p['w'].shape}")
        out["use_q"] = mask
        out["w_orig"] = p["w"]
    return out


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """W8A8 matmul: static-scale activation quant + int8 MXU dot.

    x: [..., in]; p['w']: int8 [in, out]; p['w_scale']: [out];
    p['act_scale']: scalar (absent -> dynamic per-tensor amax). For
    scan-stacked params the leading layer axis has already been sliced
    off by the scan. `p['smooth']` (SmoothQuant) rescales the input
    channels before quantization — one fusable VPU multiply.

    `p['use_q']` (scalar bool after the scan slice): per-layer mixed
    precision — lax.cond between the int8 path and the original
    full-precision matmul on `p['w_orig']`; only the taken branch's
    weight bytes move through HBM."""
    if "use_q" in p:
        from .precision import dot_precision

        def _hp(x):
            if "smooth" in p:  # w_orig rows carry the migration scale s —
                x = x * p["smooth"].astype(x.dtype)  # input must carry 1/s
            y = jnp.dot(x, p["w_orig"].astype(x.dtype),
                        precision=dot_precision(x.dtype))
            if "b" in p:
                y = y + p["b"].astype(x.dtype)
            return y

        q = {k: v for k, v in p.items() if k not in ("use_q", "w_orig")}
        return jax.lax.cond(p["use_q"], lambda x: int8_linear(q, x), _hp, x)
    if "smooth" in p:
        x = x * p["smooth"].astype(x.dtype)
    if "act_scale" in p:
        s_act = p["act_scale"].astype(jnp.float32)
    else:
        s_act = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-9)
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


def collect_trunk_act_stats(params: dict, cfg, x: jax.Array,
                            guide: jax.Array | None = None, *,
                            attn_impl: str | None = None) -> dict:
    """One instrumented forward over the ViT trunk; per-layer amax of the
    four matmul inputs.

    `params` is the full model tree (with `backbone`), `cfg` a ViTConfig,
    `x` a calibration image batch [B,H,W,3] ALREADY preprocessed the way
    the model ingests it (apply_amodal_dav2 normalizes internally, so
    pass `_normalize(x)` — or use `calibrate_amodal_dav2` below which
    handles it). Returns {"qkv_in","proj_in","fc1_in","fc2_in"}: [L]
    f32 amax arrays for `quantize_vit_trunk_int8(act_stats=...)`, plus
    per-CHANNEL amax `{"proj_in_ch": [L,D], "fc2_in_ch": [L,H]}` for
    `smoothquant_vit_trunk` outlier migration.

    Reuses the exact block sub-ops (`layer_norm`/`attention_core`/
    `mlp_hidden`/`swiglu_hidden`/`linear`) so the instrumented math is the
    deployed math; `tests/test_quant.py` pins the final carry against
    `dinov2_intermediate_layers` to catch drift."""
    from ..models.dinov2 import prepare_tokens
    from ..models.layers import (attention_core, layer_norm, linear,
                                 mlp_hidden, swiglu_hidden)

    backbone = params["backbone"]
    tokens = prepare_tokens(backbone, cfg, x, guide)
    hidden_fn = mlp_hidden if cfg.ffn == "mlp" else swiglu_hidden
    last_key = "fc2" if cfg.ffn == "mlp" else "w3"

    def block_fn(carry, p):
        t = carry
        n1 = layer_norm(p["norm1"], t)
        o = attention_core(p["attn"], n1, num_heads=cfg.num_heads,
                           attn_impl=attn_impl)
        h = linear(p["attn"]["proj"], o)
        if "ls1" in p:
            h = h * p["ls1"]["gamma"].astype(h.dtype)
        t = t + h
        n2 = layer_norm(p["norm2"], t)
        hid = hidden_fn(p["mlp"], n2)
        h = linear(p["mlp"][last_key], hid)
        if "ls2" in p:
            h = h * p["ls2"]["gamma"].astype(h.dtype)
        t = t + h

        def amax(a):
            return jnp.max(jnp.abs(a)).astype(jnp.float32)

        def amax_ch(a):  # per-channel amax over (batch, tokens)
            return jnp.max(jnp.abs(a.astype(jnp.float32)), axis=(0, 1))

        return t, (amax(n1), amax(o), amax(n2), amax(hid),
                   amax_ch(o), amax_ch(hid))

    _, (qkv_in, proj_in, fc1_in, fc2_in, proj_ch, fc2_ch) = jax.lax.scan(
        block_fn, tokens, backbone["blocks"])
    return {"qkv_in": qkv_in, "proj_in": proj_in,
            "fc1_in": fc1_in, "fc2_in": fc2_in,
            "proj_in_ch": proj_ch, "fc2_in_ch": fc2_ch}


def calibrate_amodal_dav2(params: dict, cfg, x: jax.Array, *,
                          guide_rgb=None, guide_mask=None, observation=None,
                          attn_impl: str | None = None) -> dict:
    """AmodalDAv2 front-end for `collect_trunk_act_stats`: applies the
    model's own ImageNet normalization and guide concat (x in [0,1])."""
    from ..models.amodal_dav2 import _normalize, build_guide
    guide = None if cfg.raw else build_guide(cfg, guide_rgb, guide_mask,
                                             observation)
    return collect_trunk_act_stats(params, cfg.vit, _normalize(x), guide,
                                   attn_impl=attn_impl)


def merge_act_stats(stats_list) -> dict:
    """Element-wise max over per-batch stats dicts — run
    `collect_trunk_act_stats`/`calibrate_amodal_dav2` over several
    calibration batches and merge for robust scales."""
    out = dict(stats_list[0])
    for s in stats_list[1:]:
        for k, v in s.items():
            out[k] = jnp.maximum(out[k], v)
    return out


def _stat_scale(amax: jax.Array, margin: float) -> jax.Array:
    return jnp.maximum(jnp.asarray(amax, jnp.float32) * margin / 127.0, 1e-9)


def _smooth_linear(p: dict, ch_amax: jax.Array, alpha: float):
    """Migrate per-channel activation outliers of one (stacked) linear
    into its weight rows (SmoothQuant, arXiv:2211.10438 eq. 4).

    p['w']: [L, in, out] (or [in, out]); ch_amax: [L, in] (or [in]) —
    per-INPUT-channel activation amax from `collect_trunk_act_stats`.
    s_j = amax_x_j^alpha / amax_w_j^(1-alpha); the input is multiplied by
    1/s (stored as p['smooth'], applied by `int8_linear`/`layers.linear`)
    and weight row j by s_j — mathematically exact, but the smoothed
    activation's per-tensor int8 range shrinks to max_j(amax_x_j / s_j),
    which is what defeats the outlier channels that made the calibrated
    chain FAIL the 0.05 quality gate (delta 0.129, round 3).

    Returns (new_p, smoothed_per_tensor_amax [L])."""
    w = jnp.asarray(p["w"], jnp.float32)
    a = jnp.maximum(jnp.asarray(ch_amax, jnp.float32), 1e-6)
    w_amax = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-6)  # [L, in]
    s = (a ** alpha) / (w_amax ** (1.0 - alpha))
    # guard degenerate channels (dead activations / zero rows)
    s = jnp.clip(s, 1e-4, 1e4)
    out = dict(p)
    out["w"] = (w * s[..., None]).astype(p["w"].dtype)
    prev = p.get("smooth")
    inv = (1.0 / s).astype(jnp.float32)
    out["smooth"] = inv if prev is None else prev * inv
    return out, jnp.max(a / s, axis=-1)


def smoothquant_vit_trunk(params: dict, act_stats: dict, *,
                          alpha: float = 0.5):
    """SmoothQuant outlier migration for the DATA-fed trunk matmuls
    (attn.proj and fc2/w3 — the two families whose unbounded inputs made
    the calibrated int8 chain fail the quality gate).

    Needs per-channel stats (`proj_in_ch`/`fc2_in_ch`) from
    `collect_trunk_act_stats`. Returns (params', act_stats') where the
    weights carry the migration (rows scaled by s, input pre-multiplied
    by 1/s via the 'smooth' leaf — one fusable VPU multiply at serving)
    and `proj_in`/`fc2_in` are replaced by the post-smooth per-tensor
    amax. Run BEFORE `quantize_vit_trunk_int8(act_stats=...)`."""
    params = dict(params)
    backbone = dict(params["backbone"])
    blocks = dict(backbone["blocks"])
    stats = dict(act_stats)

    attn = dict(blocks["attn"])
    attn["proj"], stats["proj_in"] = _smooth_linear(
        attn["proj"], act_stats["proj_in_ch"], alpha)
    blocks["attn"] = attn

    mlp = dict(blocks["mlp"])
    last = "fc2" if "fc2" in mlp else "w3"
    mlp[last], stats["fc2_in"] = _smooth_linear(
        mlp[last], act_stats["fc2_in_ch"], alpha)
    blocks["mlp"] = mlp

    backbone["blocks"] = blocks
    params["backbone"] = backbone
    return params, stats


FAMILIES = ("qkv", "proj", "ffn1", "ffn2")


def quantize_vit_trunk_int8(params: dict, *, sigma: float = ACT_SIGMA,
                            act_stats: dict | None = None,
                            margin: float = 1.0,
                            dynamic: bool = False,
                            families: tuple = FAMILIES,
                            smooth_alpha: float | None = None,
                            layer_mask=None) -> dict:
    """Quantize the matmuls of a dinov2 param tree (returns a new tree;
    everything else is shared).

    `params` is the full model tree with `backbone.blocks.{norm1, attn.qkv,
    norm2, mlp.(fc1|w12)}` stacked [L, ...].

    Three activation-scale modes:
      * default: calibration-free static — only the LN-fed matmuls
        (qkv + first FFN projection), scales bounded from the LN affine
        params.
      * `act_stats` (from `collect_trunk_act_stats`): data-driven static
        per-layer scales for all FOUR matmul families. `margin` widens
        the recorded amax.
      * `dynamic=True`: all four families with per-tensor amax computed
        at RUN time (one VPU reduction per matmul, ~1% of trunk time at
        serving shapes) — full int8 coverage with ZERO calibration
        programs (the calibrated path costs ~2 extra large compiles,
        ~65 min through this box's tunnel).

    `families` restricts which matmul families quantize ("qkv", "proj",
    "ffn1", "ffn2") — the knob for the gate-walk that degrades the chain
    to its best quality-PASSing subset. `smooth_alpha` applies
    SmoothQuant outlier migration to proj/ffn2 first (needs the
    per-channel stats in `act_stats`). `layer_mask` ([depth] bool)
    restricts quantization to the selected LAYERS (per-layer lax.cond
    dispatch, see `quantize_linear_int8`) — the finer gate-walk axis;
    incompatible with `smooth_alpha` (migrated weight rows would leak
    into the unquantized layers' math)."""
    if layer_mask is not None and smooth_alpha is not None:
        raise ValueError("layer_mask and smooth_alpha are incompatible")
    if smooth_alpha is not None:
        if act_stats is None or "proj_in_ch" not in act_stats:
            raise ValueError("smooth_alpha needs per-channel act_stats "
                             "from collect_trunk_act_stats")
        params, act_stats = smoothquant_vit_trunk(params, act_stats,
                                                  alpha=smooth_alpha)
    params = dict(params)
    backbone = dict(params["backbone"])
    blocks = dict(backbone["blocks"])

    if dynamic:
        s_qkv = s_proj = s_ffn = s_last = None
    else:
        s_qkv = (_stat_scale(act_stats["qkv_in"], margin) if act_stats
                 else _ln_act_scale(blocks["norm1"], sigma))   # [L]
        s_proj = (_stat_scale(act_stats["proj_in"], margin)
                  if act_stats else False)
        s_ffn = (_stat_scale(act_stats["fc1_in"], margin) if act_stats
                 else _ln_act_scale(blocks["norm2"], sigma))   # [L]
        s_last = (_stat_scale(act_stats["fc2_in"], margin)
                  if act_stats else False)
    attn = dict(blocks["attn"])
    if "qkv" in families:
        attn["qkv"] = quantize_linear_int8(attn["qkv"], s_qkv, layer_mask)
    if "proj" in families and s_proj is not False:
        attn["proj"] = quantize_linear_int8(attn["proj"], s_proj, layer_mask)
    blocks["attn"] = attn

    mlp = dict(blocks["mlp"])
    if "ffn1" in families:
        first = "fc1" if "fc1" in mlp else "w12"
        mlp[first] = quantize_linear_int8(mlp[first], s_ffn, layer_mask)
    if "ffn2" in families and s_last is not False:
        last = "fc2" if "fc2" in mlp else "w3"
        mlp[last] = quantize_linear_int8(mlp[last], s_last, layer_mask)
    blocks["mlp"] = mlp

    backbone["blocks"] = blocks
    params["backbone"] = backbone
    return params


# --------------------------------------------------------------- int8 convs

def quantize_conv_int8(p: dict, act_scale=None) -> dict:
    """Per-output-channel weight quant of a conv {'w': [kh,kw,cin,cout]}.

    `act_scale=None` -> dynamic per-tensor activation quantization at
    run time. v5e runs int8 convs at up to 3.4x the bf16 rate (measured
    285 TOP/s vs 83 TF/s at the DPT-head 3x3/384ch/292^2 shape)."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w": w_q, "w_scale": s_w.reshape(-1)}
    if act_scale is not None:
        out["act_scale"] = jnp.asarray(act_scale, jnp.float32)
    if "b" in p:
        out["b"] = p["b"]
    return out


def int8_conv2d(p: dict, x: jax.Array, *, stride: int = 1,
                padding="SAME") -> jax.Array:
    """W8A8 conv: static-scale activation quant + int8 MXU conv.

    Called through ops.conv.conv2d's dtype dispatch, so quantized head
    param trees run through the unmodified dpt_head."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if "act_scale" in p:
        s_act = p["act_scale"].astype(jnp.float32)
    else:  # dynamic per-tensor quantization (diffusion serving path)
        s_act = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-9)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_act * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# -------------------------------------------------- weight-only int8 (W8)

def quantize_linear_w8(p: dict) -> dict:
    """Weight-ONLY per-output-channel int8 of a linear {'w': [.., in, out]}.

    Params are stored int8 in HBM (half the bytes of bf16) and
    dequantized at use; activations stay full precision. The right
    scheme for PARAM-READ-BOUND serving loops — the pix2gestalt 100-step
    DDIM re-reads all ~860M UNet params every step (batched CFG measured
    neutral for exactly this reason), so halving weight bytes attacks
    the actual bottleneck with no activation-quant error and no dynamic
    amax reductions. Key is 'w8' (not 'w') so dispatch sites distinguish
    it from the W8A8 trees."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w8": w_q, "w_scale": jnp.squeeze(s_w, -2)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_conv_w8(p: dict) -> dict:
    """Weight-only per-output-channel int8 of a conv {'w': [kh,kw,ci,co]}."""
    w = jnp.asarray(p["w"], jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"w8": w_q, "w_scale": s_w.reshape(-1)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def w8_weight(p: dict, dtype) -> jax.Array:
    """Dequantized kernel in the compute dtype. The int8->f32 convert and
    per-channel scale are elementwise producers of the conv/dot operand —
    XLA fuses them into the consumer where supported, so HBM sees only
    the int8 bytes."""
    w8, s = p["w8"], p["w_scale"]
    if s.ndim == w8.ndim - 1:  # stacked linear: [L, in, out] with [L, out]
        s = s[..., None, :]
    return (w8.astype(jnp.float32) * s).astype(dtype)


def w8_linear(p: dict, x: jax.Array) -> jax.Array:
    from .precision import dot_precision
    y = jnp.dot(x, w8_weight(p, x.dtype), precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def w8_conv2d(p: dict, x: jax.Array, *, stride: int = 1,
              padding="SAME") -> jax.Array:
    from .precision import dot_precision
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w8_weight(p, x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ------------------------------------------------- weight-only int4 (W4)
#
# For PARAM-READ-BOUND loops the byte count IS the bottleneck (the
# pix2gestalt 100-step DDIM re-reads ~860M UNet params per step; W8
# measured 4.1 -> 3.45 s/completion). W4 halves the weight bytes again.
# jnp.int4 exists on this stack but is NOT bit-packed in memory (an
# int4 array occupies 1 byte/element — verified), so packing is done
# manually: two int4 values per int8 byte along the input axis,
# unpacked in-graph with two arithmetic shifts (elementwise VPU work
# XLA fuses into the consumer; HBM sees only the packed bytes).
# Accuracy is kept with per-(input-group, output-channel) scales
# (group=64 default) instead of W8's per-output-channel only.

W4_GROUP = 64


def _pack_nibbles(w_q: jax.Array, axis: int) -> jax.Array:
    """Pack int8 values in [-8, 7] pairwise along `axis` (must be even).

    low nibble = even index, high nibble = odd index."""
    lo, hi = jnp.moveaxis(w_q, axis, 0)[0::2], \
        jnp.moveaxis(w_q, axis, 0)[1::2]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return jnp.moveaxis(packed, 0, axis)


def _unpack_nibbles(packed: jax.Array, axis: int) -> jax.Array:
    """Inverse of `_pack_nibbles`: int8 [.., n/2, ..] -> int8 [.., n, ..]
    with sign extension (arithmetic shifts on int8)."""
    p = jnp.moveaxis(packed, axis, 0)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)  # sign-extend low nibble
    hi = jnp.right_shift(p, 4)                     # arithmetic -> signed
    out = jnp.stack([lo, hi], axis=1).reshape((-1,) + p.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def _w4_group(n: int, group: int) -> int:
    """Largest divisor of `n` that is <= `group` — keeps per-group scale
    granularity (the W4 accuracy mitigation) even when `n` is not a
    multiple of the requested group, instead of degrading to one
    whole-axis scale."""
    for g in range(min(group, n), 0, -1):
        if n % g == 0:
            return g
    return n


def _w4_quantize(w: jax.Array, group: int):
    """w [fan_groups*g, out]-style 2-D view NOT required — works on the
    raw array with the INPUT axis second-to-last ([..., in, out]).
    Returns (packed int8 [..., in/2, out], scales f32 [..., in/g, out])."""
    wf = jnp.asarray(w, jnp.float32)
    n_in = wf.shape[-2]
    if n_in % 2:
        raise ValueError(
            f"W4 nibble packing needs an even input-axis length, got "
            f"{n_in} (shape {tuple(w.shape)}) — only even-fan-in layers "
            "can be int4-quantized")
    g = _w4_group(n_in, group)
    grp = wf.reshape(wf.shape[:-2] + (n_in // g, g, wf.shape[-1]))
    s = jnp.max(jnp.abs(grp), axis=-2, keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(grp / s), -8, 7).astype(jnp.int8)
    q = q.reshape(wf.shape)
    return _pack_nibbles(q, q.ndim - 2), jnp.squeeze(s, -2), g


def quantize_linear_w4(p: dict, *, group: int = W4_GROUP) -> dict:
    """Weight-only int4 of a linear {'w': [.., in, out]}: nibble-packed
    int8 storage (half of W8's bytes) + per-(input-group, out) scales."""
    packed, s, g = _w4_quantize(p["w"], group)
    out = {"w4": packed, "w4_scale": s, "w4_group": int(g)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_conv_w4(p: dict, *, group: int = W4_GROUP) -> dict:
    """Weight-only int4 of a conv {'w': [kh,kw,ci,co]}: packed along ci,
    scales per (ci-group, co) shared across the spatial taps."""
    w = jnp.asarray(p["w"], jnp.float32)
    kh, kw, ci, co = w.shape
    if ci % 2:
        raise ValueError(
            f"W4 nibble packing needs an even in-channel count, got "
            f"{ci} (shape {tuple(w.shape)}) — only even-fan-in convs "
            "can be int4-quantized")
    g = _w4_group(ci, group)
    grp = w.reshape(kh, kw, ci // g, g, co)
    s = jnp.max(jnp.abs(grp), axis=(0, 1, 3), keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-12)  # [1,1,ci/g,1,co]
    q = jnp.clip(jnp.round(grp / s), -8, 7).astype(jnp.int8)
    q = q.reshape(kh, kw, ci, co)
    out = {"w4": _pack_nibbles(q, 2),
           "w4_scale": s.reshape(ci // g, co), "w4_group": int(g)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def w4_weight(p: dict, dtype) -> jax.Array:
    """Dequantized kernel in the compute dtype — unpack + per-group
    rescale are elementwise producers XLA fuses into the consumer, so
    HBM traffic is the packed int4 bytes plus the (in/group)-sized
    scales."""
    packed, s = p["w4"], p["w4_scale"]
    q = _unpack_nibbles(packed, packed.ndim - 2)
    if q.ndim == 4:  # conv [kh,kw,ci,co]; s [ci/g, co]
        kh, kw, ci, co = q.shape
        grp = q.reshape(kh, kw, s.shape[0], ci // s.shape[0], co)
        w = grp.astype(jnp.float32) * s[None, None, :, None, :]
        return w.reshape(kh, kw, ci, co).astype(dtype)
    n_in = q.shape[-2]
    grp = q.reshape(q.shape[:-2] + (s.shape[-2], n_in // s.shape[-2],
                                    q.shape[-1]))
    w = grp.astype(jnp.float32) * s[..., :, None, :]
    return w.reshape(q.shape).astype(dtype)


def w4_linear(p: dict, x: jax.Array) -> jax.Array:
    from .precision import dot_precision
    y = jnp.dot(x, w4_weight(p, x.dtype), precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def w4_conv2d(p: dict, x: jax.Array, *, stride: int = 1,
              padding="SAME") -> jax.Array:
    from .precision import dot_precision
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w4_weight(p, x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ----------------------------------------------------------- DPT head int8

def collect_dpt_head_act_stats(params: dict, cfg, features,
                               patch_hw) -> dict:
    """Instrumented dpt_head forward: amax of every quantizable conv's
    input, keyed by the param-tree path; returns (stats, head_output).
    Mirrors models/dpt.py::dpt_head op-for-op; `tests/test_quant.py` pins
    the mirrored output against the real head to catch drift. The final
    1x1 (output_conv2.conv2) is excluded — it is tiny and feeds the
    sigmoid directly."""
    from ..ops.conv import conv2d, conv_transpose_same_stride, layer_norm_2d
    from ..ops.resize import resize2d

    stats: dict = {}

    def amax(path, a):
        stats[path] = jnp.max(jnp.abs(a)).astype(jnp.float32)

    def rcu(p, path, x):
        h = jax.nn.relu(x)
        amax(f"{path}.conv1", h)
        out = conv2d(p["conv1"], h, padding=1)
        h = jax.nn.relu(out)
        amax(f"{path}.conv2", h)
        out = conv2d(p["conv2"], h, padding=1)
        return out + x

    def fusion(p, path, x, skip, size):
        out = x
        if skip is not None:
            out = out + rcu(p["resConfUnit1"], f"{path}.resConfUnit1", skip)
        out = rcu(p["resConfUnit2"], f"{path}.resConfUnit2", out)
        if size is None:
            out = resize2d(out, scale_factor=2.0, method="bilinear",
                           align_corners=True)
        else:
            out = resize2d(out, size=size, method="bilinear",
                           align_corners=True)
        amax(f"{path}.out_conv", out)
        return conv2d(p["out_conv"], out, padding=0)

    ph, pw = patch_hw
    taps = []
    for i, (tokens, _cls) in enumerate(features):
        b, n, d = tokens.shape
        x = tokens.reshape(b, ph, pw, d)
        amax(f"projects.{i}", x)
        x = conv2d(params["projects"][str(i)], x, padding=0)
        if i == 0:
            x = conv_transpose_same_stride(params["resize_layers"]["0"], x,
                                           k=4)
        elif i == 1:
            x = conv_transpose_same_stride(params["resize_layers"]["1"], x,
                                           k=2)
        elif i == 3:
            amax("resize_layers.3", x)
            x = conv2d(params["resize_layers"]["3"], x, stride=2, padding=1)
        taps.append(x)

    if cfg.use_input_projection:
        proj = []
        for i, x in enumerate(taps):
            p = params["input_projection"][str(i)]
            amax(f"input_projection.{i}.conv", x)
            x = conv2d(p["conv"], x, padding=1)
            x = layer_norm_2d(p["ln"], x)
            proj.append(jax.nn.relu(x))
        taps = proj

    sc = params["scratch"]
    rn = []
    for i, x in enumerate(taps):
        amax(f"scratch.layer{i + 1}_rn", x)
        rn.append(conv2d(sc[f"layer{i + 1}_rn"], x, padding=1))
    l1, l2, l3, l4 = rn

    path4 = fusion(sc["refinenet4"], "scratch.refinenet4", l4, None,
                   size=l3.shape[1:3])
    path3 = fusion(sc["refinenet3"], "scratch.refinenet3", path4, l3,
                   size=l2.shape[1:3])
    path2 = fusion(sc["refinenet2"], "scratch.refinenet2", path3, l2,
                   size=l1.shape[1:3])
    path1 = fusion(sc["refinenet1"], "scratch.refinenet1", path2, l1,
                   size=None)

    amax("scratch.output_conv1", path1)
    out = conv2d(sc["output_conv1"], path1, padding=1)
    out = resize2d(out, size=(ph * cfg.patch_size, pw * cfg.patch_size),
                   method="bilinear", align_corners=True)
    amax("scratch.output_conv2.conv1", out)
    out = conv2d(sc["output_conv2"]["conv1"], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(sc["output_conv2"]["conv2"], out, padding=0)
    if cfg.head_mode == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif cfg.head_mode == "relu":
        out = jax.nn.relu(out)
    return stats, out


def quantize_dpt_head_int8(params: dict, act_stats: dict, *,
                           margin: float = 1.25) -> dict:
    """Quantize the DPT head's convs with calibrated activation scales
    (collect_dpt_head_act_stats). Shares the untouched leaves; the final
    sigmoid-feeding 1x1 stays high precision."""
    # tree_map rebuilds the containers; leaves are shared with the input
    params = jax.tree.map(lambda a: a, params)

    def q(container, key, path):
        container[key] = quantize_conv_int8(
            container[key], _stat_scale(act_stats[path], margin))

    for i in range(4):
        q(params["projects"], str(i), f"projects.{i}")
    q(params["resize_layers"], "3", "resize_layers.3")
    if "input_projection" in params:
        for i in range(4):
            q(params["input_projection"][str(i)], "conv",
              f"input_projection.{i}.conv")
    sc = params["scratch"]
    for i in range(4):
        q(sc, f"layer{i + 1}_rn", f"scratch.layer{i + 1}_rn")
        r = f"scratch.refinenet{i + 1}"
        ref = sc[f"refinenet{i + 1}"]
        # refinenet4 has no skip input, so its resConfUnit1 never runs and
        # has no stats -> stays high precision (guarded below)
        for unit in ("resConfUnit1", "resConfUnit2"):
            key = f"{r}.{unit}.conv1"
            if key in act_stats:
                q(ref[unit], "conv1", f"{r}.{unit}.conv1")
                q(ref[unit], "conv2", f"{r}.{unit}.conv2")
        q(ref, "out_conv", f"{r}.out_conv")
    q(sc, "output_conv1", "scratch.output_conv1")
    q(sc["output_conv2"], "conv1", "scratch.output_conv2.conv1")
    return params


def calibrate_dav2_head(params: dict, cfg, x: jax.Array, *,
                        guide_rgb=None, guide_mask=None, observation=None,
                        attn_impl: str | None = None) -> dict:
    """Head-conv activation stats for an AmodalDAv2/raw-DAV2 tree: runs
    the trunk to get the tap features, then the instrumented head."""
    from ..models.amodal_dav2 import _normalize, build_guide
    from ..models.dinov2 import dinov2_intermediate_layers

    guide = None if cfg.raw else build_guide(cfg, guide_rgb, guide_mask,
                                             observation)
    xn = _normalize(x)
    feats = dinov2_intermediate_layers(params["backbone"], cfg.vit, xn,
                                       guide, cfg.taps, attn_impl=attn_impl)
    ph, pw = x.shape[1] // 14, x.shape[2] // 14
    stats, _ = collect_dpt_head_act_stats(params["depth_head"], cfg.dpt,
                                          feats, (ph, pw))
    return stats


def quantize_diffusion_int8(params: dict, *, min_conv_fan: int = 512,
                            min_lin_dim: int = 256,
                            skip_suffixes: tuple = ("out/conv", "conv_out"),
                            weight_only: bool = False,
                            bits: int = 8) -> dict:
    """W8A8 with DYNAMIC per-tensor activation scales for diffusion trees
    (LDM UNet / SD VAE): walk the pytree and quantize every wide conv
    (kh*kw*cin >= min_conv_fan) and every wide linear (both dims >=
    min_lin_dim). No calibration pass — activation amax is computed per
    call (one VPU reduction, trivial next to the 3.4x int8 conv rate).

    Kept high precision: thin convs (conv_in, latent-channel 1x1s —
    excluded by the fan rule), GroupNorm affines (1-d), and any param
    whose path ends with `skip_suffixes` (the output convs feeding the
    decoded image / eps prediction).

    Parity-breaking by design — opt-in serving only, same policy as the
    trunk/head int8 path.

    `weight_only=True` produces weight-only int8 trees instead
    (`quantize_*_w8`): int8 param storage, full-precision activations and
    matmuls — the knob for param-read-bound loops (pix2gestalt DDIM).
    `bits=4` (weight-only mode only) halves the weight bytes again:
    nibble-packed int4 storage with per-(input-group, output) scales
    (`quantize_*_w4`, group 64) — more quant error than W8 per weight,
    mitigated by the 64-wide groups; gate with AMODAL_QUALITY."""
    if bits == 4 and not weight_only:
        raise ValueError("bits=4 is weight-only (W4A8 has no MXU story "
                         "beyond int8's)")
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    def walk(tree, path):
        if not isinstance(tree, dict):
            return tree
        w = tree.get("w")
        if w is not None and not isinstance(w, dict):
            pstr = "/".join(path)
            if any(pstr.endswith(sfx) for sfx in skip_suffixes):
                return tree
            if weight_only and pstr.endswith("upsampler"):
                # fused_upsample2x_conv folds the kernel (stack/concat/
                # transpose) before the conv, so the int8->f32 dequant
                # materializes a full-precision folded kernel anyway: no
                # HBM read saving, just dequant overhead (measured
                # neutral: DepthFM wo b8 14.375 vs 14.34 baseline).
                return tree
            if getattr(w, "ndim", 0) == 4 and (
                    w.shape[0] * w.shape[1] * w.shape[2] >= min_conv_fan):
                if not weight_only:
                    return quantize_conv_int8(tree)
                if bits == 4 and w.shape[2] % 2 == 0:
                    return quantize_conv_w4(tree)
                return quantize_conv_w8(tree)
            if getattr(w, "ndim", 0) == 2 and (
                    w.shape[0] >= min_lin_dim and w.shape[1] >= min_lin_dim):
                if not weight_only:
                    return quantize_linear_int8(tree, None)
                if bits == 4 and w.shape[0] % 2 == 0:
                    return quantize_linear_w4(tree)
                return quantize_linear_w8(tree)
            return tree
        return {k: walk(v, path + (k,)) for k, v in tree.items()}

    return walk(params, ())


def calibrate_diffusion_scales(qparams: dict, run_fn, *args,
                               margin: float = 1.1) -> dict:
    """Promote a DYNAMIC int8 diffusion tree to STATIC activation scales.

    `qparams` is the output of `quantize_diffusion_int8` (dynamic — each
    int8 site computes a per-call amax, which serializes batch-1 latency:
    measured p50 260 ms vs 126 bf16 for DepthFM). This runs
    `run_fn(qparams, *args)` ONCE under trace with the int8 ops patched
    to also emit the dynamic scale each site computed; the observed
    per-site maxima (x `margin` headroom for unseen data) are then baked
    in as `act_scale` leaves, so serving forwards skip every amax
    reduction.

    Sites are matched by TRACER IDENTITY of the int8 kernel leaf — the
    exact quantization sites `quantize_diffusion_int8` chose, with no
    mirrored forward to drift. Constraint: `run_fn` must not wrap the
    int8 ops in `lax.scan`/`lax.while_loop` (records would capture
    inner-trace values); call the UNet/VAE bodies directly, unrolled
    over a few representative timesteps (a Python loop max-accumulates
    within the one trace).
    """
    import jax.tree_util as jtu

    records: dict = {}
    id2path: dict = {}

    def _site(p):
        return id2path.get(id(p["w"]))

    def _record(key, x):
        s = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-9)
        records[key] = jnp.maximum(records[key], s) if key in records else s

    orig_lin, orig_conv = int8_linear, int8_conv2d

    def rec_lin(p, x):
        key = _site(p)
        if key is not None and "act_scale" not in p:
            _record(key, x)
        return orig_lin(p, x)

    def rec_conv(p, x, *, stride=1, padding="SAME"):
        key = _site(p)
        if key is not None and "act_scale" not in p:
            _record(key, x)
        return orig_conv(p, x, stride=stride, padding=padding)

    def traced(qp, *a):
        for path, leaf in jtu.tree_flatten_with_path(qp)[0]:
            id2path[id(leaf)] = jtu.keystr(path)
        run_fn(qp, *a)
        return dict(records)

    import amodal_depth_anything_tpu.ops.quant as _self
    _self.int8_linear, _self.int8_conv2d = rec_lin, rec_conv
    try:
        # new trace every call (records close over this invocation)
        scales = jax.jit(traced).lower(qparams, *args).compile()(
            qparams, *args)
    finally:
        _self.int8_linear, _self.int8_conv2d = orig_lin, orig_conv
    if not scales:
        raise ValueError("calibration forward hit no dynamic int8 sites "
                         "(tree not quantized, or already static?)")

    def promote(tree, prefix):
        if not isinstance(tree, dict):
            return tree
        w = tree.get("w")
        if w is not None and not isinstance(w, dict):
            key = prefix + "['w']"
            if getattr(w, "dtype", None) == jnp.int8 and key in scales \
                    and "act_scale" not in tree:
                return {**tree, "act_scale": jnp.asarray(
                    float(scales[key]) * margin, jnp.float32)}
            return tree
        return {k: promote(v, prefix + f"['{k}']")
                for k, v in tree.items()}

    return promote(qparams, "")
