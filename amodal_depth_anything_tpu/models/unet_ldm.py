"""Latent-diffusion UNet (SD-1.5 family), TPU-native.

Functional re-design of the reference LDM UNet
(`src/models/depthfm/unet/openaimodel.py:422-894`) used by DepthFM (and by
pix2gestalt): timestep-embedded ResBlocks, SpatialTransformer blocks
(self-attention + cross-attention over a text-embedding context, GEGLU
feed-forward — `unet/attention.py:141-374`), conv/interp down/upsampling,
and the DepthFM-specific input contract where the conditioning latents are
*concatenated on channels* before conv-in while `context_ca` feeds
cross-attention (`openaimodel.py:834-842`).

TPU-first: NHWC + HWIO, GroupNorm in f32, attention through the shared
`ops.attention` dispatch (Pallas flash kernel on TPU — both self-attention
over 1024-4096 latent tokens and cross-attention over 77 text tokens),
static "plan" describing the block topology so the parameter pytree is a
plain nested dict whose keys mirror the torch checkpoint layout
(`input_blocks.{i}.{j}...`) for mechanical weight conversion.
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

__all__ = ["UNetConfig", "init_unet", "apply_unet", "timestep_embedding",
           "DEPTHFM_UNET"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int | None = 1024
    use_linear_in_transformer: bool = True
    image_size: int = 32  # informational only
    # The reference's vanilla (non-xformers) CrossAttention rescales SELF-
    # attention by sqrt(log(n)/log(4n)/d) instead of 1/sqrt(d)
    # (depthfm/unet/attention.py:175-177, rescale_attention=True default),
    # while its xformers path — the one the released environment.yaml
    # (xformers==0.0.21) actually runs — uses the standard scale. Default
    # False = released behavior; True mirrors the vanilla-torch fallback.
    rescale_self_attention: bool = False


# DepthFM checkpoint hparams (reference dfm_amodal.py:44)
DEPTHFM_UNET = UNetConfig()


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, torch half-dim cos/sin order (unet/util.py:77-98)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ------------------------------------------------------------------- plan

def build_plan(cfg: UNetConfig):
    """Static topology: lists of (kind, meta) per block index, mirroring the
    reference constructor (openaimodel.py:566-760)."""
    input_blocks = [[("conv_in", {})]]
    chans = [cfg.model_channels]
    ch, ds = cfg.model_channels, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [("res", {"in": ch, "out": mult * cfg.model_channels})]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(("attn", {"ch": ch}))
            input_blocks.append(layers)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append([("down", {"ch": ch})])
            chans.append(ch)
            ds *= 2
    middle = [("res", {"in": ch, "out": ch}), ("attn", {"ch": ch}),
              ("res", {"in": ch, "out": ch})]
    output_blocks = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            layers = [("res", {"in": ch + ich,
                               "out": cfg.model_channels * mult})]
            ch = cfg.model_channels * mult
            if ds in cfg.attention_resolutions:
                layers.append(("attn", {"ch": ch}))
            if level and i == cfg.num_res_blocks:
                layers.append(("up", {"ch": ch}))
                ds //= 2
            output_blocks.append(layers)
    return input_blocks, middle, output_blocks


# ------------------------------------------------------------------- init

def _gn_init(ch):
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32)}


def _lin_init(key, i, o, zero=False):
    if zero:
        return {"w": jnp.zeros((i, o), jnp.float32),
                "b": jnp.zeros((o,), jnp.float32)}
    k = 1.0 / math.sqrt(i)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (i, o), jnp.float32, -k, k),
            "b": jax.random.uniform(kb, (o,), jnp.float32, -k, k)}


def _res_init(key, cin, cout, emb_dim):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _gn_init(cin),
        "conv1": conv2d_init(ks[0], 3, 3, cin, cout),
        "emb": _lin_init(ks[1], emb_dim, cout),
        "norm2": _gn_init(cout),
        "conv2": {"w": jnp.zeros((3, 3, cout, cout), jnp.float32),
                  "b": jnp.zeros((cout,), jnp.float32)},  # zero_module
    }
    if cin != cout:
        p["skip"] = conv2d_init(ks[3], 1, 1, cin, cout)
    return p


def _xattn_init(key, q_dim, kv_dim, inner):
    ks = jax.random.split(key, 4)
    return {
        "to_q": {"w": _lin_init(ks[0], q_dim, inner)["w"]},
        "to_k": {"w": _lin_init(ks[1], kv_dim, inner)["w"]},
        "to_v": {"w": _lin_init(ks[2], kv_dim, inner)["w"]},
        "to_out": _lin_init(ks[3], inner, q_dim),
    }


def _transformer_init(key, cfg: UNetConfig, ch):
    inner = ch  # dim_head * heads == ch for DepthFM
    ks = jax.random.split(key, 8)
    blocks = {}
    for d in range(cfg.transformer_depth):
        kd = jax.random.split(ks[d], 6)
        blocks[str(d)] = {
            "attn1": _xattn_init(kd[0], inner, inner, inner),
            "attn2": _xattn_init(kd[1], inner,
                                 cfg.context_dim or inner, inner),
            "ff": {
                "geglu": _lin_init(kd[2], inner, inner * 8),
                "out": _lin_init(kd[3], inner * 4, inner),
            },
            "norm1": {"scale": jnp.ones((inner,)), "bias": jnp.zeros((inner,))},
            "norm2": {"scale": jnp.ones((inner,)), "bias": jnp.zeros((inner,))},
            "norm3": {"scale": jnp.ones((inner,)), "bias": jnp.zeros((inner,))},
        }
    if cfg.use_linear_in_transformer:
        proj_in = _lin_init(ks[6], ch, inner)
        proj_out = _lin_init(ks[7], inner, ch, zero=True)
    else:
        proj_in = conv2d_init(ks[6], 1, 1, ch, inner)
        proj_out = {"w": jnp.zeros((1, 1, inner, ch), jnp.float32),
                    "b": jnp.zeros((ch,), jnp.float32)}
    return {"norm": _gn_init(ch), "proj_in": proj_in,
            "transformer_blocks": blocks, "proj_out": proj_out}


def _layer_init(key, kind, meta, cfg: UNetConfig, emb_dim):
    if kind == "conv_in":
        return conv2d_init(key, 3, 3, cfg.in_channels, cfg.model_channels)
    if kind == "res":
        return _res_init(key, meta["in"], meta["out"], emb_dim)
    if kind == "attn":
        return _transformer_init(key, cfg, meta["ch"])
    if kind in ("down", "up"):
        return conv2d_init(key, 3, 3, meta["ch"], meta["ch"])
    raise ValueError(kind)


def init_unet(key, cfg: UNetConfig) -> dict:
    inp, mid, out = build_plan(cfg)
    emb_dim = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 512))
    params = {
        "time_embed": {"fc1": _lin_init(next(keys), cfg.model_channels, emb_dim),
                       "fc2": _lin_init(next(keys), emb_dim, emb_dim)},
        "input_blocks": {}, "middle_block": {}, "output_blocks": {},
        "out": {"norm": _gn_init(cfg.model_channels),
                "conv": {"w": jnp.zeros((3, 3, cfg.model_channels,
                                         cfg.out_channels), jnp.float32),
                         "b": jnp.zeros((cfg.out_channels,), jnp.float32)}},
    }
    for i, layers in enumerate(inp):
        params["input_blocks"][str(i)] = {
            str(j): _layer_init(next(keys), kind, meta, cfg, emb_dim)
            for j, (kind, meta) in enumerate(layers)}
    params["middle_block"] = {
        str(j): _layer_init(next(keys), kind, meta, cfg, emb_dim)
        for j, (kind, meta) in enumerate(mid)}
    for i, layers in enumerate(out):
        params["output_blocks"][str(i)] = {
            str(j): _layer_init(next(keys), kind, meta, cfg, emb_dim)
            for j, (kind, meta) in enumerate(layers)}
    return params


# ------------------------------------------------------------------- apply

def group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    b, h, w, c = x.shape
    # production channel counts are multiples of 32; tiny test configs fall
    # back to the largest group count that divides C
    groups = math.gcd(c, groups)
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"].astype(jnp.float32) +
            p["bias"].astype(jnp.float32)).astype(dtype)


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
    y = jnp.dot(x, p["w"].astype(x.dtype), precision=dot_precision(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _layer_norm(p, x, eps=1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) +
            p["bias"].astype(jnp.float32)).astype(dtype)


def _res_block(p, x, emb):
    h = group_norm(p["norm1"], x)
    h = conv2d(p["conv1"], jax.nn.silu(h), padding=1)
    emb_out = _lin(p["emb"], jax.nn.silu(emb))
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = group_norm(p["norm2"], h)
    h = conv2d(p["conv2"], jax.nn.silu(h), padding=1)
    skip = conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return skip + h


def _cross_attention(p, x, context, num_heads, attn_impl, sm_scale=None):
    b, n, c = x.shape
    ctx = x if context is None else context
    q = _lin(p["to_q"], x)
    k = _lin(p["to_k"], ctx)
    v = _lin(p["to_v"], ctx)
    d = q.shape[-1] // num_heads
    q = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, ctx.shape[1], num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, ctx.shape[1], num_heads, d).transpose(0, 2, 1, 3)
    o = multi_head_attention(q, k, v, impl=attn_impl, sm_scale=sm_scale)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, num_heads * d)
    return _lin(p["to_out"], o)


def _geglu_ff(p, x):
    h = _lin(p["geglu"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return _lin(p["out"], a * jax.nn.gelu(gate, approximate=False))


def _spatial_transformer(p, x, context_ca, cfg: UNetConfig, attn_impl,
                         tome=None):
    b, h, w, c = x.shape
    x_in = x
    y = group_norm(p["norm"], x, eps=1e-6)
    linear = cfg.use_linear_in_transformer
    y = y.reshape(b, h * w, c)
    if linear:
        y = _lin(p["proj_in"], y)
    else:
        y = conv2d(p["proj_in"], y.reshape(b, h, w, c),
                   padding=0).reshape(b, h * w, c)
    self_scale = None
    if cfg.rescale_self_attention:
        n, dh = h * w, c // cfg.num_heads
        self_scale = (math.log(n) / math.log(n * 4) / dh) ** 0.5

    # ToMe-SD (Bolya & Hoffman, "Token Merging for Fast Stable Diffusion"):
    # one bipartite match per transformer block on its input tokens; every
    # module (self-attn, cross-attn, GEGLU FF) runs on the merged [B,M,C]
    # stream and its output is unmerged into the FULL-resolution residual,
    # so the residual stream keeps per-token diversity. Opt-in serving only
    # (quality unvalidated against real checkpoints — same policy as the
    # trunk ToMe ladder).
    n_tok = h * w
    r = 0
    if tome is not None:
        ratio, min_tokens = tome
        if n_tok >= min_tokens:
            r = min(int(n_tok * ratio), n_tok // 2 - 1)
    if r > 0:
        from ..ops.token_merge import tome_apply, tome_merge, tome_unmerge
        m_tok = n_tok - r
        merged, idx = tome_merge(y, r)

        def reduced(module, y_full, merged_cur):
            out = module(merged_cur)
            y_full = y_full + tome_unmerge(out, idx)
            return y_full, tome_apply(y_full, idx, m_tok)

        for d in range(cfg.transformer_depth):
            blk = p["transformer_blocks"][str(d)]
            y, merged = reduced(
                lambda m: _cross_attention(
                    blk["attn1"], _layer_norm(blk["norm1"], m), None,
                    cfg.num_heads, attn_impl, sm_scale=self_scale),
                y, merged)
            y, merged = reduced(
                lambda m: _cross_attention(
                    blk["attn2"], _layer_norm(blk["norm2"], m), context_ca,
                    cfg.num_heads, attn_impl),
                y, merged)
            y, merged = reduced(
                lambda m: _geglu_ff(blk["ff"], _layer_norm(blk["norm3"], m)),
                y, merged)
    else:
        for d in range(cfg.transformer_depth):
            blk = p["transformer_blocks"][str(d)]
            y = y + _cross_attention(blk["attn1"],
                                     _layer_norm(blk["norm1"], y),
                                     None, cfg.num_heads, attn_impl,
                                     sm_scale=self_scale)
            y = y + _cross_attention(blk["attn2"],
                                     _layer_norm(blk["norm2"], y),
                                     context_ca, cfg.num_heads, attn_impl)
            y = y + _geglu_ff(blk["ff"], _layer_norm(blk["norm3"], y))
    if linear:
        y = _lin(p["proj_out"], y).reshape(b, h, w, c)
    else:
        y = conv2d(p["proj_out"], y.reshape(b, h, w, c), padding=0)
    return x_in + y


def _apply_layers(params, layers, x, emb, context_ca, cfg, attn_impl,
                  tome=None):
    for j, (kind, _meta) in enumerate(layers):
        p = params[str(j)]
        if kind == "conv_in":
            x = conv2d(p, x, padding=1)
        elif kind == "res":
            x = _res_block(p, x, emb)
        elif kind == "attn":
            x = _spatial_transformer(p, x, context_ca, cfg, attn_impl,
                                     tome=tome)
        elif kind == "down":
            x = conv2d(p, x, stride=2, padding=1)
        elif kind == "up":
            # weight-only 'w8' trees keep the fused path (it dequantizes
            # before the fold); W8A8 must unfuse (int8 conv can't fold)
            if "w8" not in p and "w4" not in p \
                    and p["w"].dtype == jnp.int8:
                x = resize_nearest(x, scale_factor=2.0)
                x = conv2d(p, x, padding=1)
            else:
                x = fused_upsample2x_conv(p, x)
    return x


def apply_unet(params: dict, cfg: UNetConfig, x: jax.Array, t: jax.Array,
               context: jax.Array | None = None,
               context_ca: jax.Array | None = None, *,
               attn_impl: str | None = None,
               tome: tuple[float, int] | None = None,
               remat: bool = False,
               deep_cache_groups: int | None = None,
               cached_deep: jax.Array | None = None):
    """x: [B,H,W,C_latent]; t: [B] in diffusion-time units; context is
    concatenated on channels (DepthFM conditioning); context_ca: [B,L,D]
    cross-attention conditioning (text embedding). tome=(ratio, min_tokens)
    enables ToMe-SD token merging in spatial-transformer blocks with at
    least min_tokens tokens (opt-in serving; parity-breaking).

    `remat=True` recomputes each input/middle/output level in the
    backward pass (`jax.checkpoint` per level) — the reference trains
    the SD UNet with `use_checkpoint=True` (`openaimodel.py`
    checkpoint() per block); level granularity keeps the skip tensors
    `hs` live (they are consumed far from where they are produced, so
    recomputing them would cascade).

    DeepCache (Ma et al. 2023, applied to multi-step samplers): with
    `deep_cache_groups=G` and `cached_deep=None` the FULL network runs
    and `(y, deep)` is returned, where `deep` is the feature entering
    the LAST G output groups (i.e. everything below the G shallowest
    input groups already folded in). Passing that `deep` back as
    `cached_deep` on a later step runs ONLY the G shallow input groups
    (fresh skip tensors) + the last G output groups, splicing the
    cached deep feature in place of the skipped middle/deep levels.
    With identical (x, t) the spliced pass reproduces the full pass
    bit-exactly (tested); across nearby solver steps it is the
    DeepCache approximation. Opt-in serving path, parity-breaking."""
    inp, mid, out = build_plan(cfg)
    if deep_cache_groups is not None:
        if not 1 <= deep_cache_groups < len(inp) or len(inp) != len(out):
            raise ValueError(
                f"deep_cache_groups must be in [1, {len(inp) - 1}] on a "
                f"symmetric plan (inp {len(inp)} / out {len(out)})")

    def level_fn(layers):
        def run(p, h, emb, context_ca):
            return _apply_layers(p, layers, h, emb, context_ca, cfg,
                                 attn_impl, tome=tome)
        return jax.checkpoint(run) if remat else run

    t_emb = timestep_embedding(t, cfg.model_channels)
    emb = _lin(params["time_embed"]["fc2"],
               jax.nn.silu(_lin(params["time_embed"]["fc1"],
                                t_emb.astype(x.dtype))))
    h = x if context is None else jnp.concatenate([x, context], axis=-1)
    hs = []
    shallow = cached_deep is not None
    n_inp = deep_cache_groups if shallow else len(inp)
    for i in range(n_inp):
        h = level_fn(inp[i])(params["input_blocks"][str(i)], h, emb,
                             context_ca)
        hs.append(h)
    deep = None
    if shallow:
        h = cached_deep
        out_start = len(out) - deep_cache_groups
    else:
        h = level_fn(mid)(params["middle_block"], h, emb, context_ca)
        out_start = 0
    for i in range(out_start, len(out)):
        if deep_cache_groups is not None and not shallow \
                and i == len(out) - deep_cache_groups:
            deep = h
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = level_fn(out[i])(params["output_blocks"][str(i)], h, emb,
                             context_ca)
    h = group_norm(params["out"]["norm"], h)
    y = conv2d(params["out"]["conv"], jax.nn.silu(h), padding=1)
    if deep_cache_groups is not None and not shallow:
        return y, deep
    return y
