"""ZoeDepth metric-depth model + InvisibleStitch baseline, TPU-native.

Functional re-design of the vendored ZoeDepth the reference reaches via
`invisible_stitch.py:19-21,43-110`:

  * MiDaS DPT core over a BEiT-L/16 backbone (`models.beit`): taps at
    blocks [5,11,17,23], 'project' readout, DPT reassemble + refinenets
    (features 256), output head whose 32-channel pre-logit activation and
    relative depth are both exposed — matching the reference's hook set
    ('out_conv', 'l4_rn', 'r4', 'r3', 'r2', 'r1',
    `zoedepth/models/base_models/midas.py:302-326`).
  * Metric-bins head (`zoedepth/models/zoedepth/zoedepth_v1.py:37-211`),
    at the SHIPPED config (`config_zoedepth.json` — what invisible_stitch
    builds via `get_config("zoedepth", ...)`, NOT the constructor
    defaults): bottleneck 1x1 conv, softplus seed-bin regressor
    (n_bins 64), bin-embedding projectors, INVERSE attractor layers
    ([16,8,4,1] attractors, MEAN aggregation, and — load-bearing
    reference bug — alpha 300/gamma 2, the function defaults, because
    forward never forwards the configured alpha=1000
    (`attractor.py:45-57,191-199`, json:11-12)), conditional log-binomial
    over bins with a GELU-hidden conditioning mlp and the reference's
    Stirling log-binomial coefficients (`dist_layers.py:29-120`,
    min_temp 0.0212), metric depth = sum(p * bin_centers).
  * InvisibleStitch (`invisible_stitch.py:77-110`): patch embed widened
    +2 channels (observation, depth_mask); observation zeroed inside the
    invisible region; depth_mask = ~invisible.

Normalization note: MiDaS preps BEiT inputs with mean/std 0.5; extra
depth-completion channels pass through unnormalized (documented deviation
to verify on checkpoint transplant).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init, conv_transpose_same_stride
from ..ops.resize import resize2d
from .beit import BEiTConfig, apply_beit, init_beit
from .dpt import _fusion, _fusion_init
from .layers import gelu, linear, linear_init

__all__ = ["ZoeDepthConfig", "init_zoedepth", "apply_zoedepth",
           "init_invisible_stitch", "apply_invisible_stitch"]


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    backbone: BEiTConfig = BEiTConfig(in_chans=5)  # rgb + obs + depth_mask
    hooks: tuple = (5, 11, 17, 23)
    tap_channels: tuple = (256, 512, 1024, 1024)
    features: int = 256
    n_bins: int = 64
    bin_embedding_dim: int = 128
    n_attractors: tuple = (16, 8, 4, 1)
    # Shipped config values (config_zoedepth.json) for type/kind — but
    # alpha/gamma are the jit-scripted FUNCTION DEFAULTS: the reference's
    # forward calls `dist(dx)` with no arguments (attractor.py:191-199),
    # so its config alpha=1000 is silently ignored and every published
    # checkpoint effectively ran alpha=300. Golden-pinned in
    # tests/test_reference_protocol_golden.py.
    attractor_alpha: float = 300.0
    attractor_gamma: float = 2.0
    attractor_type: str = "inv"   # "inv" | "exp"
    attractor_kind: str = "mean"  # "mean" | "sum"
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    midas_out: int = 32


def _mlp2_init(key, cin, hidden, cout):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv2d_init(k1, 1, 1, cin, hidden),
            "conv2": conv2d_init(k2, 1, 1, hidden, cout)}


def _mlp2(p, x, *, final_act=None, hidden_act=jax.nn.relu):
    h = hidden_act(conv2d(p["conv1"], x, padding=0))
    h = conv2d(p["conv2"], h, padding=0)
    return final_act(h) if final_act is not None else h


def init_zoedepth(key, cfg: ZoeDepthConfig = ZoeDepthConfig()) -> dict:
    keys = iter(jax.random.split(key, 64))
    d = cfg.backbone.embed_dim
    params: dict = {"backbone": init_beit(next(keys), cfg.backbone),
                    "readout": {}, "reassemble": {}, "scratch": {}}
    c0, c1, _, c3 = cfg.tap_channels
    for i, ch in enumerate(cfg.tap_channels):
        params["readout"][str(i)] = linear_init(next(keys), 2 * d, d)
        params["reassemble"][str(i)] = {
            "project": conv2d_init(next(keys), 1, 1, d, ch)}
    params["reassemble"]["0"]["resize"] = {
        "w": jnp.zeros((c0, 4, 4, c0), jnp.float32),
        "b": jnp.zeros((c0,), jnp.float32)}
    params["reassemble"]["1"]["resize"] = {
        "w": jnp.zeros((c1, 2, 2, c1), jnp.float32),
        "b": jnp.zeros((c1,), jnp.float32)}
    params["reassemble"]["3"]["resize"] = conv2d_init(next(keys), 3, 3, c3, c3)
    sc = params["scratch"]
    for i, ch in enumerate(cfg.tap_channels):
        sc[f"layer{i + 1}_rn"] = conv2d_init(next(keys), 3, 3, ch,
                                             cfg.features, bias=False)
    for i in range(1, 5):
        sc[f"refinenet{i}"] = _fusion_init(next(keys), cfg.features)
    sc["output_conv"] = {
        "conv1": conv2d_init(next(keys), 3, 3, cfg.features,
                             cfg.features // 2),
        "conv2": conv2d_init(next(keys), 3, 3, cfg.features // 2,
                             cfg.midas_out),
        "conv3": conv2d_init(next(keys), 1, 1, cfg.midas_out, 1),
    }
    # metric bins head
    params["conv2"] = conv2d_init(next(keys), 1, 1, cfg.features,
                                  cfg.features)
    params["seed_bin_regressor"] = _mlp2_init(next(keys), cfg.features, 256,
                                              cfg.n_bins)
    params["seed_projector"] = _mlp2_init(next(keys), cfg.features, 128,
                                          cfg.bin_embedding_dim)
    params["projectors"] = {
        str(i): _mlp2_init(next(keys), cfg.features, 128,
                           cfg.bin_embedding_dim)
        for i in range(4)}
    params["attractors"] = {
        str(i): _mlp2_init(next(keys), cfg.bin_embedding_dim, 128,
                           cfg.n_attractors[i])
        for i in range(4)}
    clb_in = cfg.midas_out + 1 + cfg.bin_embedding_dim
    params["conditional_log_binomial"] = _mlp2_init(
        next(keys), clb_in, clb_in // 2, 4)
    return params


def _midas_core(params, cfg: ZoeDepthConfig, x):
    """BEiT + DPT decoder -> (rel_depth [B,H,W], out_conv32, btlnck,
    [r4, r3, r2, r1])."""
    b, h, w, _ = x.shape
    gh, gw = h // cfg.backbone.patch_size, w // cfg.backbone.patch_size
    taps = apply_beit(params["backbone"], cfg.backbone, x, cfg.hooks)

    feats = []
    for i, tok in enumerate(taps):
        cls_t = jnp.broadcast_to(tok[:, :1], tok[:, 1:].shape)
        merged = jnp.concatenate([tok[:, 1:], cls_t], axis=-1)
        proj = gelu(linear(params["readout"][str(i)], merged))
        fm = proj.reshape(b, gh, gw, cfg.backbone.embed_dim)
        fm = conv2d(params["reassemble"][str(i)]["project"], fm, padding=0)
        if i == 0:
            fm = conv_transpose_same_stride(
                params["reassemble"]["0"]["resize"], fm, k=4)
        elif i == 1:
            fm = conv_transpose_same_stride(
                params["reassemble"]["1"]["resize"], fm, k=2)
        elif i == 3:
            fm = conv2d(params["reassemble"]["3"]["resize"], fm, stride=2,
                        padding=1)
        feats.append(fm)

    sc = params["scratch"]
    rn = [conv2d(sc[f"layer{i + 1}_rn"], f, padding=1)
          for i, f in enumerate(feats)]
    l1, l2, l3, l4 = rn
    btlnck = l4
    r4 = _fusion(sc["refinenet4"], l4, None, size=None)
    r3 = _fusion(sc["refinenet3"], r4, l3, size=None)
    r2 = _fusion(sc["refinenet2"], r3, l2, size=None)
    r1 = _fusion(sc["refinenet1"], r2, l1, size=None)

    out = conv2d(sc["output_conv"]["conv1"], r1, padding=1)
    out = resize2d(out, scale_factor=2.0, method="bilinear",
                   align_corners=True)
    out32 = jax.nn.relu(conv2d(sc["output_conv"]["conv2"], out, padding=1))
    rel = jax.nn.relu(conv2d(sc["output_conv"]["conv3"], out32, padding=0))
    return rel[..., 0], out32, btlnck, [r4, r3, r2, r1]


def _exp_attractor(dx, alpha, gamma):
    """attractor.py:30-42."""
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


def _inv_attractor(dx, alpha, gamma):
    """attractor.py:45-57 — the shipped/paper default.

    dx can be negative: torch `dx.pow(2.0)` squares it, but jnp.power
    with a FLOAT exponent of a negative base is NaN — use the integer
    exponent so XLA lowers to repeated multiplication."""
    g = int(gamma) if float(gamma).is_integer() else gamma
    return dx / (1.0 + alpha * dx ** g)


def _log_binomial(p, t, n_classes, eps=1e-4):
    """p, t: [B,H,W,1] -> probs [B,H,W,K] (dist_layers.py:29-69).

    Uses the reference's STIRLING approximation for log nCk (not exact
    lgamma): its error is k-dependent (~0.5*ln k), so after the softmax
    the two give materially different distributions — checkpoint parity
    requires replicating the approximation."""
    k = jnp.arange(n_classes, dtype=jnp.float32).reshape(1, 1, 1, -1)
    big_k = float(n_classes - 1)
    e7 = 1e-7
    n_ = big_k + e7
    k_ = k + e7
    # clamp n-k at the last bin: XLA's mixed f32/f64 constant folding can
    # make it epsilon-NEGATIVE under jit, and 0 * log(negative) = NaN
    # (torch stays f32 throughout and lands exactly on 0 * log(eps) = 0)
    nk = jnp.maximum(n_ - k_, 0.0)
    log_coef = n_ * jnp.log(n_) - k_ * jnp.log(k_) - nk * jnp.log(nk + e7)
    p = jnp.clip(p.astype(jnp.float32), eps, 1.0)
    one_minus = jnp.clip(1.0 - p, eps, 1.0)
    y = log_coef + k * jnp.log(p) + (big_k - k) * jnp.log(one_minus)
    return jax.nn.softmax(y / t.astype(jnp.float32), axis=-1)


def apply_zoedepth(params, cfg: ZoeDepthConfig, x):
    """x: [B,H,W,in_chans] (already midas-prepped) -> metric depth
    [B,H',W',1] (H' = half input, the midas head resolution)."""
    rel_depth, out32, btlnck, x_blocks = _midas_core(params, cfg, x)

    x_d0 = conv2d(params["conv2"], btlnck, padding=0)
    seed_b = _mlp2(params["seed_bin_regressor"], x_d0,
                   final_act=jax.nn.softplus)
    b_prev = seed_b
    prev_emb = _mlp2(params["seed_projector"], x_d0)

    for i, blk in enumerate(x_blocks):
        emb = _mlp2(params["projectors"][str(i)], blk)
        prev_up = resize2d(prev_emb, size=emb.shape[1:3], method="bilinear",
                           align_corners=True)
        a = _mlp2(params["attractors"][str(i)], emb + prev_up,
                  final_act=jax.nn.softplus)
        b_up = resize2d(b_prev, size=emb.shape[1:3], method="bilinear",
                        align_corners=True)
        # delta for every bin from every attractor (attractor.py:191-199);
        # shipped config: inverse attractor, mean aggregation
        dx = a[..., :, None] - b_up[..., None, :]  # [B,h,w,na,nbins]
        attractor_fn = (_inv_attractor if cfg.attractor_type == "inv"
                        else _exp_attractor)
        agg = jnp.mean if cfg.attractor_kind == "mean" else jnp.sum
        delta = agg(attractor_fn(dx, cfg.attractor_alpha,
                                 cfg.attractor_gamma), axis=-2)
        b_prev = b_up + delta
        prev_emb = emb

    b_centers = b_prev
    rel_cond = resize2d(rel_depth[..., None], size=out32.shape[1:3],
                        method="bilinear", align_corners=True)
    last = jnp.concatenate([out32, rel_cond], axis=-1)
    emb_up = resize2d(prev_emb, size=last.shape[1:3], method="bilinear",
                      align_corners=True)
    # CLB conditioning mlp hides a GELU, not the ReLU the other heads use
    # (dist_layers.py:130-135)
    pt = _mlp2(params["conditional_log_binomial"],
               jnp.concatenate([last, emb_up], axis=-1),
               final_act=jax.nn.softplus, hidden_act=gelu)
    eps = 1e-4
    p = (pt[..., 0:1] + eps) / (pt[..., 0:1] + pt[..., 1:2] + 2 * eps)
    t_raw = (pt[..., 2:3] + eps) / (pt[..., 2:3] + pt[..., 3:4] + 2 * eps)
    t = cfg.min_temp + (cfg.max_temp - cfg.min_temp) * t_raw
    probs = _log_binomial(p, t, cfg.n_bins)
    centers_up = resize2d(b_centers, size=probs.shape[1:3],
                          method="bilinear", align_corners=True)
    return jnp.sum(probs * centers_up, axis=-1, keepdims=True)


# ----------------------------------------------------------- InvisibleStitch

def init_invisible_stitch(key, cfg: ZoeDepthConfig | None = None) -> dict:
    cfg = cfg or ZoeDepthConfig()
    params = init_zoedepth(key, cfg)
    # zero the 2 depth-completion input channels so the pretrained RGB
    # kernel dominates at start (mirrors the widened-conv convention)
    w = params["backbone"]["patch_embed"]["proj"]["w"]
    if w.shape[2] > 3:
        params["backbone"]["patch_embed"]["proj"]["w"] = \
            w.at[:, :, 3:, :].set(0.0)
    return params


def apply_invisible_stitch(params, cfg: ZoeDepthConfig, x, *,
                           invisible_mask, observation, **_unused):
    """x: [B,H,W,3] rgb in [0,1]; invisible_mask / observation: [B,H,W,1].

    Masks the observation by the invisible region and concatenates
    (observation, depth_mask) channels (reference invisible_stitch.py:
    84-105); midas prep (mean/std 0.5) applies to rgb only."""
    inv = (invisible_mask > 0).astype(x.dtype)
    depth_mask = 1.0 - inv
    obs = observation * (1.0 - inv)
    rgb = (x - 0.5) / 0.5
    inp = jnp.concatenate([rgb, obs, depth_mask], axis=-1)
    return apply_zoedepth(params, cfg, inp)
