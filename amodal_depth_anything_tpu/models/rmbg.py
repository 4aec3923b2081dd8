"""RMBG-1.4 (ISNet / U^2-Net family) background-removal matting, TPU-native.

The reference demo derives the final amodal mask by matting the
pix2gestalt completion with briaai/RMBG-1.4 (`app.py:59,164-169`). This
is a functional NHWC implementation of that ISNet architecture:

  * REBNCONV = 3x3 (dilated) conv + BatchNorm + ReLU;
  * RSU-7/6/5/4 blocks: an encoder/decoder U-inside-U with maxpools and
    2x bilinear upsamples plus a residual from the block's input conv;
  * RSU-4F: the dilated, pool-free variant;
  * ISNet: stride-2 conv_in, 6 encoder stages (RSU7..RSU4F) with pools,
    5 decoder stages on concatenated skips, per-stage side heads; the
    output mask is sigmoid(side1) upsampled to input size.

Inference-only here (matting is a frozen component): BatchNorm uses the
checkpoint's running stats folded at conversion time; `init_rmbg`
initializes them to identity for tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init
from ..ops.resize import resize2d

__all__ = ["RMBGConfig", "init_rmbg", "apply_rmbg"]


@dataclasses.dataclass(frozen=True)
class RMBGConfig:
    width: int = 64          # conv_in out channels (ISNet: 64)
    # (mid, out) channels per encoder stage; ISNet-DIS defaults
    stage_mid: tuple = (32, 32, 64, 128, 256, 256)
    stage_out: tuple = (64, 128, 256, 512, 512, 512)
    dec_mid: tuple = (16, 32, 64, 128, 256)  # decoder RSU mids (stage1d..5d)
    heights: tuple = (7, 6, 5, 4, 4, 4)  # RSU heights; last two are RSU4F


def _rebn_init(key, cin, cout):
    p = conv2d_init(key, 3, 3, cin, cout)
    p["bn_scale"] = jnp.ones((cout,), jnp.float32)
    p["bn_bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _rebn(p, x, dilation: int = 1):
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(x.dtype)
    # BN folded to scale/bias at conversion (running stats, eval mode)
    y = y * p["bn_scale"].astype(x.dtype) + p["bn_bias"].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "SAME")


def _up_to(x, ref):
    return resize2d(x, size=ref.shape[1:3], method="bilinear")


def _rsu_init(key, height, cin, cmid, cout, dilated=False):
    keys = iter(jax.random.split(key, 2 * height + 2))
    p = {"in": _rebn_init(next(keys), cin, cout)}
    enc_in = cout
    for i in range(1, height + 1):
        p[f"enc{i}"] = _rebn_init(next(keys), enc_in if i == 1 else cmid,
                                  cmid)
    for i in range(height - 1, 0, -1):
        out_ch = cout if i == 1 else cmid
        p[f"dec{i}"] = _rebn_init(next(keys), cmid * 2, out_ch)
    return p


def _rsu(p, x, height, dilated=False):
    hx_in = _rebn(p["in"], x)
    if dilated:
        # RSU-4F: dilation ladder, no pooling
        feats = [hx_in]
        dil = 1
        for i in range(1, height + 1):
            dil = 2 ** (i - 1)
            feats.append(_rebn(p[f"enc{i}"], feats[-1], dilation=dil))
        h = feats[-1]
        for i in range(height - 1, 0, -1):
            dil = 2 ** (i - 1)
            h = _rebn(p[f"dec{i}"], jnp.concatenate([h, feats[i]], -1),
                      dilation=dil)
        return h + hx_in
    feats = [hx_in]
    h = hx_in
    for i in range(1, height + 1):
        # the deepest encoder conv is dilated (dirate=2) and pool-free;
        # pools sit after enc1..enc(height-2)
        h = _rebn(p[f"enc{i}"], h, dilation=2 if i == height else 1)
        feats.append(h)
        if i < height - 1:
            h = _maxpool2(h)
    h = feats[-1]
    for i in range(height - 1, 0, -1):
        h = _rebn(p[f"dec{i}"], jnp.concatenate([h, feats[i]], -1))
        if i > 1:
            h = _up_to(h, feats[i - 1])
    return h + hx_in


def init_rmbg(key, cfg: RMBGConfig = RMBGConfig()) -> dict:
    keys = iter(jax.random.split(key, 32))
    p: dict = {"conv_in": conv2d_init(next(keys), 3, 3, 3, cfg.width)}
    cin = cfg.width
    for s in range(6):
        p[f"stage{s + 1}"] = _rsu_init(next(keys), cfg.heights[s], cin,
                                       cfg.stage_mid[s], cfg.stage_out[s],
                                       dilated=s >= 4)
        cin = cfg.stage_out[s]
    # decoder stages: input = cat(skip, up(prev))
    dec_out = []
    for s in range(5, 0, -1):
        cin_d = cfg.stage_out[s] + cfg.stage_out[s - 1] \
            if s == 5 else dec_out[-1] + cfg.stage_out[s - 1]
        out_d = cfg.stage_out[max(s - 2, 0)]
        p[f"stage{s}d"] = _rsu_init(next(keys), cfg.heights[s - 1], cin_d,
                                    cfg.dec_mid[s - 1], out_d,
                                    dilated=s - 1 >= 4)
        dec_out.append(out_d)
    for i, ch in enumerate([dec_out[-1]] + dec_out[::-1][1:] +
                           [cfg.stage_out[5]]):
        p[f"side{i + 1}"] = conv2d_init(next(keys), 3, 3, ch, 1)
    return p


def apply_rmbg(params, cfg: RMBGConfig, x):
    """x: [B,H,W,3] in [0,1] (RMBG normalizes to mean .5 / std 1) ->
    alpha matte [B,H,W,1] in [0,1]."""
    orig = x
    h = (x - 0.5)
    h = conv2d(params["conv_in"], h, stride=2, padding=1)
    skips = []
    for s in range(6):
        h = _rsu(params[f"stage{s + 1}"], h, cfg.heights[s], dilated=s >= 4)
        skips.append(h)
        if s < 5:
            h = _maxpool2(h)
    d = skips[5]
    dec_feats = []
    for s in range(5, 0, -1):
        d = _up_to(d, skips[s - 1])
        d = _rsu(params[f"stage{s}d"],
                 jnp.concatenate([d, skips[s - 1]], -1),
                 cfg.heights[s - 1], dilated=s - 1 >= 4)
        dec_feats.append(d)
    side1 = conv2d(params["side1"], dec_feats[-1], padding=1)
    out = resize2d(side1, size=orig.shape[1:3], method="bilinear")
    return jax.nn.sigmoid(out)
