"""RMBG-1.4 (ISNet) checkpoint conversion with BatchNorm folding.

Maps briaai/RMBG-1.4's ISNet state dict (`conv_in`, `stage{1..6}` /
`stage{1..5}d` RSU blocks of REBNCONVs `conv_s1`+`bn_s1`, `side{1..6}`)
onto `models/rmbg.py`. Each REBNCONV's BatchNorm (eval mode) folds into
the affine pair our `_rebn` applies after the conv:

    scale = gamma / sqrt(var + eps);  bias = beta - mean * scale
"""

from __future__ import annotations

import numpy as np

from ..models.rmbg import RMBGConfig

__all__ = ["convert_rmbg"]

BN_EPS = 1e-5


def _conv(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _rebn(sd, name):
    p = _conv(sd, f"{name}.conv_s1")
    gamma = sd[f"{name}.bn_s1.weight"]
    beta = sd[f"{name}.bn_s1.bias"]
    mean = sd[f"{name}.bn_s1.running_mean"]
    var = sd[f"{name}.bn_s1.running_var"]
    scale = gamma / np.sqrt(var + BN_EPS)
    p["bn_scale"] = scale.astype(np.float32)
    p["bn_bias"] = (beta - mean * scale).astype(np.float32)
    return p


def _rsu(sd, prefix, height):
    p = {"in": _rebn(sd, f"{prefix}.rebnconvin")}
    for i in range(1, height + 1):
        p[f"enc{i}"] = _rebn(sd, f"{prefix}.rebnconv{i}")
    for i in range(height - 1, 0, -1):
        p[f"dec{i}"] = _rebn(sd, f"{prefix}.rebnconv{i}d")
    return p


def convert_rmbg(sd: dict, cfg: RMBGConfig = RMBGConfig()) -> dict:
    params: dict = {"conv_in": _conv(sd, "conv_in")}
    for s in range(1, 7):
        params[f"stage{s}"] = _rsu(sd, f"stage{s}", cfg.heights[s - 1])
    for s in range(5, 0, -1):
        params[f"stage{s}d"] = _rsu(sd, f"stage{s}d", cfg.heights[s - 1])
    for i in range(1, 7):
        params[f"side{i}"] = _conv(sd, f"side{i}")
    return params
