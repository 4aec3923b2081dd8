"""jo_amodal small U-Net family, TPU-native.

Functional re-build of the reference's vendored plain U-Nets
(`src/models/amodalsynthdrive/jo_amodal/unet/unet_model.py:7-90`,
`unet_parts.py:8-88`): `inconv` double-conv stem, maxpool `down` stages,
bilinear align_corners=True `up` stages with asymmetric odd-size padding
and skip concat `[skip, upsampled]`, and a 1x1 `outconv`. Three depths —
D2 / D3 / full (depth 4) — with a width multiplier `w` (the reference's
`unet025 ... unet4` factories are `w` presets).

Vestigial in the reference (not reachable from any main entry point —
SURVEY.md §2.4), implemented for inventory completeness. NHWC; BatchNorm
running stats live in a separate `state` tree threaded like ADDeepLab's
(models/resnet.py), torch semantics (momentum 0.1, eps 1e-5, unbiased
running var).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init
from ..ops.resize import resize2d
from .resnet import _bn, _bn_init

__all__ = ["JoUNetConfig", "init_jo_unet", "apply_jo_unet"]


@dataclasses.dataclass(frozen=True)
class JoUNetConfig:
    in_channels: int = 3
    n_classes: int = 2
    w: float = 4.0
    depth: int = 4  # 2 = UNetD2, 3 = UNetD3, 4 = UNet

    def _c(self, mult: int) -> int:
        return int(mult * self.w)

    @property
    def plan(self):
        """(inc_ch, [down out_ch...], [up (in_ch, out_ch)...]) — the channel
        schedule of unet_model.py:9-16 / 28-38 / 52-64."""
        c = self._c
        if self.depth == 2:
            return c(16), [c(32), c(32)], [(c(64), c(16)), (c(32), c(16))]
        if self.depth == 3:
            return (c(16), [c(32), c(64), c(64)],
                    [(c(128), c(32)), (c(64), c(16)), (c(32), c(16))])
        if self.depth == 4:
            return (c(16), [c(32), c(64), c(128), c(128)],
                    [(c(256), c(64)), (c(128), c(32)), (c(64), c(16)),
                     (c(32), c(16))])
        raise ValueError(f"depth must be 2/3/4, got {self.depth}")


def _double_conv_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    p, s = {}, {}
    p["conv1"] = conv2d_init(k1, 3, 3, cin, cout)
    p["bn1"], s["bn1"] = _bn_init(cout)
    p["conv2"] = conv2d_init(k2, 3, 3, cout, cout)
    p["bn2"], s["bn2"] = _bn_init(cout)
    return p, s


def _double_conv(p, s, x, train):
    out_s = {}
    h, out_s["bn1"] = _bn(p["bn1"], s["bn1"], conv2d(p["conv1"], x, padding=1),
                          train)
    h = jax.nn.relu(h)
    h, out_s["bn2"] = _bn(p["bn2"], s["bn2"], conv2d(p["conv2"], h, padding=1),
                          train)
    return jax.nn.relu(h), out_s


def init_jo_unet(key, cfg: JoUNetConfig = JoUNetConfig()):
    inc_ch, downs, ups = cfg.plan
    keys = iter(jax.random.split(key, 2 * (len(downs) + len(ups)) + 4))
    params: dict = {}
    state: dict = {}
    params["inc"], state["inc"] = _double_conv_init(next(keys),
                                                    cfg.in_channels, inc_ch)
    ch = inc_ch
    for i, cout in enumerate(downs):
        params[f"down{i}"], state[f"down{i}"] = _double_conv_init(
            next(keys), ch, cout)
        ch = cout
    for i, (cin, cout) in enumerate(ups):
        params[f"up{i}"], state[f"up{i}"] = _double_conv_init(
            next(keys), cin, cout)
    params["outc"] = conv2d_init(next(keys), 1, 1, ups[-1][1], cfg.n_classes)
    return params, state


def _up(p, s, deep, skip, train):
    """unet_parts.py:49-78: bilinear 2x (align_corners=True), pad the
    upsampled map to the skip's size (left/top gets diff//2 — zero except
    at odd skip sizes), concat [skip, up], double conv."""
    up = resize2d(deep, scale_factor=2.0, method="bilinear",
                  align_corners=True)
    dy = skip.shape[1] - up.shape[1]
    dx = skip.shape[2] - up.shape[2]
    if dy or dx:
        up = jnp.pad(up, ((0, 0), (dy // 2, dy - dy // 2),
                          (dx // 2, dx - dx // 2), (0, 0)))
    return _double_conv(p, s, jnp.concatenate([skip, up], axis=-1), train)


def apply_jo_unet(params, state, cfg: JoUNetConfig, x, *, train: bool = False):
    """x: [B,H,W,in_channels] -> logits [B,H,W,n_classes]; returns
    (logits, new_state). Forward of unet_model.py:17-24/39-48/66-77."""
    _, downs, ups = cfg.plan
    new_s: dict = {}
    h, new_s["inc"] = _double_conv(params["inc"], state["inc"], x, train)
    skips = [h]
    for i in range(len(downs)):
        pooled = jax.lax.reduce_window(
            skips[-1], -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID")
        h, new_s[f"down{i}"] = _double_conv(params[f"down{i}"],
                                            state[f"down{i}"], pooled, train)
        skips.append(h)
    h = skips.pop()
    for i in range(len(ups)):
        h, new_s[f"up{i}"] = _up(params[f"up{i}"], state[f"up{i}"], h,
                                 skips.pop(), train)
    return conv2d(params["outc"], h, padding=0), new_s
