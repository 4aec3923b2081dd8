"""ResNet feature backbone (NHWC) for the ADDeepLab baseline.

The reference builds its encoder with `timm.create_model('resnet50',
features_only=True)` and widens conv1 to 4 input channels
(`src/models/amodalsynthdrive/deeplab.py:208,239-250`; encoder name from
`config/deeplab.yaml:11`). timm isn't available in this image, so this is
a from-scratch functional ResNet-50 v1 (bottleneck blocks, BN) returning
the four stage features [256, 512, 1024, 2048] at strides 4/8/16/32.

BatchNorm state: running mean/var live in a separate `bn_state` pytree;
`apply_resnet(..., train=True)` normalizes with batch statistics and
returns updated running stats (momentum 0.1, torch convention), otherwise
it uses the stored running stats. Keeping BN state out of `params` keeps
the optimizer pytree clean.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init

__all__ = ["ResNetConfig", "init_resnet", "apply_resnet"]

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    in_channels: int = 4          # rgb + guide mask (widened conv1)
    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    width: int = 64

    @property
    def stage_channels(self):
        return tuple(self.width * 4 * (2 ** i) for i in range(4))


def _bn_init(ch):
    return ({"scale": jnp.ones((ch,), jnp.float32),
             "bias": jnp.zeros((ch,), jnp.float32)},
            {"mean": jnp.zeros((ch,), jnp.float32),
             "var": jnp.ones((ch,), jnp.float32)})


def _bottleneck_init(key, cin, cmid, cout, stride):
    ks = jax.random.split(key, 4)
    p, s = {}, {}
    p["conv1"] = conv2d_init(ks[0], 1, 1, cin, cmid, bias=False)
    p["bn1"], s["bn1"] = _bn_init(cmid)
    p["conv2"] = conv2d_init(ks[1], 3, 3, cmid, cmid, bias=False)
    p["bn2"], s["bn2"] = _bn_init(cmid)
    p["conv3"] = conv2d_init(ks[2], 1, 1, cmid, cout, bias=False)
    p["bn3"], s["bn3"] = _bn_init(cout)
    if stride != 1 or cin != cout:
        p["downsample"] = conv2d_init(ks[3], 1, 1, cin, cout, bias=False)
        p["downsample_bn"], s["downsample_bn"] = _bn_init(cout)
    return p, s


def init_resnet(key, cfg: ResNetConfig = ResNetConfig()):
    keys = iter(jax.random.split(key, 64))
    params: dict = {"conv1": conv2d_init(next(keys), 7, 7, cfg.in_channels,
                                         cfg.width, bias=False)}
    state: dict = {}
    params["bn1"], state["bn1"] = _bn_init(cfg.width)
    cin = cfg.width
    for stage, n_blocks in enumerate(cfg.layers):
        cmid = cfg.width * (2 ** stage)
        cout = cmid * 4
        blocks_p, blocks_s = {}, {}
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            bp, bs = _bottleneck_init(next(keys), cin, cmid, cout, stride)
            blocks_p[str(b)] = bp
            blocks_s[str(b)] = bs
            cin = cout
        params[f"layer{stage + 1}"] = blocks_p
        state[f"layer{stage + 1}"] = blocks_s
    return params, state


def _bn(p, s, x, train: bool):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {"mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
                 "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased}
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS)
    y = y * p["scale"] + p["bias"]
    return y.astype(dtype), new_s


def _bottleneck(p, s, x, stride, train):
    out_s = {}
    h, out_s["bn1"] = _bn(p["bn1"], s["bn1"],
                          conv2d(p["conv1"], x, padding=0), train)
    h = jax.nn.relu(h)
    h, out_s["bn2"] = _bn(p["bn2"], s["bn2"],
                          conv2d(p["conv2"], h, stride=stride, padding=1),
                          train)
    h = jax.nn.relu(h)
    h, out_s["bn3"] = _bn(p["bn3"], s["bn3"],
                          conv2d(p["conv3"], h, padding=0), train)
    if "downsample" in p:
        x, out_s["downsample_bn"] = _bn(
            p["downsample_bn"], s["downsample_bn"],
            conv2d(p["downsample"], x, stride=stride, padding=0), train)
    return jax.nn.relu(h + x), out_s


def apply_resnet(params, state, x, cfg: ResNetConfig = ResNetConfig(), *,
                 train: bool = False):
    """x: [B,H,W,in_channels] -> ([c2,c3,c4,c5] features, new_state)."""
    new_state: dict = {}
    h, new_state["bn1"] = _bn(params["bn1"], state["bn1"],
                              conv2d(params["conv1"], x, stride=2, padding=3),
                              train)
    h = jax.nn.relu(h)
    # maxpool 3x3 stride 2 pad 1
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = []
    for stage, n_blocks in enumerate(cfg.layers):
        sp, ss = params[f"layer{stage + 1}"], state[f"layer{stage + 1}"]
        stage_state = {}
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            h, stage_state[str(b)] = _bottleneck(sp[str(b)], ss[str(b)], h,
                                                 stride, train)
        new_state[f"layer{stage + 1}"] = stage_state
        feats.append(h)
    return feats, new_state
