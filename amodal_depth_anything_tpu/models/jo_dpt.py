"""PartialCompletionContentDPT baseline (jo_amodal DPT + SPADE), TPU-native.

Re-design of the reference baseline
(`src/models/amodalsynthdrive/jo_amodal/PartialCompletionContentDPT.py:26-58`
and `jo_amodal/dpt/`): a timm-style ViT-L/16-384 backbone whose patch
embedding takes 4 channels (rgb + amodal guide mask, `vit.py:291`), hook
taps at blocks [5,11,17,23] (`models.py:53-58`), 'project' readout (token
concat cls -> linear+GELU, `vit.py:79-90`), the DPT reassemble convs
(1x1 + convT4/convT2/id/conv3s2, `vit.py:260-339`), SPADE blocks that
modulate each fusion input with the nearest-resized guide mask
(`SPADE.py:13-56`: param-free BatchNorm, shared conv+relu, gamma/beta
convs, x_norm*(1+gamma)+beta), standard refinenets, and the MiDaS output
head (conv3 -> 2x bilinear up -> conv3 -> relu -> conv1), sigmoid-wrapped
(`PartialCompletionContentDPT.py:46-50`).

Functional, NHWC; ViT blocks reuse `models.layers.vit_block` (timm blocks
are our blocks without LayerScale). SPADE's param-free BN running stats
live in a `bn_state` tree like the ResNet baseline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init, conv_transpose_same_stride
from ..ops.resize import resize2d, resize_nearest
from .dinov2 import patch_embed
from .dpt import _fusion, _fusion_init
from .layers import (gelu, layer_norm, layer_norm_init, linear, linear_init,
                     vit_block, vit_block_init)

__all__ = ["JoDPTConfig", "init_jo_dpt", "apply_jo_dpt"]

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class JoDPTConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    img_size: int = 384
    in_chans: int = 4
    hooks: tuple = (5, 11, 17, 23)
    tap_channels: tuple = (256, 512, 1024, 1024)
    features: int = 256
    spade_hidden: int = 128

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def _spade_init(key, ch: int, hidden: int):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"mlp_shared": conv2d_init(k1, 3, 3, 1, hidden),
              "mlp_gamma": conv2d_init(k2, 3, 3, hidden, ch),
              "mlp_beta": conv2d_init(k3, 3, 3, hidden, ch)}
    state = {"mean": jnp.zeros((ch,), jnp.float32),
             "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def init_jo_dpt(key, cfg: JoDPTConfig = JoDPTConfig()):
    keys = iter(jax.random.split(key, 128))
    d = cfg.embed_dim
    blocks = [vit_block_init(next(keys), d, init_values=None)
              for _ in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params: dict = {
        "patch_embed": {"proj": {
            "w": jax.random.normal(next(keys),
                                   (cfg.patch_size, cfg.patch_size,
                                    cfg.in_chans, d)) * 0.02,
            "b": jnp.zeros((d,), jnp.float32)}},
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "pos_embed": jax.random.normal(next(keys),
                                       (1, cfg.grid ** 2 + 1, d)) * 0.02,
        "blocks": stacked,
        "norm": layer_norm_init(d),
        "readout": {}, "reassemble": {}, "scratch": {}, "spade": {},
    }
    bn_state = {}
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
        params["spade"][str(i)], bn_state[str(i)] = _spade_init(
            next(keys), cfg.features, cfg.spade_hidden)
    sc["output_conv"] = {
        "conv1": conv2d_init(next(keys), 3, 3, cfg.features,
                             cfg.features // 2),
        "conv2": conv2d_init(next(keys), 3, 3, cfg.features // 2, 32),
        "conv3": conv2d_init(next(keys), 1, 1, 32, 1),
    }
    return params, bn_state


def _bn_free(state, x, train: bool):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        new = {"mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
               "var": (1 - BN_MOMENTUM) * state["var"] +
               BN_MOMENTUM * var * n / max(n - 1, 1)}
    else:
        mean, var = state["mean"], state["var"]
        new = state
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS)
    return y.astype(dtype), new


def _spade(p, state, x, seg, train: bool):
    normalized, new_state = _bn_free(state, x, train)
    seg = resize_nearest(seg, size=x.shape[1:3]).astype(x.dtype)
    h = jax.nn.relu(conv2d(p["mlp_shared"], seg, padding=1))
    gamma = conv2d(p["mlp_gamma"], h, padding=1)
    beta = conv2d(p["mlp_beta"], h, padding=1)
    return normalized * (1.0 + gamma) + beta, new_state


def apply_jo_dpt(params, bn_state, cfg: JoDPTConfig, x, guide_mask, *,
                 train: bool = False, attn_impl: str | None = None):
    """x: [B,H,W,3] rgb; guide_mask: [B,H,W,1]. Returns (sigmoid depth
    [B,H,W,1], new_bn_state)."""
    h_img = jnp.concatenate([x, guide_mask.astype(x.dtype)], axis=-1)
    b, hh, ww, _ = h_img.shape
    gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
    tokens = patch_embed(params["patch_embed"], h_img, cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pe = params["pos_embed"]
    if gh * gw + 1 != pe.shape[1]:
        # timm _resize_pos_embed: bilinear, align_corners=False (vit.py:148-163)
        g0 = int((pe.shape[1] - 1) ** 0.5)
        grid = pe[:, 1:].reshape(1, g0, g0, -1).astype(jnp.float32)
        grid = resize2d(grid, size=(gh, gw), method="bilinear")
        pe = jnp.concatenate([pe[:, :1],
                              grid.reshape(1, gh * gw, -1).astype(pe.dtype)],
                             axis=1)
    tokens = tokens + pe.astype(tokens.dtype)

    taps = []
    start = 0
    for t in cfg.hooks:
        seg = jax.tree.map(lambda a: a[start:t + 1], params["blocks"])

        def block_fn(tok, p):
            return vit_block(p, tok, num_heads=cfg.num_heads,
                             attn_impl=attn_impl), None

        tokens, _ = jax.lax.scan(block_fn, tokens, seg)
        taps.append(tokens)
        start = t + 1

    feats = []
    for i, tok in enumerate(taps):
        # 'project' readout: concat cls onto every token, linear+GELU
        cls_t = jnp.broadcast_to(tok[:, :1], tok[:, 1:].shape)
        merged = jnp.concatenate([tok[:, 1:], cls_t], axis=-1)
        proj = gelu(linear(params["readout"][str(i)], merged))
        fm = proj.reshape(b, gh, gw, cfg.embed_dim)
        fm = conv2d(params["reassemble"][str(i)]["project"], fm, padding=0)
        if i == 0:
            fm = conv_transpose_same_stride(params["reassemble"]["0"]["resize"],
                                            fm, k=4)
        elif i == 1:
            fm = conv_transpose_same_stride(params["reassemble"]["1"]["resize"],
                                            fm, k=2)
        elif i == 3:
            fm = conv2d(params["reassemble"]["3"]["resize"], fm, stride=2,
                        padding=1)
        feats.append(fm)

    sc = params["scratch"]
    rn = [conv2d(sc[f"layer{i + 1}_rn"], f, padding=1)
          for i, f in enumerate(feats)]
    l1, l2, l3, l4 = rn

    new_bn = {}
    l4m, new_bn["4"] = _spade(params["spade"]["4"], bn_state["4"], l4,
                              guide_mask, train)
    path4 = _fusion(sc["refinenet4"], l4m, None, size=None)
    path4m, new_bn["3"] = _spade(params["spade"]["3"], bn_state["3"], path4,
                                 guide_mask, train)
    path3 = _fusion(sc["refinenet3"], path4m, l3, size=None)
    path3m, new_bn["2"] = _spade(params["spade"]["2"], bn_state["2"], path3,
                                 guide_mask, train)
    path2 = _fusion(sc["refinenet2"], path3m, l2, size=None)
    path2m, new_bn["1"] = _spade(params["spade"]["1"], bn_state["1"], path2,
                                 guide_mask, train)
    path1 = _fusion(sc["refinenet1"], path2m, l1, size=None)

    out = conv2d(sc["output_conv"]["conv1"], path1, padding=1)
    out = resize2d(out, scale_factor=2.0, method="bilinear",
                   align_corners=True)
    out = jax.nn.relu(conv2d(sc["output_conv"]["conv2"], out, padding=1))
    out = conv2d(sc["output_conv"]["conv3"], out, padding=0)
    return jax.nn.sigmoid(out), new_bn
