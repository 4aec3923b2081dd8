"""ADDeepLab baseline: ResNet + ASPP + AdaBins decoder + dual depth heads.

Functional re-design of the reference baseline
(`src/models/amodalsynthdrive/deeplab.py:203-291`): ImageNet-normalized
RGB concatenated with the amodal guide mask (4-channel widened conv1,
:239-250), ResNet-50 stage features, DeepLabV3 ASPP on the last stage
(dilations 1/12/24/36 with a global image-pool branch, :210 and
:110-154), an AdaBins-style top-down decoder (1x1 entry + bilinear-
upsample-concat-conv fusion, :156-170), then TWO heads (:172-201,273-280):

  * visible depth head (conv5 -> up2x -> conv3 -> pred);
  * an mViT transformer-decoder (:186-201) cross-attending the decoder
    feature (queries) against the visible head's intermediate map
    (memory), whose output refines the feature for the invisible head.

Both heads end in sigmoid. Trained by the AmodalSynthDriveTrainer with
the w_occ-weighted two-region loss (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.conv import conv2d, conv2d_init
from ..ops.precision import dot_precision
from ..ops.resize import resize2d
from .amodal_dav2 import IMAGENET_MEAN, IMAGENET_STD
from .resnet import ResNetConfig, apply_resnet, init_resnet

__all__ = ["ADDeepLabConfig", "init_addeeplab", "apply_addeeplab"]


@dataclasses.dataclass(frozen=True)
class ADDeepLabConfig:
    channels: Sequence[int] = (256, 512, 1024, 2048)
    up_sample_channels: Sequence[int] = (128, 256, 512, 1024)
    aspp_dilations: Sequence[int] = (1, 12, 24, 36)
    aspp_channels: int = 512
    patch_size: int = 8
    mvit_heads: int = 8
    mvit_layers: int = 4
    mvit_ff: int = 1024
    resnet: ResNetConfig = ResNetConfig(in_channels=4)


def _lin_init(key, i, o):
    k = 1.0 / math.sqrt(i)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (i, o), jnp.float32, -k, k),
            "b": jax.random.uniform(kb, (o,), jnp.float32, -k, k)}


def _lin(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype),
                   precision=dot_precision(x.dtype)) + p["b"].astype(x.dtype)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + eps) * p["scale"] +
            p["bias"]).astype(x.dtype)


def _decoder_layer_init(key, d, heads, ff):
    ks = jax.random.split(key, 8)
    ln = lambda: {"scale": jnp.ones((d,), jnp.float32),
                  "bias": jnp.zeros((d,), jnp.float32)}
    return {
        "self_attn": {"qkv": _lin_init(ks[0], d, 3 * d),
                      "out": _lin_init(ks[1], d, d)},
        "cross_attn": {"q": _lin_init(ks[2], d, d),
                       "kv": _lin_init(ks[3], d, 2 * d),
                       "out": _lin_init(ks[4], d, d)},
        "ff": {"fc1": _lin_init(ks[5], d, ff), "fc2": _lin_init(ks[6], ff, d)},
        "norm1": ln(), "norm2": ln(), "norm3": ln(),
    }


def init_addeeplab(key, cfg: ADDeepLabConfig = ADDeepLabConfig()):
    keys = iter(jax.random.split(key, 64))
    params: dict = {}
    params["encoder"], bn_state = init_resnet(next(keys), cfg.resnet)
    # zero the guide-mask input channel (reference :239-250)
    w = params["encoder"]["conv1"]["w"]
    params["encoder"]["conv1"]["w"] = w.at[:, :, 3:, :].set(0.0)

    c_last = cfg.channels[-1]
    # the whole decoder uses Conv2DModule(bias=False) in the reference
    # (deeplab.py:40-75 default) — only the mViT patch convs carry bias
    aspp = {"image_pool": conv2d_init(next(keys), 1, 1, c_last,
                                      cfg.aspp_channels, bias=False)}
    for i, d in enumerate(cfg.aspp_dilations):
        k = 1 if d == 1 else 3
        aspp[f"branch{i}"] = conv2d_init(next(keys), k, k, c_last,
                                         cfg.aspp_channels, bias=False)
    aspp["bottleneck"] = conv2d_init(
        next(keys), 3, 3, (len(cfg.aspp_dilations) + 1) * cfg.aspp_channels,
        c_last, bias=False)
    params["aspp_head"] = aspp

    conv_list = {}
    up_prev = None
    for i, (cin, cup) in enumerate(zip(cfg.channels[::-1],
                                       cfg.up_sample_channels[::-1])):
        if i == 0:
            conv_list[str(i)] = {"conv": conv2d_init(next(keys), 1, 1, cin,
                                                     cup, bias=False)}
        else:
            conv_list[str(i)] = {
                "convA": conv2d_init(next(keys), 3, 3, cin + up_prev, cup,
                                     bias=False),
                "convB": conv2d_init(next(keys), 3, 3, cup, cup, bias=False),
            }
        up_prev = cup
    params["conv_list"] = conv_list

    d0 = cfg.up_sample_channels[0]

    def head_init():
        return {"conv_1": conv2d_init(next(keys), 5, 5, d0, d0, bias=False),
                "conv_2": conv2d_init(next(keys), 3, 3, d0, d0, bias=False),
                "pred": conv2d_init(next(keys), 3, 3, d0, 1, bias=False)}

    params["visible_depth_head"] = head_init()
    params["in_visible_depth_head"] = head_init()
    params["cross_att_layer"] = {
        "patch_x": conv2d_init(next(keys), cfg.patch_size, cfg.patch_size,
                               d0, d0),
        "patch_ym": conv2d_init(next(keys), cfg.patch_size, cfg.patch_size,
                                d0, d0),
        "layers": {str(i): _decoder_layer_init(next(keys), d0,
                                               cfg.mvit_heads, cfg.mvit_ff)
                   for i in range(cfg.mvit_layers)},
    }
    return params, bn_state


def _mha(q, k, v, heads, attn_impl):
    b, n, c = q.shape
    d = c // heads
    qh = q.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], heads, d).transpose(0, 2, 1, 3)
    o = multi_head_attention(qh, kh, vh, impl=attn_impl)
    return o.transpose(0, 2, 1, 3).reshape(b, n, c)


def _decoder_layer(p, tgt, memory, heads, attn_impl):
    # torch TransformerDecoderLayer (post-norm): self-attn, cross-attn, FF
    qkv = _lin(p["self_attn"]["qkv"], tgt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tgt = _ln(p["norm1"], tgt + _lin(p["self_attn"]["out"],
                                     _mha(q, k, v, heads, attn_impl)))
    q = _lin(p["cross_attn"]["q"], tgt)
    kv = _lin(p["cross_attn"]["kv"], memory)
    k, v = jnp.split(kv, 2, axis=-1)
    tgt = _ln(p["norm2"], tgt + _lin(p["cross_attn"]["out"],
                                     _mha(q, k, v, heads, attn_impl)))
    h = _lin(p["ff"]["fc2"], jax.nn.relu(_lin(p["ff"]["fc1"], tgt)))
    return _ln(p["norm3"], tgt + h)


def _depth_head(p, x):
    ym = jax.nn.relu(conv2d(p["conv_1"], x, padding=2))
    h = resize2d(ym, scale_factor=2.0, method="bilinear", align_corners=True)
    h = jax.nn.relu(conv2d(p["conv_2"], h, padding=1))
    return ym, conv2d(p["pred"], h, padding=1)


def apply_addeeplab(params, bn_state, cfg: ADDeepLabConfig, x, *,
                    guide_mask=None, train: bool = False,
                    attn_impl: str | None = None, **_unused):
    """x: [B,H,W,3] in [0,1]; guide_mask: [B,H,W,1].

    Returns ((visible_depth, invisible_depth), new_bn_state); both
    [B,H/2,W/2,1] sigmoid (the reference's heads predict at half input
    resolution: /4 decoder output upsampled 2x in each head)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    x = (x - mean) / std
    h = jnp.concatenate([x, guide_mask.astype(x.dtype)], axis=-1)
    feats, new_bn = apply_resnet(params["encoder"], bn_state, h, cfg.resnet,
                                 train=train)
    preds = addeeplab_decoder(params, cfg, feats, attn_impl=attn_impl)
    return preds, new_bn


def addeeplab_decoder(params, cfg: ADDeepLabConfig, feats, *,
                      attn_impl: str | None = None):
    """ASPP -> top-down fusion -> dual heads + mViT, on backbone feature
    maps [stride 4/8/16/32] (reference forward, deeplab.py:252-281).
    Factored out so the decoder can be golden-tested against the
    reference with injected features (its encoder needs timm weights)."""
    last = feats[-1]
    pool = jnp.mean(last, axis=(1, 2), keepdims=True)
    pool = jax.nn.relu(conv2d(params["aspp_head"]["image_pool"], pool,
                              padding=0))
    pool = resize2d(pool, size=last.shape[1:3], method="bilinear",
                    align_corners=True)
    branches = [pool]
    for i, d in enumerate(cfg.aspp_dilations):
        p = params["aspp_head"][f"branch{i}"]
        if d == 1:
            y = conv2d(p, last, padding=0)
        else:
            y = jax.lax.conv_general_dilated(
                last, p["w"].astype(last.dtype), (1, 1),
                [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=dot_precision(last.dtype))
            if "b" in p:
                y = y + p["b"].astype(last.dtype)
        branches.append(jax.nn.relu(y))
    aspp = jnp.concatenate(branches, axis=-1)
    aspp = jax.nn.relu(conv2d(params["aspp_head"]["bottleneck"], aspp,
                              padding=1))

    feats = feats[:-1] + [aspp]
    top_down = feats[::-1]
    cur = None
    for i, feat in enumerate(top_down):
        p = params["conv_list"][str(i)]
        if i == 0:
            cur = jax.nn.relu(conv2d(p["conv"], feat, padding=0))
        else:
            up = resize2d(cur, size=feat.shape[1:3], method="bilinear",
                          align_corners=True)
            cur = jnp.concatenate([up, feat], axis=-1)
            cur = jax.nn.relu(conv2d(p["convA"], cur, padding=1))
            cur = jax.nn.relu(conv2d(p["convB"], cur, padding=1))

    ym, visible_pred = _depth_head(params["visible_depth_head"], cur)

    ca = params["cross_att_layer"]
    ps = cfg.patch_size
    xp = conv2d(ca["patch_x"], cur, stride=ps, padding=0)
    yp = conv2d(ca["patch_ym"], ym, stride=ps, padding=0)
    b, gh, gw, d0 = xp.shape
    tgt = xp.reshape(b, gh * gw, d0)
    mem = yp.reshape(b, gh * gw, d0)
    for i in range(cfg.mvit_layers):
        tgt = _decoder_layer(ca["layers"][str(i)], tgt, mem, cfg.mvit_heads,
                             attn_impl)
    att = tgt.reshape(b, gh, gw, d0)
    att_up = resize2d(att, size=cur.shape[1:3], method="bilinear",
                      align_corners=True)
    updated = cur + att_up
    _, invisible_pred = _depth_head(params["in_visible_depth_head"], updated)

    return jax.nn.sigmoid(visible_pred), jax.nn.sigmoid(invisible_pred)
