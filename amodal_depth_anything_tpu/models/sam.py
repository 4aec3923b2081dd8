"""Segment Anything (SAM) in JAX — encoder, prompt encoder, mask decoder.

TPU-native re-implementation of the SAM ViT-H stack the reference demo
uses for point-prompted visible-object masks (`app.py:34-39,101-124`,
loaded from `sam_vit_h.pth`). Architecture follows the public SAM design:

  * image encoder: ViT with 14x14 windowed attention and 4 global blocks,
    decomposed relative position embeddings added to attention logits,
    patch 16, neck (1x1 conv -> LN -> 3x3 conv -> LN) to 256 channels;
  * prompt encoder: learned point embeddings on a random-Fourier
    positional encoding;
  * mask decoder: two-way transformer (token->image and image->token
    cross attention), IoU head, hypernetwork MLPs over upscaled
    embeddings.

Functional NHWC; sizes parametrized so tests run a tiny variant. The
default config matches SAM ViT-H for weight transplant.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init, conv_transpose_same_stride
from ..ops.precision import dot_precision
from .layers import layer_norm, layer_norm_init, linear, linear_init

__all__ = ["SAMConfig", "init_sam", "sam_encode_image", "sam_predict_masks"]


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280          # vit-h
    depth: int = 32
    num_heads: int = 16
    window_size: int = 14
    global_blocks: tuple = (7, 15, 23, 31)
    out_chans: int = 256
    decoder_dim: int = 256
    decoder_heads: int = 8
    decoder_layers: int = 2
    num_multimask: int = 3

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


# --------------------------------------------------------------------- init

def _mlp_init(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    return {str(i): linear_init(ks[i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1)}


def _mlp(p, x, *, act=jax.nn.relu, final_act=None):
    n = len(p)
    for i in range(n):
        x = linear(p[str(i)], x)
        if i < n - 1:
            x = act(x)
        elif final_act is not None:
            x = final_act(x)
    return x


def _enc_block_init(key, cfg: SAMConfig, window: int):
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    size = window if window else cfg.grid
    return {
        "norm1": layer_norm_init(d),
        "attn": {
            "qkv": linear_init(ks[0], d, 3 * d),
            "proj": linear_init(ks[1], d, d),
            "rel_pos_h": jnp.zeros((2 * size - 1, d // cfg.num_heads),
                                   jnp.float32),
            "rel_pos_w": jnp.zeros((2 * size - 1, d // cfg.num_heads),
                                   jnp.float32),
        },
        "norm2": layer_norm_init(d),
        "mlp": {"fc1": linear_init(ks[2], d, 4 * d),
                "fc2": linear_init(ks[3], 4 * d, d)},
    }


def init_sam(key, cfg: SAMConfig = SAMConfig()) -> dict:
    keys = iter(jax.random.split(key, 256))
    d = cfg.embed_dim
    enc = {
        "patch_embed": {"proj": conv2d_init(next(keys), cfg.patch_size,
                                            cfg.patch_size, 3, d)},
        "pos_embed": jnp.zeros((1, cfg.grid, cfg.grid, d), jnp.float32),
        "blocks": {str(i): _enc_block_init(
            next(keys), cfg,
            0 if i in cfg.global_blocks else cfg.window_size)
            for i in range(cfg.depth)},
        "neck": {
            "conv1": conv2d_init(next(keys), 1, 1, d, cfg.out_chans,
                                 bias=False),
            "ln1": layer_norm_init(cfg.out_chans),
            "conv2": conv2d_init(next(keys), 3, 3, cfg.out_chans,
                                 cfg.out_chans, bias=False),
            "ln2": layer_norm_init(cfg.out_chans),
        },
    }
    dd = cfg.decoder_dim
    prompt = {
        "pe_gaussian": jax.random.normal(next(keys), (2, dd // 2)),
        "point_embeddings": jax.random.normal(next(keys), (4, dd)) * 0.02,
        "not_a_point": jax.random.normal(next(keys), (1, dd)) * 0.02,
        "no_mask": jax.random.normal(next(keys), (1, dd)) * 0.02,
    }

    def twoway_layer(k):
        ks = jax.random.split(k, 10)
        attn = lambda kk, down=1: {
            "q": linear_init(kk, dd, dd // down),
            "k": linear_init(jax.random.fold_in(kk, 1), dd, dd // down),
            "v": linear_init(jax.random.fold_in(kk, 2), dd, dd // down),
            "out": linear_init(jax.random.fold_in(kk, 3), dd // down, dd),
        }
        return {
            "self_attn": attn(ks[0]),
            "norm1": layer_norm_init(dd),
            "cross_t2i": attn(ks[1], 2),
            "norm2": layer_norm_init(dd),
            "mlp": {"fc1": linear_init(ks[2], dd, 2048),
                    "fc2": linear_init(ks[3], 2048, dd)},
            "norm3": layer_norm_init(dd),
            "cross_i2t": attn(ks[4], 2),
            "norm4": layer_norm_init(dd),
        }

    n_masks = cfg.num_multimask + 1
    decoder = {
        "iou_token": jax.random.normal(next(keys), (1, dd)) * 0.02,
        "mask_tokens": jax.random.normal(next(keys), (n_masks, dd)) * 0.02,
        "layers": {str(i): twoway_layer(next(keys))
                   for i in range(cfg.decoder_layers)},
        "final_attn": {
            "q": linear_init(next(keys), dd, dd // 2),
            "k": linear_init(next(keys), dd, dd // 2),
            "v": linear_init(next(keys), dd, dd // 2),
            "out": linear_init(next(keys), dd // 2, dd),
        },
        "norm_final": layer_norm_init(dd),
        "upscale_conv1": {"w": jnp.zeros((dd, 2, 2, dd // 4), jnp.float32),
                          "b": jnp.zeros((dd // 4,), jnp.float32)},
        "upscale_ln": layer_norm_init(dd // 4),
        "upscale_conv2": {"w": jnp.zeros((dd // 4, 2, 2, dd // 8),
                                         jnp.float32),
                          "b": jnp.zeros((dd // 8,), jnp.float32)},
        "hyper_mlps": {str(i): _mlp_init(next(keys), (dd, dd, dd, dd // 8))
                       for i in range(n_masks)},
        "iou_head": _mlp_init(next(keys), (dd, dd, dd, n_masks)),
    }
    return {"encoder": enc, "prompt": prompt, "decoder": decoder}


# ------------------------------------------------------------------ encoder

def _rel_pos_bias(rel_pos, q_size, k_size):
    """Decomposed relative positions (SAM get_rel_pos): returns
    [q_size, k_size, head_dim] gathered table (q_size==k_size here)."""
    coords_q = jnp.arange(q_size)[:, None]
    coords_k = jnp.arange(k_size)[None, :]
    rel = coords_q - coords_k + (k_size - 1)
    return rel_pos[rel]


def _windowed_attention(p, x, num_heads, *, use_rel_pos=True):
    """x: [B*, H, W, C] full attention over the window/grid with decomposed
    rel-pos (SAM Attention.forward)."""
    b, h, w, c = x.shape
    n = h * w
    d = c // num_heads
    qkv = linear(p["qkv"], x.reshape(b, n, c)).reshape(b, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scale = d ** -0.5
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                      precision=dot_precision(x.dtype))
    if use_rel_pos:
        # SAM add_decomposed_rel_pos: bias uses the UNSCALED q
        rh = _rel_pos_bias(p["rel_pos_h"].astype(x.dtype), h, h)  # [h,h,d]
        rw = _rel_pos_bias(p["rel_pos_w"].astype(x.dtype), w, w)
        qr = q.reshape(b, num_heads, h, w, d)
        bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh,
                            precision=dot_precision(x.dtype))
        bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw,
                            precision=dot_precision(x.dtype))
        bias = bias_h[:, :, :, :, :, None] + bias_w[:, :, :, :, None, :]
        attn = attn + bias.reshape(b, num_heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                   precision=dot_precision(x.dtype))
    o = o.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return linear(p["proj"], o)


def _enc_block(p, x, cfg: SAMConfig, window: int):
    shortcut = x
    x = layer_norm(p["norm1"], x)
    b, h, w, c = x.shape
    if window:
        pad_h = (window - h % window) % window
        pad_w = (window - w % window) % window
        xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        xw = xp.reshape(b, hp // window, window, wp // window, window, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
        yw = _windowed_attention(p["attn"], xw, cfg.num_heads)
        yw = yw.reshape(b, hp // window, wp // window, window, window, c)
        y = yw.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :h, :w]
    else:
        y = _windowed_attention(p["attn"], x, cfg.num_heads)
    x = shortcut + y
    h2 = layer_norm(p["norm2"], x)
    h2 = linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], h2),
                                             approximate=False))
    return x + h2


def sam_encode_image(params, cfg: SAMConfig, x):
    """x: [B, S, S, 3] ImageNet-normalized -> embedding [B, S/16, S/16, 256]."""
    enc = params["encoder"]
    h = conv2d(enc["patch_embed"]["proj"], x, stride=cfg.patch_size,
               padding=0)
    h = h + enc["pos_embed"].astype(h.dtype)
    for i in range(cfg.depth):
        window = 0 if i in cfg.global_blocks else cfg.window_size
        h = _enc_block(enc["blocks"][str(i)], h, cfg, window)
    h = conv2d(enc["neck"]["conv1"], h, padding=0)
    h = layer_norm(enc["neck"]["ln1"], h)
    h = conv2d(enc["neck"]["conv2"], h, padding=1)
    return layer_norm(enc["neck"]["ln2"], h)


# ------------------------------------------------------------ prompt/decoder

def _pe_encode(prompt, coords):
    """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
    c = (coords * 2.0 - 1.0) @ prompt["pe_gaussian"].astype(coords.dtype)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def _image_pe(prompt, gh, gw, dtype):
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    # (y, x) -> encode with (x, y) order as SAM does
    pe = _pe_encode(prompt, grid[..., ::-1].astype(dtype))
    return pe  # [gh, gw, dd]


def _decoder_attn(p, q, k, v, heads):
    dq = linear(p["q"], q)
    dk = linear(p["k"], k)
    dv = linear(p["v"], v)
    b, nq, c = dq.shape
    d = c // heads
    def split(t):
        return t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
    a = jnp.einsum("bhqd,bhkd->bhqk", split(dq) * (d ** -0.5), split(dk),
                   precision=dot_precision(q.dtype))
    a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, split(dv),
                   precision=dot_precision(q.dtype))
    o = o.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return linear(p["out"], o)


def sam_predict_masks(params, cfg: SAMConfig, image_embedding, point_coords,
                      point_labels):
    """image_embedding: [B, gh, gw, 256]; point_coords: [B, P, 2] in [0,1]
    (x, y); point_labels: [B, P] (1 fg, 0 bg, -1 pad).

    Returns (masks [B, n_masks, 4*gh, 4*gw] logits, iou [B, n_masks])."""
    prompt, dec = params["prompt"], params["decoder"]
    b, gh, gw, dd = image_embedding.shape
    dtype = image_embedding.dtype

    pts = _pe_encode(prompt, point_coords.astype(dtype))
    lbl = point_labels[..., None]
    pts = jnp.where(lbl == -1, prompt["not_a_point"].astype(dtype), pts)
    pts = pts + jnp.where(lbl == 1, prompt["point_embeddings"][1].astype(dtype),
                          jnp.where(lbl == 0,
                                    prompt["point_embeddings"][0].astype(dtype),
                                    0.0))

    n_masks = cfg.num_multimask + 1
    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]],
                                 axis=0).astype(dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens, (b, n_masks + 1, dd)), pts], axis=1)

    src = image_embedding + prompt["no_mask"].astype(dtype).reshape(1, 1, 1, dd)
    src = src.reshape(b, gh * gw, dd)
    pos = _image_pe(prompt, gh, gw, dtype).reshape(1, gh * gw, dd)

    q = tokens
    for i in range(cfg.decoder_layers):
        layer = dec["layers"][str(i)]
        attn_in = q if i == 0 else q + tokens
        q = layer_norm(layer["norm1"],
                       q + _decoder_attn(layer["self_attn"], attn_in, attn_in,
                                         q, cfg.decoder_heads))
        qp = q + tokens
        q = layer_norm(layer["norm2"],
                       q + _decoder_attn(layer["cross_t2i"], qp, src + pos,
                                         src, cfg.decoder_heads))
        h = linear(layer["mlp"]["fc2"],
                   jax.nn.relu(linear(layer["mlp"]["fc1"], q)))
        q = layer_norm(layer["norm3"], q + h)
        src = layer_norm(layer["norm4"],
                         src + _decoder_attn(layer["cross_i2t"], src + pos,
                                             q + tokens, q,
                                             cfg.decoder_heads))

    qp = q + tokens
    q = layer_norm(dec["norm_final"],
                   q + _decoder_attn(dec["final_attn"], qp, src + pos, src,
                                     cfg.decoder_heads))

    iou_out = _mlp(dec["iou_head"], q[:, 0])
    mask_tokens_out = q[:, 1:1 + n_masks]

    feat = src.reshape(b, gh, gw, dd)
    up = conv_transpose_same_stride(dec["upscale_conv1"], feat, k=2)
    up = jax.nn.gelu(layer_norm(dec["upscale_ln"], up), approximate=False)
    up = conv_transpose_same_stride(dec["upscale_conv2"], up, k=2)
    up = jax.nn.gelu(up, approximate=False)  # [b, 4gh, 4gw, dd//8]

    hyper = jnp.stack([_mlp(dec["hyper_mlps"][str(i)], mask_tokens_out[:, i])
                       for i in range(n_masks)], axis=1)  # [b, n, dd//8]
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up,
                       precision=dot_precision(dtype))
    return masks, iou_out
