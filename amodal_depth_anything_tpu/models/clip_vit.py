"""CLIP ViT image encoder (for pix2gestalt conditioning).

pix2gestalt conditions its SD UNet on a CLIP ViT-L/14 image embedding of
the visible-object crop (cross-attention context) plus VAE latents on
channels. This is the standard CLIP vision tower: patch conv (no bias),
class embedding, learned positional embedding, pre-LN transformer with
quickGELU, final LN, linear projection to the shared space.

Functional NHWC; tiny-configurable for tests; weight transplant maps the
open-clip / transformers `vision_model.*` keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.conv import conv2d
from .layers import layer_norm, layer_norm_init, linear, linear_init

__all__ = ["CLIPVisionConfig", "init_clip_vision", "clip_image_embed"]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024            # vit-l/14
    depth: int = 24
    num_heads: int = 16
    projection_dim: int = 768

    @property
    def grid(self):
        return self.image_size // self.patch_size


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_vision(key, cfg: CLIPVisionConfig = CLIPVisionConfig()) -> dict:
    keys = iter(jax.random.split(key, cfg.depth * 4 + 8))
    d = cfg.width
    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "ln1": layer_norm_init(d),
            "attn": {"qkv": linear_init(next(keys), d, 3 * d),
                     "proj": linear_init(next(keys), d, d)},
            "ln2": layer_norm_init(d),
            "mlp": {"fc1": linear_init(next(keys), d, 4 * d),
                    "fc2": linear_init(next(keys), 4 * d, d)},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": {"w": jax.random.normal(next(keys),
                                               (cfg.patch_size, cfg.patch_size,
                                                3, d)) * 0.02},
        "class_embedding": jnp.zeros((d,), jnp.float32),
        "pos_embed": jax.random.normal(next(keys),
                                       (cfg.grid ** 2 + 1, d)) * 0.02,
        "pre_ln": layer_norm_init(d),
        "blocks": stacked,
        "post_ln": layer_norm_init(d),
        "proj": {"w": jax.random.normal(next(keys),
                                        (d, cfg.projection_dim)) * 0.02},
    }


def clip_image_embed(params, cfg: CLIPVisionConfig, x, *,
                     attn_impl: str | None = None):
    """x: [B,S,S,3] CLIP-normalized -> [B, projection_dim] embedding."""
    b = x.shape[0]
    h = conv2d({"w": params["patch_embed"]["w"]}, x, stride=cfg.patch_size,
               padding=0)
    tokens = h.reshape(b, -1, cfg.width)
    cls = jnp.broadcast_to(params["class_embedding"].astype(tokens.dtype),
                           (b, 1, cfg.width))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    tokens = layer_norm(params["pre_ln"], tokens)

    def block(tok, p):
        y = layer_norm(p["ln1"], tok)
        n = y.shape[1]
        qkv = linear(p["attn"]["qkv"], y).reshape(b, n, 3, cfg.num_heads, -1)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = multi_head_attention(q, k, v, impl=attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.width)
        tok = tok + linear(p["attn"]["proj"], o)
        y = layer_norm(p["ln2"], tok)
        y = linear(p["mlp"]["fc2"], _quick_gelu(linear(p["mlp"]["fc1"], y)))
        return tok + y, None

    tokens, _ = jax.lax.scan(block, tokens, params["blocks"])
    pooled = layer_norm(params["post_ln"], tokens[:, 0])
    return jnp.dot(pooled, params["proj"]["w"].astype(pooled.dtype))
