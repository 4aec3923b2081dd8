"""BEiT-L/16 backbone (MiDaS DPT_BEiT_L_384 encoder), TPU-native.

The InvisibleStitch baseline's ZoeDepth-N core is MiDaS DPT_BEiT_L_384
(reference `invisible_stitch.py:43-47`, `zoedepth/models/base_models/
midas.py`). BEiT differs from the DINOv2/timm ViTs already in this repo:

  * no absolute positional embedding; each block adds a *relative
    position bias* to its attention logits, from a learned table of
    (2g-1)^2 + 3 entries (g = patch grid) indexed by relative offsets
    plus 3 cls-interaction slots;
  * attention has q_bias and v_bias but NO k bias;
  * residual branches are scaled by learned gamma_1 / gamma_2.

For inputs whose grid differs from the table's native grid the bias
table's spatial part is bilinearly resampled (MiDaS behavior). The
patch embedding accepts extra input channels for the InvisibleStitch
depth-completion variant (+observation, +depth_mask — reference
`invisible_stitch.py:56-63`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import dot_precision
from ..ops.resize import resize2d
from .layers import gelu, layer_norm, layer_norm_init, linear, linear_init

__all__ = ["BEiTConfig", "init_beit", "apply_beit"]


@dataclasses.dataclass(frozen=True)
class BEiTConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    img_size: int = 384           # native table grid = 24
    in_chans: int = 3
    mlp_ratio: float = 4.0

    @property
    def native_grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def table_size(self) -> int:
        g = self.native_grid
        return (2 * g - 1) ** 2 + 3


def _block_init(key, cfg: BEiTConfig):
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    hidden = int(d * cfg.mlp_ratio)
    return {
        "norm1": layer_norm_init(d),
        "attn": {
            "qkv_w": jax.random.normal(ks[0], (d, 3 * d)) * 0.02,
            "q_bias": jnp.zeros((d,), jnp.float32),
            "v_bias": jnp.zeros((d,), jnp.float32),
            "proj": linear_init(ks[1], d, d),
            "rel_pos_table": jnp.zeros((cfg.table_size, cfg.num_heads),
                                       jnp.float32),
        },
        "gamma_1": jnp.full((d,), 0.1, jnp.float32),
        "norm2": layer_norm_init(d),
        "mlp": {"fc1": linear_init(ks[2], d, hidden),
                "fc2": linear_init(ks[3], hidden, d)},
        "gamma_2": jnp.full((d,), 0.1, jnp.float32),
    }


def init_beit(key, cfg: BEiTConfig = BEiTConfig()) -> dict:
    keys = iter(jax.random.split(key, cfg.depth + 4))
    d = cfg.embed_dim
    blocks = [_block_init(next(keys), cfg) for _ in range(cfg.depth)]
    return {
        "patch_embed": {"proj": {
            "w": jax.random.normal(next(keys),
                                   (cfg.patch_size, cfg.patch_size,
                                    cfg.in_chans, d)) * 0.02,
            "b": jnp.zeros((d,), jnp.float32)}},
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "blocks": {str(i): b for i, b in enumerate(blocks)},
    }


def _rel_pos_index(g: int) -> np.ndarray:
    """BEiT relative_position_index for a g x g grid + cls token."""
    coords = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += g - 1
    rel[..., 1] += g - 1
    rel[..., 0] *= 2 * g - 1
    idx = np.zeros((g * g + 1, g * g + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = (2 * g - 1) ** 2 + 2
    idx[0:, 0] = (2 * g - 1) ** 2 + 1
    idx[0, 0] = (2 * g - 1) ** 2
    return idx


def _rel_pos_bias(table, cfg: BEiTConfig, grid: int):
    """[(2g0-1)^2+3, H] table -> [H, N+1, N+1] bias for grid g (resampled
    if g != native grid, MiDaS-style)."""
    g0 = cfg.native_grid
    if grid != g0:
        spatial = table[:-3].reshape(2 * g0 - 1, 2 * g0 - 1, cfg.num_heads)
        spatial = resize2d(spatial[None].astype(jnp.float32),
                           size=(2 * grid - 1, 2 * grid - 1),
                           method="bilinear", align_corners=True)[0]
        table = jnp.concatenate(
            [spatial.reshape(-1, cfg.num_heads), table[-3:]], axis=0)
    idx = jnp.asarray(_rel_pos_index(grid))
    bias = table[idx]  # [N+1, N+1, H]
    return bias.transpose(2, 0, 1)


def _attention(p, x, cfg: BEiTConfig, grid: int):
    b, n, c = x.shape
    d = c // cfg.num_heads
    qkv_bias = jnp.concatenate([p["q_bias"], jnp.zeros_like(p["q_bias"]),
                                p["v_bias"]])
    qkv = jnp.dot(x, p["qkv_w"].astype(x.dtype),
                  precision=dot_precision(x.dtype)) + qkv_bias.astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, cfg.num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                      precision=dot_precision(x.dtype))
    attn = attn + _rel_pos_bias(p["rel_pos_table"], cfg,
                                grid).astype(attn.dtype)[None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                   precision=dot_precision(x.dtype))
    o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear(p["proj"], o)


def apply_beit(params, cfg: BEiTConfig, x, taps):
    """x: [B,H,W,in_chans] -> list of token tensors [B, N+1, D] after each
    tap block (pre final norm — MiDaS hooks raw block outputs)."""
    b, h, w, _ = x.shape
    grid_h, grid_w = h // cfg.patch_size, w // cfg.patch_size
    assert grid_h == grid_w, "BEiT rel-pos path assumes square grids"
    pw = params["patch_embed"]["proj"]
    xp = x.reshape(b, grid_h, cfg.patch_size, grid_w, cfg.patch_size,
                   x.shape[-1])
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid_h * grid_w, -1)
    tokens = jnp.dot(xp, pw["w"].reshape(-1, cfg.embed_dim).astype(x.dtype),
                     precision=dot_precision(x.dtype)) + \
        pw["b"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)

    outs = []
    for i in range(cfg.depth):
        p = params["blocks"][str(i)]
        h1 = _attention(p["attn"], layer_norm(p["norm1"], tokens), cfg,
                        grid_h)
        tokens = tokens + h1 * p["gamma_1"].astype(tokens.dtype)
        h2 = linear(p["mlp"]["fc2"],
                    gelu(linear(p["mlp"]["fc1"],
                                layer_norm(p["norm2"], tokens))))
        tokens = tokens + h2 * p["gamma_2"].astype(tokens.dtype)
        if i in taps:
            outs.append(tokens)
    return outs
