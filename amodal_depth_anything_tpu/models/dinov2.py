"""Guided DINOv2 vision transformer, TPU-native.

Re-design of the reference encoder (`depth_anything_v2/dinov2.py:44-448`):
DINOv2 ViT with an extra zero-initialized *guidance* patch-embedding branch
whose output is added to the RGB patch tokens before the cls token and
positional embedding (reference `dinov2.py:232-246`). Intermediate layer
outputs at 4 tap depths feed the DPT decoder
(`get_intermediate_layers`, reference `dinov2.py:324-349`).

TPU-first choices:
  * Patch embedding is an explicit space-to-depth reshape + one MXU matmul
    (a stride-14 conv forces XLA through im2col anyway; doing the reshape
    ourselves guarantees the layout).
  * The block trunk runs as `lax.scan` over stacked per-depth parameters,
    split into segments at the tap depths, so compiles stay fast at
    depth 40 (vitg) and tap activations never stack in HBM.
  * Positional-embedding interpolation reuses `ops.resize2d` (exact torch
    bicubic with scale_factor=(w0+offset)/sqrt(N) semantics,
    reference `dinov2.py:199-230`). At native 518 px it's an identity.
  * Optional `jax.checkpoint` (remat) around each block for training.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.attention import default_attn_impl, pad_seq_len
from ..ops.precision import dot_precision
from ..ops.resize import resize2d
from .layers import layer_norm, layer_norm_init, vit_block, vit_block_init

GUIDE_CHANNELS = {
    "image+mask+observation": 5,
    "image+mask": 4,
    "image+observation": 4,
    "mask+observation": 2,
    "mask": 1,
    "observation": 1,
    "none": 0,
}

# Encoder size presets (reference `dinov2.py:367-427,430-448`).
# 'vitt' is ours: a tiny preset for tests / multi-chip dry runs.
VIT_PRESETS = {
    "vitt": dict(embed_dim=64, depth=4, num_heads=2, ffn="mlp"),
    # 'vitp' is ours too: the structured-weight quality-proxy preset
    # (scripts/train_proxy.py) — 12 layers so ToMe merge points between
    # taps exist (vitt's 4 layers are ALL taps), narrow enough that the
    # trained checkpoint stays a few MB in-repo.
    "vitp": dict(embed_dim=128, depth=12, num_heads=2, ffn="mlp"),
    "vits": dict(embed_dim=384, depth=12, num_heads=6, ffn="mlp"),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12, ffn="mlp"),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16, ffn="mlp"),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24, ffn="swiglufused"),
}

# DPT tap depths per encoder (reference `dpt.py:213-218`).
INTERMEDIATE_LAYER_IDX = {
    "vitt": (0, 1, 2, 3),
    "vitp": (2, 5, 8, 11),
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
    "vitg": (9, 19, 29, 39),
}


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    ffn: str = "mlp"
    mlp_ratio: float = 4.0
    patch_size: int = 14
    img_size: int = 518
    init_values: float | None = 1.0
    interpolate_offset: float = 0.1
    guide_type: str = "none"

    @classmethod
    def preset(cls, name: str, guide_type: str = "none") -> "ViTConfig":
        return cls(**VIT_PRESETS[name], guide_type=guide_type)

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def guide_channels(self) -> int:
        return GUIDE_CHANNELS[self.guide_type]


# ---------------------------------------------------------------------- init

def _patch_embed_init(key, cfg: ViTConfig, in_chans: int, *, zero: bool = False):
    p, d = cfg.patch_size, cfg.embed_dim
    if zero:
        w = jnp.zeros((p, p, in_chans, d), jnp.float32)
    else:
        fan = p * p * in_chans
        w = jax.random.normal(key, (p, p, in_chans, d)) * math.sqrt(1.0 / fan)
    return {"proj": {"w": w.astype(jnp.float32), "b": jnp.zeros((d,), jnp.float32)}}


def init_dinov2(key, cfg: ViTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 4)
    blocks = [
        vit_block_init(keys[i], cfg.embed_dim, mlp_ratio=cfg.mlp_ratio,
                       ffn=cfg.ffn, init_values=cfg.init_values)
        for i in range(cfg.depth)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "patch_embed": _patch_embed_init(keys[-1], cfg, 3),
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), jnp.float32),
        "pos_embed": (jax.random.truncated_normal(
            keys[-2], -2.0, 2.0, (1, cfg.num_patches + 1, cfg.embed_dim)) *
            0.02).astype(jnp.float32),
        "mask_token": jnp.zeros((1, cfg.embed_dim), jnp.float32),
        "blocks": stacked,
        "norm": layer_norm_init(cfg.embed_dim),
    }
    if cfg.guide_channels:
        # Zero init so guidance starts as a no-op (reference `dav2.py:54-61`).
        params["patch_embed_guidance"] = _patch_embed_init(
            keys[-3], cfg, cfg.guide_channels, zero=True)
    return params


# --------------------------------------------------------------------- apply

def patch_embed(p: dict, x: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, h*w, D] via space-to-depth + matmul."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    wmat = p["proj"]["w"].reshape(-1, p["proj"]["w"].shape[-1]).astype(x.dtype)
    return jnp.dot(x, wmat, precision=dot_precision(x.dtype)) + \
        p["proj"]["b"].astype(x.dtype)


def interpolate_pos_embed(pos_embed: jax.Array, gh: int, gw: int, *,
                          offset: float = 0.1) -> jax.Array:
    """Resample the checkpoint's pos-embed grid to (gh, gw).

    Matches reference `dinov2.py:199-230`: bicubic, antialias off,
    scale_factor=(g + offset)/sqrt(N) — NOT target-size semantics.
    """
    n = pos_embed.shape[1] - 1
    g0 = int(round(math.sqrt(n)))
    if gh == g0 and gw == g0:
        return pos_embed
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    grid = patch_pe.reshape(1, g0, g0, dim)
    sqrt_n = math.sqrt(n)
    # reference axis order: scale_factor=(sx, sy) with sx from `w` (rows here)
    sx, sy = (gh + offset) / sqrt_n, (gw + offset) / sqrt_n
    out = resize2d(grid.astype(jnp.float32), scale_factor=(sx, sy),
                   method="bicubic", align_corners=False)
    assert out.shape[1] == gh and out.shape[2] == gw, (out.shape, gh, gw)
    out = out.reshape(1, gh * gw, dim)
    return jnp.concatenate([cls_pe, out], axis=1).astype(pos_embed.dtype)


def prepare_tokens(params: dict, cfg: ViTConfig, x: jax.Array,
                   guide: jax.Array | None) -> jax.Array:
    b, h, w, _ = x.shape
    tokens = patch_embed(params["patch_embed"], x, cfg.patch_size)
    if cfg.guide_channels:
        if guide is None:
            raise ValueError(f"guide_type={cfg.guide_type!r} requires a guide input")
        tokens = tokens + patch_embed(params["patch_embed_guidance"], guide,
                                      cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pe = interpolate_pos_embed(params["pos_embed"], h // cfg.patch_size,
                               w // cfg.patch_size, offset=cfg.interpolate_offset)
    return tokens + pe.astype(tokens.dtype)


def _run_blocks(stacked: dict, x: jax.Array, taps: Sequence[int], cfg: ViTConfig,
                *, attn_impl: str | None, remat,
                kv_len: int | None = None,
                act_sharding=None) -> list[jax.Array]:
    """Scan the trunk in segments that end at each tap depth.

    `remat`: False | True (full per-block recompute, the memory floor) |
    "attn" (recompute everything EXCEPT the attention kernel's out/LSE —
    ~24 MB/layer extra at 518 px b8, but backward replays only the cheap
    qkv projection instead of re-running the Pallas forward).

    `act_sharding` (NamedSharding for the [B, N, D] token stream, e.g.
    P('data', 'model', None)): sequence parallelism — the residual/LN
    segments between matmuls live token-sharded over the tensor axis;
    GSPMD turns the Megatron all-reduces into all-gather + reduce-scatter
    pairs around the attention/FFN matmuls, cutting activation memory by
    the tp degree in the non-matmul segments (the reference's trainer has
    no equivalent; DDP replicates everything)."""
    def block_fn(x, p):
        if act_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, act_sharding)
        return vit_block(p, x, num_heads=cfg.num_heads, ffn=cfg.ffn,
                         attn_impl=attn_impl, kv_len=kv_len), None

    if remat == "attn":
        block_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"))
    elif remat:
        block_fn = jax.checkpoint(block_fn)

    taps = sorted(taps)
    outs = []
    start = 0
    for t in taps:
        end = t + 1
        seg = jax.tree.map(lambda a: a[start:end], stacked)
        x, _ = jax.lax.scan(block_fn, x, seg)
        outs.append(x)
        start = end
    return outs


def dinov2_intermediate_layers(
    params: dict,
    cfg: ViTConfig,
    x: jax.Array,
    guide: jax.Array | None = None,
    taps: Sequence[int] | None = None,
    *,
    attn_impl: str | None = None,
    remat: bool = False,
    act_sharding=None,
    pipeline_mesh=None,
    pipeline_microbatches: int = 4,
    token_merge: tuple[int, int] | None = None,
) -> list[tuple[jax.Array, jax.Array]]:
    """Forward returning [(patch_tokens [B,N,D], cls [B,D])] per tap, final-
    layernormed (reference `get_intermediate_layers(..., norm=True,
    return_class_token=True)`, dinov2.py:324-349).

    `pipeline_mesh`: a Mesh with a 'pipe' axis — the trunk runs as a
    GPipe pipeline over its stages (parallel/pipeline.py) with the DPT
    taps collected across stages; batch must divide
    `pipeline_microbatches`. Mutually exclusive with `act_sharding`.

    `token_merge=(after_layer, r)`: ToMe-style opt-in serving mode
    (ops/token_merge.py) — after block `after_layer`, merge the r
    best-matched tokens (bipartite cosine matching, cls protected) and
    run the remaining blocks on the reduced stream; later DPT taps are
    un-merged back to the full grid. QUALITY UNVALIDATED against real
    checkpoints (ROADMAP); taps at or before `after_layer` are
    bit-identical to the unmerged forward."""
    if taps is None:
        taps = (cfg.depth - 1,)
    tokens = prepare_tokens(params, cfg, x, guide)
    # Model-level sequence padding: pad the token stream ONCE to the
    # attention kernels' native length and tell them the true length —
    # every per-layer pad/slice HBM round-trip disappears (measured ~12%
    # of attention wall time at 5330 tokens / 1022 px). Padded rows carry
    # garbage activations; attention masks them as keys, and they are
    # sliced off below before the head, so no real token is affected.
    n_true = tokens.shape[1]
    impl = attn_impl or default_attn_impl()
    kv_len = None
    if impl.startswith("pallas"):
        n_pad = pad_seq_len(n_true)
        if n_pad != n_true:
            tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n_true), (0, 0)))
            kv_len = n_true
    if pipeline_mesh is not None:
        if act_sharding is not None:
            raise ValueError(
                "pipeline_mesh and act_sharding are mutually exclusive")
        if token_merge is not None:
            raise ValueError(
                "pipeline_mesh and token_merge are mutually exclusive")
        from ..parallel.pipeline import pipeline_vit_blocks

        def block_fn(p, t):
            return vit_block(p, t, num_heads=cfg.num_heads, ffn=cfg.ffn,
                             attn_impl=impl, kv_len=kv_len)

        if remat == "attn":
            block_fn = jax.checkpoint(
                block_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse"))
        elif remat:
            block_fn = jax.checkpoint(block_fn)

        _, raw = pipeline_vit_blocks(
            params["blocks"], tokens, block_fn, mesh=pipeline_mesh,
            n_microbatches=pipeline_microbatches, taps=tuple(sorted(taps)))
    elif token_merge is not None:
        from ..ops.token_merge import tome_merge, tome_unmerge

        merge_after, r = token_merge
        taps = sorted(taps)
        pre_taps = [t for t in taps if t <= merge_after]
        post_taps = [t for t in taps if t > merge_after]
        seg_taps = sorted(set(pre_taps + [merge_after]))
        pre_raw = _run_blocks(params["blocks"], tokens, seg_taps, cfg,
                              attn_impl=impl, remat=remat, kv_len=kv_len,
                              act_sharding=act_sharding)
        at_merge = pre_raw[seg_taps.index(merge_after)]
        # merge on TRUE tokens only (padded rows carry garbage), then
        # re-pad the reduced stream for the kernels
        merged, unmerge_idx = tome_merge(at_merge[:, :n_true], r)
        m_true = n_true - r
        m_kv = None
        if kv_len is not None or (impl.startswith("pallas")
                                  and pad_seq_len(m_true) != m_true):
            m_pad = pad_seq_len(m_true)
            merged = jnp.pad(merged, ((0, 0), (0, m_pad - m_true), (0, 0)))
            m_kv = m_true
        rest = jax.tree.map(lambda a: a[merge_after + 1:], params["blocks"])
        post_raw = _run_blocks(rest, merged,
                               [t - merge_after - 1 for t in post_taps],
                               cfg, attn_impl=impl, remat=remat,
                               kv_len=m_kv, act_sharding=act_sharding)
        raw = [pre_raw[seg_taps.index(t)] for t in pre_taps] + [
            tome_unmerge(rt[:, :m_true], unmerge_idx) for rt in post_raw]
    else:
        raw = _run_blocks(params["blocks"], tokens, taps, cfg,
                          attn_impl=impl, remat=remat, kv_len=kv_len,
                          act_sharding=act_sharding)
    out = []
    for r in raw:
        n = layer_norm(params["norm"], r[:, :n_true])
        out.append((n[:, 1:], n[:, 0]))
    return out
