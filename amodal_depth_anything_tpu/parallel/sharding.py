"""Sharding rules: parameter and batch NamedShardings over the mesh.

Data parallelism: batches shard on axis 0 over ``data``; parameters
replicate. Tensor parallelism (``model`` axis > 1) shards the ViT trunk
Megatron-style by matching parameter-tree paths:

  * attention qkv kernel  [L, D, 3D]   -> shard output dim (heads)
  * attention proj kernel [L, D, D]    -> shard input dim (row-parallel)
  * mlp fc1 / w12 kernel  [L, D, H]    -> shard hidden (column-parallel)
  * mlp fc2 / w3 kernel   [L, H, D]    -> shard hidden (row-parallel)

XLA then emits exactly the two all-reduces per block Megatron needs, over
ICI. Everything else (embeddings, norms, conv decoder) replicates — the
DPT decoder is batch-bound, not weight-bound.

FSDP (``fsdp=True``): ZeRO-3-style sharding of parameters + optimizer
state over the ``data`` axis, composing with the TP rules; see
`_fsdp_extend`. The reference has no equivalent (DDP only — every rank
holds a full replica + full Adam moments).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, spec) — first match wins. Paths look like
# "backbone.blocks.attn.qkv.w" etc. (dots from jax.tree_util.keystr).
_TP_RULES: tuple[tuple[str, P], ...] = (
    ("blocks.attn.qkv.w", P(None, None, "model")),
    ("blocks.attn.qkv.b", P(None, "model")),
    ("blocks.attn.proj.w", P(None, "model", None)),
    ("blocks.mlp.fc1.w", P(None, None, "model")),
    ("blocks.mlp.fc1.b", P(None, "model")),
    ("blocks.mlp.fc2.w", P(None, "model", None)),
    ("blocks.mlp.w12.w", P(None, None, "model")),
    ("blocks.mlp.w12.b", P(None, "model")),
    ("blocks.mlp.w3.w", P(None, "model", None)),
)


def _path_str(path) -> str:
    return jax.tree_util.keystr(path).replace("'", "").replace("][", ".") \
        .strip("[]")


# Leaves smaller than this replicate even under FSDP: gathering a few-KB
# norm scale costs more in collective latency than the memory it saves.
FSDP_MIN_ELEMENTS = 2 ** 16


def _fsdp_extend(spec: P, leaf, path_s: str, data_size: int) -> P:
    """Add 'data' sharding to `spec` on the largest free, divisible axis.

    ZeRO-3 equivalent: parameters (and, because the trainers place
    optimizer state on the param shardings, the optimizer moments too)
    live sharded over the data axis; XLA's SPMD partitioner inserts the
    per-use all-gather and the reduce-scatter on the gradients — the
    collectives DeepSpeed/FSDP hand-schedule (reference trains DDP-only,
    every rank holding a full replica: train.py:38-40).

    Axis 0 of scan-stacked block params ([L, ...]) is never sharded: lax.scan
    slices layer-by-layer along it, and sharding L would serialize a gather
    per layer step."""
    if leaf.size < FSDP_MIN_ELEMENTS or data_size <= 1:
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    # exact path segment 'blocks' = the scan-stacked trunk ([L, ...]);
    # substring matching would also catch the UNet's input_blocks /
    # transformer_blocks dicts, which are NOT stacked and may legitimately
    # shard axis 0
    stacked = "blocks" in path_s.split(".") and leaf.ndim >= 2
    start = 1 if stacked else 0
    candidates = [i for i in range(start, leaf.ndim)
                  if entries[i] is None and leaf.shape[i] % data_size == 0]
    if not candidates:
        return spec
    axis = max(candidates, key=lambda i: leaf.shape[i])
    entries[axis] = "data"
    return P(*entries)


def param_sharding(mesh: Mesh, params, *, tensor_parallel: bool | None = None,
                   fsdp: bool = False):
    """NamedSharding pytree for a param tree.

    TP rules apply iff the mesh's model axis is >1 (or explicitly
    requested). `fsdp=True` additionally shards every large-enough leaf
    over the 'data' axis (ZeRO-3 style), composing with TP: a qkv kernel
    [L, D, 3D] on a 4x2 mesh becomes P(None, 'data', 'model')."""
    tp = (mesh.shape["model"] > 1) if tensor_parallel is None else tensor_parallel
    data_size = mesh.shape["data"]

    def rule(path, leaf):
        ps = _path_str(path)
        spec = P()
        if tp:
            for frag, tp_spec in _TP_RULES:
                if frag in ps:
                    spec = tp_spec
                    break
        if fsdp:
            spec = _fsdp_extend(spec, leaf, ps, data_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_sharding(mesh: Mesh):
    """Shard axis 0 (batch) across the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params, **kw):
    return jax.device_put(params, param_sharding(mesh, params, **kw))


def shard_batch(mesh: Mesh, batch):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
