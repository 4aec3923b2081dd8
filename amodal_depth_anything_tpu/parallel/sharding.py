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


def param_sharding(mesh: Mesh, params, *, tensor_parallel: bool | None = None):
    """NamedSharding pytree for a param tree; TP rules apply iff the mesh's
    model axis is >1 (or explicitly requested)."""
    tp = (mesh.shape["model"] > 1) if tensor_parallel is None else tensor_parallel

    def rule(path, leaf):
        if tp:
            ps = _path_str(path)
            for frag, spec in _TP_RULES:
                if frag in ps:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

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
