"""Train state & optimizer assembly.

Reference training recipe (`discriminative_trainer.py:72-81`,
`config/train_discriminative_vitl.yaml:35,45-61`): Adam, IterExponential
LR (warmup 100, decay to 1% over 50k), global-norm grad clip 0.01.
Here that's one optax chain; the state is a plain pytree (params,
opt_state, step) so it jits/shards/checkpoints trivially.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..utils.lr_schedule import iter_exponential

__all__ = ["TrainState", "make_optimizer", "create_train_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def make_optimizer(*, lr: float, total_iter: int, final_ratio: float = 0.01,
                   warmup_steps: int = 100, max_grad_norm: float = 0.01,
                   accumulation_steps: int = 1) -> optax.GradientTransformation:
    schedule = iter_exponential(lr, total_iter, final_ratio, warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(schedule),
    )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def _shard_opt_state(opt_state, params, mesh):
    """Place optimizer-state leaves on the shardings the train step will
    output: subtrees that mirror the params tree (adam mu/nu) take each
    param's sharding; everything else replicates over the mesh. Without
    this the first train step has a different jit signature than the
    second and the big graph compiles twice."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    p_struct = jax.tree_util.tree_structure(params)

    def walk(node):
        if jax.tree_util.tree_structure(node) == p_struct:
            return jax.tree.map(
                lambda l, p: jax.device_put(l, p.sharding), node, params)
        if isinstance(node, tuple):
            mapped = [walk(x) for x in node]
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else tuple(mapped)
        if isinstance(node, list):
            return [walk(x) for x in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "dtype"):
            return jax.device_put(node, rep)
        return node

    return walk(opt_state)


def create_train_state(params, tx: optax.GradientTransformation,
                       mesh=None) -> TrainState:
    opt_state = tx.init(params)
    step = jnp.zeros((), jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        opt_state = _shard_opt_state(opt_state, params, mesh)
        step = jax.device_put(step, NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)
