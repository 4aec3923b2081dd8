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
                   accumulation_steps: int = 1, optimizer: str = "adam",
                   mu_dtype: str | None = None) -> optax.GradientTransformation:
    """`optimizer` selects the update rule:

    - "adam" (default): the reference recipe. Optimizer state is 2x the
      params (f32 mu+nu) — 8.8 GB for vitg's 1.1B params, which is why a
      single-chip vitg train step cannot fit 16 GB HBM with Adam
      (measured: 23.2-24.5 GB needed at @518 for every remat/batch combo).
    - "adam-bf16mu": Adam with the first moment stored bf16 (optax
      mu_dtype) — saves 25% of optimizer state at negligible quality cost.
    - "adafactor": factored second moment, no first moment — optimizer
      state is ~O(rows+cols) per matrix instead of O(rows*cols). The
      standard memory-efficient choice for single-chip finetunes of
      models whose Adam state doesn't fit; multi-chip setups should
      prefer Adam + `TrainerConfig.fsdp` (ZeRO-3) instead.

    `mu_dtype` (e.g. "bfloat16") applies to adam's first moment.
    """
    schedule = iter_exponential(lr, total_iter, final_ratio, warmup_steps)
    if optimizer == "adam-bf16mu":
        optimizer, mu_dtype = "adam", "bfloat16"
    if optimizer == "adam":
        rule = optax.adam(schedule, mu_dtype=mu_dtype)
    elif optimizer == "adafactor":
        # clipping_threshold=None: the reference's global-norm clip (0.01)
        # is already in the chain; adafactor's own RMS clip would stack.
        rule = optax.adafactor(schedule, clipping_threshold=None,
                               min_dim_size_to_factor=128)
    else:
        raise ValueError(f"unknown optimizer: {optimizer!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        rule,
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
            # adafactor's factored moments mirror the params *structure*
            # but not shapes (v_row is [r] for a [r,c] param) — those
            # leaves can't take the param's sharding; replicate them.
            return jax.tree.map(
                lambda l, p: jax.device_put(
                    l, p.sharding if getattr(l, "shape", None) == p.shape
                    else rep),
                node, params)
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
