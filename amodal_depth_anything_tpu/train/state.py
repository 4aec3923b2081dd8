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


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
