"""LR schedules as optax-compatible functions.

`iter_exponential`: linear warmup then exponential decay to final_ratio
at total_iter_length, constant after (reference
`src/util/lr_scheduler.py:6-31`; configured 50k/0.01/100 warmup in
`config/train_discriminative_vitl.yaml:54-61`).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["iter_exponential"]


def iter_exponential(base_lr: float, total_iter_length: int, final_ratio: float,
                     warmup_steps: int = 0):
    effective = max(total_iter_length - warmup_steps, 1)
    log_ratio = jnp.log(jnp.asarray(final_ratio, jnp.float32))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.exp((step - warmup_steps) / effective * log_ratio)
        alpha = jnp.where(step < warmup_steps, warm,
                          jnp.where(step >= total_iter_length,
                                    final_ratio, decay))
        return base_lr * alpha

    return schedule
