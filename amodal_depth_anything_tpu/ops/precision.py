"""Precision policy for MXU ops.

XLA's *default* dot/conv precision performs bf16-pass accumulation even for
f32 operands (observed ~7e-3 abs error on f32 convs with this build). For
weight-transplant parity we need true f32 when the activations are f32;
when the caller has opted into bf16 activations, default precision is the
fast path they asked for.

Rule: f32 operands -> Precision.HIGHEST; lower precisions -> DEFAULT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dot_precision"]


def dot_precision(dtype) -> jax.lax.Precision:
    if jnp.dtype(dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
