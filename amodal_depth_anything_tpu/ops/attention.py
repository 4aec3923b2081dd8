"""Multi-head self/cross attention dispatch.

Chooses between the Pallas TPU kernel (`ops.flash_attention.mha`) and the
plain-XLA reference implementation. On CPU (tests, interpret mode) the XLA
path is used automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_attention import mha, mha_reference

__all__ = ["multi_head_attention", "default_attn_impl"]


def default_attn_impl() -> str:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def multi_head_attention(q, k, v, *, impl: str | None = None):
    """Attention over [B, H, N, D] tensors; returns [B, H, Nq, D]."""
    impl = impl or default_attn_impl()
    if impl == "pallas":
        return mha(q, k, v)
    if impl == "pallas-interpret":
        return mha(q, k, v, interpret=True)
    if impl == "xla":
        return mha_reference(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")
