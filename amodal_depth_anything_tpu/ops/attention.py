"""Multi-head self/cross attention dispatch.

Chooses between the Pallas TPU kernel (`ops.flash_attention.mha`) and the
plain-XLA reference implementation. On CPU (tests, interpret mode) the XLA
path is used automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_attention import mha, mha_reference, pad_seq_len

__all__ = ["multi_head_attention", "default_attn_impl", "pad_seq_len"]


def default_attn_impl() -> str:
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def multi_head_attention(q, k, v, *, impl: str | None = None,
                         kv_len: int | None = None,
                         sm_scale: float | None = None):
    """Attention over [B, H, N, D] tensors; returns [B, H, Nq, D].

    `kv_len`: true length for model-level pre-padded sequences (see
    `flash_attention.mha`); keys beyond it are masked on every impl.
    `sm_scale`: softmax scale override (default 1/sqrt(D))."""
    defaulted = impl is None
    impl = impl or default_attn_impl()
    if defaulted and impl == "pallas" and k.shape[2] <= 128:
        # tiny-KV cross attention (e.g. 77 text tokens conditioning the
        # LDM UNet): scores are [N, <=128] — flash blocking buys nothing,
        # plain XLA fuses it better, and Mosaic chokes on some
        # (large-d_pad, tiny-kv) tilings. Only the DEFAULTED choice is
        # rerouted: an explicit impl="pallas" request always runs the
        # kernel so small-shape pallas-vs-xla parity tests exercise it.
        impl = "xla"
    if impl == "pallas":
        return mha(q, k, v, kv_len=kv_len, sm_scale=sm_scale)
    if impl == "pallas-interpret":
        return mha(q, k, v, interpret=True, kv_len=kv_len, sm_scale=sm_scale)
    if impl == "xla":
        return mha_reference(q, k, v, kv_len=kv_len, sm_scale=sm_scale)
    raise ValueError(f"unknown attention impl: {impl}")
