"""Fused matmul + LayerScale + residual Pallas kernel (serving epilogue).

The exact-path roofline analysis (docs/ROADMAP.md) attributes ~320 ms of
the 1022 px pipeline to inter-matmul elementwise passes; the largest
single candidates are the per-block `x + gamma * (o @ W_proj + b)` and
`x + gamma * (h @ W_fc2 + b)` epilogues (reference block structure:
``dinov2_layers/block.py`` attn-residual + LayerScale). XLA on TPU emits
the dot and MAY fuse the elementwise tail; this kernel forces the fusion
— the [block_m, N] output tile gets gamma/bias/residual applied while
still resident in VMEM, saving one full HBM write+read of the matmul
output per block when XLA hasn't already fused it.

BENCHMARK-ONLY: the single-session A/B
(`benchmarks/fused_epilogue_ab.py`, verdict in docs/ROADMAP.md) showed
XLA already fuses the epilogue chain across block boundaries and beats
this kernel IN SITU (pallas 5.45 vs xla 5.20 ms on the 4-block chain),
so the kernel is intentionally NOT wired into any serving path — it
exists as the documented negative that closes the roofline argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only where TPU support is built
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["matmul_scale_residual", "matmul_scale_residual_reference"]


def matmul_scale_residual_reference(x, w, b, gamma, resid,
                                    precision=None):
    """resid + gamma * (x @ w + b) — the XLA baseline (and the exact
    semantics the kernel must reproduce)."""
    y = jnp.dot(x, w.astype(x.dtype), precision=precision)
    y = y + b.astype(x.dtype)
    return resid + gamma.astype(x.dtype) * y


def _kernel(x_ref, w_ref, b_ref, g_ref, r_ref, o_ref):
    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    out = (r_ref[...].astype(jnp.float32)
           + g_ref[...].astype(jnp.float32) * acc)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def matmul_scale_residual(x, w, b, gamma, resid, *, block_m: int = 256,
                          interpret: bool = False):
    """x: [M, K]; w: [K, N]; b,gamma: [N]; resid: [M, N] -> [M, N].

    Grid walks M blocks with W fully VMEM-resident (trunk proj/fc2
    weights are <=9.4 MB bf16 at vitg width 1536). f32 accumulation,
    output in x.dtype — matches the bf16-serving XLA path's
    DEFAULT-precision dot."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2 and resid.shape == (m, n)
    if m % block_m:
        raise ValueError(f"M={m} not divisible by block_m={block_m}")
    b2 = b.reshape(1, n)
    g2 = gamma.reshape(1, n)
    grid = (m // block_m,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w, b2, g2, resid)
