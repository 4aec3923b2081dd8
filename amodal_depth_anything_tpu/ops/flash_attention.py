"""Pallas TPU attention kernels for the ViT / UNet hot path.

TPU-native replacement for the CUDA attention the reference leans on
(xformers `memory_efficient_attention`, reference
``depth_anything_v2/dinov2_layers/attention.py:65-81`` and
``depthfm/unet/attention.py:184``).

Design notes (why this is NOT a generic flash-attention port):
  * The workloads here are short fixed sequences — 1370 tokens at 518 px
    (37^2 patches + cls), 5477 at 1022 px, and 1024-4096 for the LDM UNet
    latents. K/V for one (batch, head) slice is at most ~1.4 MB, so the whole
    K/V block fits comfortably in VMEM. We therefore use a *blocked-query,
    resident-KV* schedule: the grid walks (batch*heads, q-blocks), each
    program computes full softmax rows in one shot in f32 with the MXU doing
    both dots. No online-softmax state machine is needed at these lengths,
    which removes its bookkeeping overhead.
  * Sequence lengths are padded to the 128-lane boundary; padded key columns
    are masked with -inf before the softmax (static mask, folded by Mosaic).
    Padding the head dim 64->128 measured FASTER than unpadded tiles.
  * f32 softmax throughout; bf16 operands take single-pass bf16 matmuls with
    f32 accumulation (the xformers-bf16 training equivalent), f32 operands
    force true-f32 MXU passes for parity testing.
  * Backward: two Pallas kernels sharing the forward's log-sum-exp — a
    blocked-query dq kernel (resident K/V) and a blocked-key dk/dv kernel
    (resident Q/dO). Nothing of size N x N ever touches HBM. Interpret mode
    falls back to an XLA recompute VJP.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

try:  # pltpu is only importable where TPU support is built
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["mha", "mha_reference", "pad_seq_len"]

NEG_INF = -1e30  # avoid inf-inf NaNs on padded rows
# exp lowers to exp2(x * log2e); folding log2e into the QK scale removes
# one full VPU multiply pass over the [block, N] score tile per program
# (the softmax VPU time is the kernel's non-MXU residual).
LOG2E = 1.4426950408889634


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _d_pad(d: int) -> int:
    # multiples of 64 are handled natively by Mosaic at full dot speed
    # (measured: d=64 tiles == d-padded-to-128 tiles); odd head dims get
    # lane-padded. Keeping d native avoids one HBM round-trip per operand.
    return d if d % 64 == 0 else _round_up(d, 128)


def pad_seq_len(n: int) -> int:
    """Sequence length the kernels run at for a true length `n` — callers
    that pad their token stream once (model-level padding) to this length
    and pass `kv_len=n` skip all per-layer pad/slice HBM round-trips
    (~12% of attention wall time at 5330 tokens). 128-granular so the
    row overhead in the surrounding matmuls stays small (1370 -> 1408,
    not 1536); the kernels drop to block 128 when 256 doesn't divide."""
    return _round_up(n, 128)


def _vmem_fit_block(block: int, tile_bytes_per_row: int,
                    resident: int) -> int:
    """Scoped-vmem guard for the backward kernels (16 MB/core on v5e).

    The bwd kernels hold one full sequence stream resident plus
    [block, N] f32 score tiles; at d_pad=128 with N>=4096 (the SD UNet's
    64x64 self-attention under training, [B*H, 4096, 128] bf16) block
    256 allocates 17.5 MB on stack and Mosaic rejects the kernel
    ("exceeded scoped vmem limit", hit by the DepthFM train-step bench).
    Estimate the dominant terms (pessimistic — Mosaic reuses tile
    buffers, so the real peak is ~0.7x this) against a 13 MB budget and
    halve the block until it fits (floor 128 = one MXU tile row). The
    vitl/vitg trunk training shapes estimate ~6-8 MB and keep block 256,
    so the measured training configs are unchanged."""
    budget = 13 * 1024 * 1024
    while block > 128 and resident + block * tile_bytes_per_row > budget:
        block //= 2
    return block


def _precision_for(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dot(a, b, dims, precision):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _maybe_lo(x, ref_dtype):
    return x.astype(jnp.bfloat16) if ref_dtype == jnp.bfloat16 else x


# ------------------------------------------------------------------ forward

def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *lse_rest, sm_scale: float,
                     kv_len: int, precision, q_split: int = 1):
    # q_ref: [block_q, D]; k_ref/v_ref: [Nk_pad, D]; o_ref: [block_q, D];
    # lse_rest: optional ([block_q, 128] lane-padded lse ref; column 0
    # meaningful) — only materialized when the backward pass needs it
    # (writing it costs ~15% of the forward at 5330 tokens).
    #
    # q_split > 1: split the query block into q_split independent row
    # chunks and interleave their compute so chunk i's VPU softmax has no
    # data dependence on chunk i+1's QK^T MXU pass (and the PV pass of
    # chunk i is independent of chunk i+1's softmax) — the scheduler may
    # overlap the two units, hiding the softmax VPU residual (~3 ms of a
    # 24.7 ms call at the vitg 5376-token shape). Row-exact: each query
    # row's math (accumulation order included) is identical to q_split=1.
    q = q_ref[...].astype(jnp.float32) * (sm_scale * LOG2E)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...] if v_ref.dtype == jnp.bfloat16 else \
        v_ref[...].astype(jnp.float32)
    nk_pad = k_ref.shape[0]
    block_q = q_ref.shape[0]
    rows = block_q // q_split

    def _softmax_rows(s):
        if kv_len < nk_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)  # == exp(s_nat - m_nat); denom unchanged
        denom = jnp.sum(p, axis=-1, keepdims=True)
        return m, p, denom

    # issue every chunk's QK^T first, then consume in order: chunk i's
    # softmax/PV only depends on s[i], so the MXU can run ahead on
    # s[i+1] / o[i] while the VPU reduces chunk i.
    s_chunks = [_dot(q[i * rows:(i + 1) * rows], k, ((1,), (1,)), precision)
                for i in range(q_split)]
    for i, s in enumerate(s_chunks):
        m, p, denom = _softmax_rows(s)
        if lse_rest:
            (lse_ref,) = lse_rest
            # natural-log lse for the backward kernels: m is in log2 units
            lse = m * (1.0 / LOG2E) + jnp.log(denom)
            lse_ref[i * rows:(i + 1) * rows] = jnp.broadcast_to(
                lse, (rows, lse_ref.shape[1])).astype(jnp.float32)
        o = _dot(_maybe_lo(p, v_ref.dtype), v, ((1,), (0,)), precision)
        o_ref[i * rows:(i + 1) * rows] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "interpret", "need_lse",
                                             "kv_len", "q_split"))
def _mha_fwd_pallas(q, k, v, *, sm_scale: float, block_q: int,
                    interpret: bool, need_lse: bool = True,
                    kv_len: int | None = None, q_split: int = 1):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    kv_len = nk if kv_len is None else kv_len
    if q_split < 1 or block_q % (q_split * 128):
        q_split = 1  # chunks must stay MXU-tile aligned; <1 means "off"
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, 128)
    d_pad = _d_pad(d)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, d_pad - d)))
    qp = qp.reshape(b * h, nq_pad, d_pad)
    kp = kp.reshape(b * h, nk_pad, d_pad)
    vp = vp.reshape(b * h, nk_pad, d_pad)

    precision = _precision_for(q.dtype)
    grid = (b * h, nq_pad // block_q)
    o_spec = pl.BlockSpec((None, block_q, d_pad), lambda g, i: (g, i, 0))
    o_shape = jax.ShapeDtypeStruct((b * h, nq_pad, d_pad), q.dtype)
    lse_spec = pl.BlockSpec((None, block_q, 128), lambda g, i: (g, i, 0))
    lse_shape = jax.ShapeDtypeStruct((b * h, nq_pad, 128), jnp.float32)
    res = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          precision=precision, q_split=q_split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda g, i: (g, i, 0)),
            pl.BlockSpec((None, nk_pad, d_pad), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((None, nk_pad, d_pad), lambda g, i: (g, 0, 0)),
        ],
        out_specs=(o_spec, lse_spec) if need_lse else o_spec,
        out_shape=(o_shape, lse_shape) if need_lse else o_shape,
        interpret=interpret,
    )(qp, kp, vp)
    out, lse = res if need_lse else (res, None)
    out = out.reshape(b, h, nq_pad, d_pad)[:, :, :nq, :d]
    if need_lse:
        lse = lse[:, :, 0].reshape(b, h, nq_pad)[:, :, :nq]
    return out, lse


# ----------------------------------------------------------------- backward

def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
                        *, sm_scale: float, kv_len: int, precision):
    # blocked over q: q/do/lse/dd blocks, K/V resident
    q = q_ref[...].astype(jnp.float32) * (sm_scale * LOG2E)
    k = k_ref[...].astype(jnp.float32)
    s = _dot(q, k, ((1,), (1,)), precision)  # [bq, Nk_pad], log2 domain
    nk_pad = k_ref.shape[0]
    if kv_len < nk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[:, 0:1] * LOG2E)
    do = do_ref[...]
    dp = _dot(do.astype(jnp.float32) if do.dtype != jnp.bfloat16 else do,
              v_ref[...], ((1,), (1,)), precision)  # [bq, Nk_pad]
    ds = p * (dp - dd_ref[:, 0:1])
    ds = _maybe_lo(ds, q_ref.dtype)
    dq = _dot(ds, k_ref[...], ((1,), (0,)), precision) * sm_scale
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                         dk_ref, dv_ref, *, sm_scale: float, q_len: int,
                         kv_len: int, block_k: int, precision):
    # blocked over k: k/v blocks, Q/dO/lse/dd resident
    k = k_ref[...].astype(jnp.float32)
    q = q_ref[...].astype(jnp.float32) * (sm_scale * LOG2E)
    st = _dot(k, q, ((1,), (1,)), precision)  # [bk, Nq_pad], log2 domain
    nq_pad = q_ref.shape[0]
    lse_row = lse_ref[:, 0] * LOG2E  # [Nq_pad], to log2 units
    pt = jnp.exp2(st - lse_row[None, :])
    if q_len < nq_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, pt.shape, dimension=1)
        pt = jnp.where(col < q_len, pt, 0.0)
    do = do_ref[...]
    pt_lo = _maybe_lo(pt, q_ref.dtype)
    dv = _dot(pt_lo, do, ((1,), (0,)), precision)  # [bk, D]
    dpt = _dot(v_ref[...], do, ((1,), (1,)), precision)  # [bk, Nq_pad]
    dst = pt * (dpt - dd_ref[:, 0][None, :])
    dst = _maybe_lo(dst, q_ref.dtype)
    dk = _dot(dst, q_ref[...], ((1,), (0,)), precision) * sm_scale
    # zero grads for padded key rows: with model-level pre-padded inputs
    # there is no output slice to drop them, and garbage dk/dv rows would
    # corrupt the qkv-projection weight grads.
    kv0 = pl.program_id(1) * block_k
    row = kv0 + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), dimension=0)
    keep = (row < kv_len).astype(dk.dtype)
    dk_ref[...] = (dk * keep).astype(dk_ref.dtype)
    dv_ref[...] = (dv * keep).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "interpret", "kv_len"))
def _mha_bwd_pallas(q, k, v, out, lse, g, *, sm_scale: float, block_q: int,
                    interpret: bool, kv_len: int | None = None):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    kv_len = nk if kv_len is None else kv_len
    # model-padded self-attention: q rows beyond kv_len are padding too
    q_len = kv_len if nq == nk else nq
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, 128)
    d_pad = _d_pad(d)

    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    its = 2 if q.dtype == jnp.bfloat16 else 4
    # dq: resident K/V (+ one f32 cast copy) vs [block_q, nk_pad] tiles
    dq_resident = 2 * nk_pad * d_pad * its + nk_pad * d_pad * 4
    block_q = _vmem_fit_block(block_q, nk_pad * (3 * 4 + its), dq_resident)
    nq_pad = _round_up(nq, block_q)

    def pad3(t, n_pad):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n_pad - t.shape[2]),
                           (0, d_pad - d))).reshape(b * h, n_pad, d_pad)

    qp, dop = pad3(q, nq_pad), pad3(g, nq_pad)
    kp, vp = pad3(k, nk_pad), pad3(v, nk_pad)
    # lane-pad the per-row stats to [*, 128]; pad rows get lse=+big so p=0
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, nq_pad - nq)),
                    constant_values=1e30)
    lse_p = jnp.broadcast_to(lse_p.reshape(b * h, nq_pad, 1),
                             (b * h, nq_pad, 128))
    dd_p = jnp.pad(dd, ((0, 0), (0, 0), (0, nq_pad - nq)))
    dd_p = jnp.broadcast_to(dd_p.reshape(b * h, nq_pad, 1),
                            (b * h, nq_pad, 128))

    precision = _precision_for(q.dtype)

    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, sm_scale=sm_scale,
                          kv_len=kv_len, precision=precision),
        grid=(b * h, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, nk_pad, d_pad), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((None, nk_pad, d_pad), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((None, block_q, d_pad), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, block_q, 128), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, block_q, 128), lambda g_, i: (g_, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad),
                               lambda g_, i: (g_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, dd_p)

    block_k = min(256, nk_pad)
    if nk_pad % block_k:
        block_k = 128  # pre-aligned 128-granular inputs: never re-pad
    # dkv: resident Q/dO/lse/dd (+ f32 cast of Q) vs [block_k, nq_pad] tiles
    dkv_resident = (2 * nq_pad * d_pad * its + 2 * nq_pad * 128 * 4
                    + nq_pad * d_pad * 4)
    block_k = _vmem_fit_block(block_k, nq_pad * (3 * 4 + 2 * its),
                              dkv_resident)
    nk_pad2 = _round_up(nk_pad, block_k)
    if nk_pad2 != nk_pad:
        kp = jnp.pad(kp, ((0, 0), (0, nk_pad2 - nk_pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, nk_pad2 - nk_pad), (0, 0)))
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, sm_scale=sm_scale,
                          q_len=q_len, kv_len=kv_len, block_k=block_k,
                          precision=precision),
        grid=(b * h, nk_pad2 // block_k),
        in_specs=[
            pl.BlockSpec((None, nq_pad, d_pad), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((None, block_k, d_pad), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, block_k, d_pad), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, nq_pad, d_pad), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((None, nq_pad, 128), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((None, nq_pad, 128), lambda g_, i: (g_, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, block_k, d_pad), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((None, block_k, d_pad), lambda g_, i: (g_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nk_pad2, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, nk_pad2, d_pad), v.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, dd_p)

    dq = dq.reshape(b, h, nq_pad, d_pad)[:, :, :nq, :d]
    dk = dk.reshape(b, h, nk_pad2, d_pad)[:, :, :nk, :d]
    dv = dv.reshape(b, h, nk_pad2, d_pad)[:, :, :nk, :d]
    return dq, dk, dv


def mha_reference(q, k, v, *, sm_scale: float | None = None,
                  kv_len: int | None = None):
    """Plain-XLA attention; q,k,v: [B, H, N, D]. f32 softmax accumulation."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        (q * sm_scale).astype(jnp.float32),
        k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if kv_len is not None and kv_len < k.shape[2]:
        col = jnp.arange(k.shape[2])
        s = jnp.where(col[None, None, None, :] < kv_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return o.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _mha(q, k, v, sm_scale, block_q, interpret, kv_len, q_split):
    # primal (inference) path: skip the LSE output — only backward needs it
    out, _ = _mha_fwd_pallas(q, k, v, sm_scale=sm_scale, block_q=block_q,
                             interpret=interpret, need_lse=False,
                             kv_len=kv_len, q_split=q_split)
    return out


def _mha_fwd(q, k, v, sm_scale, block_q, interpret, kv_len, q_split):
    out, lse = _mha_fwd_pallas(q, k, v, sm_scale=sm_scale, block_q=block_q,
                               interpret=interpret, kv_len=kv_len,
                               q_split=q_split)
    # Named for remat policies: `jax.checkpoint(block, policy=
    # save_only_these_names("attn_out", "attn_lse"))` keeps these two
    # residuals (~24 MB/layer at 518 px b8) so the backward replay
    # re-runs only the cheap qkv projection, not the attention kernel.
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, out, lse)


def _mha_bwd(sm_scale, block_q, interpret, kv_len, q_split, res, g):
    q, k, v, out, lse = res
    return _mha_bwd_pallas(q, k, v, out, lse, g, sm_scale=sm_scale,
                           block_q=block_q, interpret=interpret,
                           kv_len=kv_len)


_mha.defvjp(_mha_fwd, _mha_bwd)


def mha(q, k, v, *, sm_scale: float | None = None, block_q: int = 256,
        interpret: bool = False, kv_len: int | None = None,
        q_split: int | None = None):
    """Pallas multi-head attention. q: [B,H,Nq,D]; k,v: [B,H,Nk,D].

    `kv_len`: true token count when the sequences are pre-padded to
    `pad_seq_len(kv_len)` at the model level — keys (and, for
    self-attention, queries) beyond it are treated as padding: keys are
    masked out of the softmax and their dk/dv are zeroed. Padded query
    rows MUST carry zero cotangents (true whenever the caller discards
    them before the loss). Skips all per-layer pad/slice copies.

    `q_split`: intra-kernel query-chunk interleave factor (row-exact; see
    `_attn_fwd_kernel`). Default from AMODAL_ATTN_QSPLIT; the default is
    2 — promoted after a consistent back-to-back A/B win at both
    production shapes (vitl [8,16,5330,64] 15.32->14.94 ms, vitg
    [8,24,5330,64] 22.5->22.2 / 22.6->22.0; full exact bench 3.157
    img/s, runbook v6) — set 1 to disable. Silently reset to 1 when
    block_q is not a multiple of 128*q_split."""
    if q_split is None:
        q_split = int(os.environ.get("AMODAL_ATTN_QSPLIT", "2"))
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    # dtype-uniform operands: precision selection keys on q.dtype and the
    # PV dot's low-precision cast keys on v.dtype — a q=f32 / kv=bf16 mix
    # makes Mosaic reject the folded bf16 matmul at fp32 contract
    # precision ("Bad lhs type", verified on v5e)
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    nq = q.shape[2]
    block_q = min(block_q, _round_up(nq, 128))
    if nq % 128 == 0 and nq % block_q != 0:
        block_q = 128  # pre-aligned inputs: never re-pad internally
    return _mha(q, k, v, float(sm_scale), int(block_q), bool(interpret),
                None if kv_len is None else int(kv_len), int(q_split))
