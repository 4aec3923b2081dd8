"""Pipeline parallelism for the ViT trunk: GPipe schedule over a 'pipe'
mesh axis, TPU-native (shard_map + lax.ppermute over ICI).

The reference has no pipeline concept (single-GPU model, DDP replication
— train.py:38-40). This module exists for deployments where one chip
can't hold the trunk (ViT-G at long sequence + optimizer state): the
scan-stacked block parameters [L, ...] are split into S contiguous
stages, each resident on one pipe rank, and microbatches stream through
the ring.

Design notes (why this shape):
  * The trunk is ALREADY a `lax.scan` over stacked per-layer params, so a
    stage is just the same scan over an [L/S, ...] slice — no per-layer
    Python unrolling, one compiled block body per stage.
  * The schedule is plain GPipe expressed as ONE `lax.scan` over
    T = M + S - 1 ticks. Every tick: run the local stage on the current
    activation, `ppermute` the result one hop around the ring. Rank 0
    injects microbatch t while t < M; rank S-1 banks its output at tick
    t >= S-1. Because the whole schedule is a differentiable scan (the
    transpose of ppermute is the reverse permute), `jax.grad` through
    this function IS pipelined backprop — no hand-written backward
    schedule, XLA emits the reverse ring automatically.
  * Taps (the DPT head needs 4 intermediate depths): each global tap
    depth lives on exactly one stage; that stage banks the activation
    after its local sub-layer, everyone else contributes zeros, and a
    single `psum` over the pipe axis replicates all taps at the end.
    ppermute cost: (S-1) * bubble as usual; tap collection adds one
    all-reduce of the tapped activations, which the fusion path needs
    everywhere anyway.
  * Composes with the other axes: batch stays sharded over 'data'
    (shard_map in_specs pass it through), tensor-parallel block math
    inside a stage would shard over 'model'. NOT composed: FSDP of the
    stage-resident weights over 'data' — inside shard_map the SPMD is
    manual, so that would need explicit per-stage all-gathers; at
    reference scale (<=1.3B params / S stages) stage weights fit
    comfortably, so the gather machinery isn't worth its complexity.

Use `pipeline_spec(depth, n_stages)` to validate/derive the stage split
and `pipeline_vit_blocks(...)` inside a mesh context. Single-host
multi-device CPU meshes run this for tests; real deployments lay 'pipe'
over ICI neighbors so each hop is one link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
    _SHMAP_NOCHECK = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
    _SHMAP_NOCHECK = {"check_rep": False}
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_vit_blocks", "pipeline_spec", "stage_params"]


def pipeline_spec(depth: int, n_stages: int) -> int:
    """Layers per stage; depth must split evenly (contiguous stages)."""
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    return depth // n_stages


def stage_params(stacked: dict, n_stages: int) -> dict:
    """[L, ...] stacked block params -> [S, L/S, ...] for sharding the
    leading axis over the 'pipe' mesh axis."""
    def reshape(a):
        lp = pipeline_spec(a.shape[0], n_stages)
        return a.reshape((n_stages, lp) + a.shape[1:])
    return jax.tree.map(reshape, stacked)


def _run_stage(local_blocks: dict, x: jax.Array, block_fn,
               tap_locals: tuple[int, ...]):
    """Scan the local stage; returns (out, [tapped activations])."""
    if not tap_locals:
        out, _ = jax.lax.scan(lambda c, p: (block_fn(p, c), None),
                              x, local_blocks)
        return out, []
    taps = sorted(tap_locals)
    outs, start = [], 0
    for t in taps:
        seg = jax.tree.map(lambda a: a[start:t + 1], local_blocks)
        x, _ = jax.lax.scan(lambda c, p: (block_fn(p, c), None), x, seg)
        outs.append(x)
        start = t + 1
    lp = jax.tree_util.tree_leaves(local_blocks)[0].shape[0]
    if start < lp:
        seg = jax.tree.map(lambda a: a[start:], local_blocks)
        x, _ = jax.lax.scan(lambda c, p: (block_fn(p, c), None), x, seg)
    return x, outs


def pipeline_vit_blocks(stacked: dict, tokens: jax.Array, block_fn, *,
                        mesh: Mesh, n_microbatches: int,
                        taps: tuple[int, ...] = (),
                        axis: str = "pipe",
                        batch_axis: str | None = "data"):
    """Run the stacked ViT blocks as a GPipe pipeline over `axis`.

    stacked: block params [L, ...] (will be stage-split and sharded);
    tokens: [B, N, D] with B divisible by n_microbatches; block_fn:
    (per-layer params, x) -> x (e.g. a vit_block closure); taps: global
    layer indices whose post-block activations to return (DPT fusion).

    Returns (final [B, N, D], [tap outputs [B, N, D] in `taps` order]) —
    replicated over the pipe axis.
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    lp = pipeline_spec(depth, n_stages)
    staged = stage_params(stacked, n_stages)

    b, n, d = tokens.shape
    m = n_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    x_mb = tokens.reshape(m, b // m, n, d)

    taps = tuple(taps)
    # which (stage, local index) owns each tap
    tap_stage = [t // lp for t in taps]
    tap_local = [t % lp for t in taps]

    batch_spec = P(None, batch_axis, None, None) if batch_axis else P()
    param_spec = jax.tree.map(lambda _: P(axis), staged)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_spec, batch_spec),
        out_specs=(batch_spec if batch_axis else P(),
                   [batch_spec if batch_axis else P()] * len(taps)),
        **_SHMAP_NOCHECK)
    def run(staged_local, x_mb_local):
        # staged_local leaves: [1, L/S, ...] — this rank's stage
        local_blocks = jax.tree.map(lambda a: a[0], staged_local)
        rank = jax.lax.axis_index(axis)
        mb, nn, dd = x_mb_local.shape[1:]
        zero = jnp.zeros((mb, nn, dd), x_mb_local.dtype)

        my_tap_locals = tuple(sorted({tl for ts, tl in zip(tap_stage,
                                                           tap_local)}))

        def tick(carry, t):
            buf, outs, tap_banks = carry
            inject = jax.lax.dynamic_index_in_dim(
                x_mb_local, jnp.clip(t, 0, m - 1), axis=0, keepdims=False)
            cur = jnp.where(rank == 0, inject, buf)
            y, stage_taps = _run_stage(local_blocks, cur, block_fn,
                                       my_tap_locals)
            # bank tapped activations for microbatch index t - rank
            # (microbatch t enters rank r at tick t + r)
            mb_idx = t - rank
            live = (mb_idx >= 0) & (mb_idx < m)
            new_banks = []
            local_order = {tl: i for i, tl in enumerate(my_tap_locals)}
            for ti, (ts, tl) in enumerate(zip(tap_stage, tap_local)):
                bank = tap_banks[ti]
                mine = live & (rank == ts)
                val = stage_taps[local_order[tl]] if stage_taps else zero
                upd = jax.lax.dynamic_update_index_in_dim(
                    bank, val.astype(bank.dtype), jnp.clip(mb_idx, 0, m - 1),
                    axis=0)
                new_banks.append(jnp.where(mine, upd, bank))
            # bank final output on the last rank
            out_idx = t - (n_stages - 1)
            out_live = (out_idx >= 0) & (rank == n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(out_idx, 0, m - 1), axis=0)
            outs = jnp.where(out_live, upd, outs)
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (buf, outs, new_banks), None

        init = (zero,
                jnp.zeros_like(x_mb_local),
                [jnp.zeros_like(x_mb_local) for _ in taps])
        (buf, outs, tap_banks), _ = jax.lax.scan(
            tick, init, jnp.arange(m + n_stages - 1))

        # replicate: only the owning rank holds real data, psum the masks
        outs = jax.lax.psum(
            jnp.where(rank == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis)
        tap_outs = [
            jax.lax.psum(
                jnp.where(rank == ts, bank, jnp.zeros_like(bank)), axis)
            for ts, bank in zip(tap_stage, tap_banks)]
        return outs, tap_outs

    out_mb, tap_mb = run(staged, x_mb)
    out = out_mb.reshape(b, n, d)
    return out, [tb.reshape(b, n, d) for tb in tap_mb]
