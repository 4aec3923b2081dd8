"""Token merging (ToMe-style) for the frozen ViT trunk — opt-in serving.

Bipartite soft matching (Bolya et al., "Token Merging: Your ViT But
Faster"): split tokens alternately into sets A/B, match each A token to
its most cosine-similar B token, merge the r best-matched A tokens into
their B targets (size-weighted average), and remember the assignment so
tap features can be UN-merged back to the full grid for the DPT head.

Attention cost is quadratic in tokens, so one merge of r ~ N/2 after an
early trunk layer removes most of the trunk's attention FLOPs. The
reference has no equivalent. QUALITY IS UNVALIDATED against the real
checkpoints (none on disk; see ROADMAP) — this ships as mechanism +
exactness tests (duplicate tokens merge losslessly), gated behind an
explicit opt-in, never default.

Shapes are static: r is a compile-time constant, the merged stream is
[B, N - r, D], and the unmerge map is a [B, N] gather — XLA-friendly
throughout (argsort/argmax/gather, no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tome_merge", "tome_unmerge", "tome_apply"]


def tome_merge(tokens: jax.Array, r: int):
    """tokens: [B, N, D] (true tokens only, cls at index 0; no padding).

    Returns (merged [B, N - r, D], unmerge_idx [B, N] int32) where
    `merged[b, unmerge_idx[b, i]]` reconstructs token i's representative.
    The cls token is never merged. Requires 0 < r < N // 2.
    """
    b, n, d = tokens.shape
    if not 0 < r < n // 2:
        raise ValueError(f"r={r} out of range for {n} tokens")
    na = (n + 1) // 2  # even positions (incl. cls at 0)
    nb = n // 2        # odd positions

    metric = tokens / (jnp.linalg.norm(tokens, axis=-1, keepdims=True) + 1e-6)
    a_m, b_m = metric[:, ::2], metric[:, 1::2]
    scores = jnp.einsum("bnd,bmd->bnm", a_m.astype(jnp.float32),
                        b_m.astype(jnp.float32))          # [B, Na, Nb]
    scores = scores.at[:, 0, :].set(-jnp.inf)             # protect cls
    best_val = scores.max(-1)                             # [B, Na]
    best_idx = scores.argmax(-1).astype(jnp.int32)        # [B, Na]

    order = jnp.argsort(-best_val, axis=-1).astype(jnp.int32)  # [B, Na]
    merged_a = order[:, :r]                               # merged A indices
    kept_a = jnp.sort(order[:, r:], axis=-1)              # kept, stable order

    a_tok = tokens[:, ::2]
    b_tok = tokens[:, 1::2]

    def one(b_tok_i, a_tok_i, merged_a_i, best_idx_i, kept_a_i):
        tgt = best_idx_i[merged_a_i]                      # [r] b-targets
        summed = b_tok_i.at[tgt].add(a_tok_i[merged_a_i])
        counts = jnp.ones((nb,), tokens.dtype).at[tgt].add(1.0)
        b_new = summed / counts[:, None]
        return jnp.concatenate([a_tok_i[kept_a_i], b_new], axis=0)

    merged = jax.vmap(one)(b_tok, a_tok, merged_a, best_idx, kept_a)

    # unmerge map over ORIGINAL positions:
    #   kept A token (orig pos 2*kept_a[j])   -> slot j
    #   merged A token (orig pos 2*merged_a)  -> slot (Na - r) + its target b
    #   B token j (orig pos 2*j + 1)          -> slot (Na - r) + j
    n_kept = na - r

    def one_map(merged_a_i, best_idx_i, kept_a_i):
        amap = jnp.zeros((na,), jnp.int32)
        amap = amap.at[kept_a_i].set(jnp.arange(n_kept, dtype=jnp.int32))
        amap = amap.at[merged_a_i].set(n_kept + best_idx_i[merged_a_i])
        bmap = n_kept + jnp.arange(nb, dtype=jnp.int32)
        full = jnp.zeros((n,), jnp.int32)
        full = full.at[0::2].set(amap)
        full = full.at[1::2].set(bmap)
        return full

    unmerge_idx = jax.vmap(one_map)(merged_a, best_idx, kept_a)
    return merged, unmerge_idx


def tome_unmerge(merged: jax.Array, unmerge_idx: jax.Array) -> jax.Array:
    """merged: [B, M, D]; unmerge_idx: [B, N] -> [B, N, D] (each original
    position takes its representative's features)."""
    return jax.vmap(lambda m, i: m[i])(merged, unmerge_idx)


def tome_apply(tokens: jax.Array, unmerge_idx: jax.Array,
               num_merged: int) -> jax.Array:
    """Re-merge tokens [B, N, D] into [B, num_merged, D] group MEANS using
    an existing assignment (ToMe-SD: the bipartite match is computed once
    per block and reused by every module in it). With the idx returned by
    `tome_merge(tokens, r)`, this reproduces that call's `merged` exactly
    (kept tokens are singleton groups; merged targets average their group)."""

    def one(t, i):
        s = jnp.zeros((num_merged, t.shape[-1]), t.dtype).at[i].add(t)
        c = jnp.zeros((num_merged,), t.dtype).at[i].add(
            jnp.ones((), t.dtype))
        return s / c[:, None]

    return jax.vmap(one)(tokens, unmerge_idx)
