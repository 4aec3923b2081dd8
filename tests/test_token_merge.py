"""ToMe-style token merging: exactness on duplicate tokens, cls
protection, static shapes, and the trunk integration path."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.ops.token_merge import tome_merge, tome_unmerge


def _tokens_with_duplicates(rng, b=2, n=32, d=16, r=4):
    """Random tokens where r even-position tokens exactly duplicate an odd
    neighbour — the only cosine-1.0 pairs, so they are what gets merged."""
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    dup_even = 2 * (1 + np.arange(r))          # even positions 2,4,...
    dup_odd = dup_even + 1
    x[:, dup_even] = x[:, dup_odd]
    return jnp.asarray(x), dup_even


def test_merge_of_duplicates_is_lossless(rng):
    x, dup_even = _tokens_with_duplicates(rng, r=4)
    merged, idx = tome_merge(x, r=4)
    assert merged.shape == (2, 32 - 4, 16)
    assert idx.shape == (2, 32)
    rec = tome_unmerge(merged, idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               rtol=1e-6, atol=1e-6)


def test_cls_never_merged(rng):
    x, _ = _tokens_with_duplicates(rng, r=4)
    # make cls maximally similar to a b-token — it must STILL not merge
    x = x.at[:, 0].set(x[:, 1])
    merged, idx = tome_merge(x, r=4)
    rec = tome_unmerge(merged, idx)
    np.testing.assert_allclose(np.asarray(rec[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-6)
    # cls keeps slot 0 in the merged stream
    assert int(idx[0, 0]) == 0


def test_merge_reduces_and_jits(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)
    f = jax.jit(lambda t: tome_merge(t, r=16))
    merged, idx = f(x)
    assert merged.shape == (1, 48, 8)
    assert np.isfinite(np.asarray(merged)).all()
    # every original position points at a valid merged slot
    assert int(idx.max()) < 48 and int(idx.min()) >= 0


def test_trunk_token_merge_integration(rng):
    """Full guided model with token_merge: pre-merge taps bit-identical to
    the baseline, post-merge taps reduced-then-unmerged, output finite and
    close in the easy (high-redundancy) regime."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, apply_amodal_dav2, init_amodal_dav2)
    from amodal_depth_anything_tpu.models.dinov2 import (
        dinov2_intermediate_layers)

    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params = init_amodal_dav2(jax.random.PRNGKey(0), cfg)
    # constant-ish image -> highly redundant tokens -> merging is benign
    x = jnp.full((1, 56, 56, 3), 0.5) + 0.01 * jnp.asarray(
        rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    m = jnp.zeros((1, 56, 56, 1))
    o = jnp.full((1, 56, 56, 1), 0.3)

    ref = apply_amodal_dav2(params, cfg, x, guide_mask=m, observation=o,
                            attn_impl="xla")
    out = apply_amodal_dav2(params, cfg, x, guide_mask=m, observation=o,
                            attn_impl="xla", token_merge=(0, 4))
    assert out.shape == ref.shape
    assert np.isfinite(np.asarray(out)).all()
    # low-frequency input: merged forward stays close
    assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 0.05

    # taps at/before the merge layer are bit-identical
    from amodal_depth_anything_tpu.models.amodal_dav2 import _normalize
    xn = _normalize(x)
    guide = jnp.concatenate([m, o], axis=-1)
    f_ref = dinov2_intermediate_layers(params["backbone"], cfg.vit, xn,
                                       guide, (0, 1, 2, 3), attn_impl="xla")
    f_tm = dinov2_intermediate_layers(params["backbone"], cfg.vit, xn,
                                      guide, (0, 1, 2, 3), attn_impl="xla",
                                      token_merge=(0, 4))
    np.testing.assert_array_equal(np.asarray(f_tm[0][0]),
                                  np.asarray(f_ref[0][0]))
    # post-merge taps keep the full grid shape
    assert f_tm[3][0].shape == f_ref[3][0].shape


def test_token_merge_with_pallas_padding(rng):
    """token_merge composes with the model-level padding path (interpret
    kernels): padded garbage rows are excluded from matching."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, apply_amodal_dav2, init_amodal_dav2)

    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params = init_amodal_dav2(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 56, 56, 3)), jnp.float32)
    m = jnp.zeros((1, 56, 56, 1))
    o = jnp.full((1, 56, 56, 1), 0.3)
    out = apply_amodal_dav2(params, cfg, x, guide_mask=m, observation=o,
                            attn_impl="pallas-interpret", token_merge=(1, 3))
    assert out.shape == (1, 56, 56, 1)
    assert np.isfinite(np.asarray(out)).all()
