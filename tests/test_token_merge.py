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


def test_tome_apply_matches_merge(rng):
    from amodal_depth_anything_tpu.ops.token_merge import tome_apply
    x = jnp.asarray(rng.standard_normal((2, 40, 8)), jnp.float32)
    merged, idx = tome_merge(x, r=10)
    re_merged = tome_apply(x, idx, 30)
    np.testing.assert_allclose(np.asarray(re_merged), np.asarray(merged),
                               rtol=1e-5, atol=1e-6)


def test_unet_tome_identical_tokens_exact(rng):
    """ToMe-SD in the spatial transformer: when every spatial token is
    identical, merging is lossless, so the ToMe output must match the
    exact path to numerical tolerance — while on random (low-redundancy)
    tokens the two paths must DIFFER, proving the merge is active.
    proj_out is re-randomized: at init it is zero_module (torch parity),
    which makes the whole block an identity and any comparison vacuous."""
    from amodal_depth_anything_tpu.models.unet_ldm import (
        UNetConfig, _lin_init, _spatial_transformer, _transformer_init)
    cfg = UNetConfig(model_channels=16, num_heads=2, context_dim=8)
    p = _transformer_init(jax.random.PRNGKey(0), cfg, 16)
    p["proj_out"] = _lin_init(jax.random.PRNGKey(9), 16, 16)
    ctx = jnp.asarray(rng.standard_normal((2, 5, 8)), np.float32)

    x_rand = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), np.float32)
    a = _spatial_transformer(p, x_rand, ctx, cfg, "xla")
    b = _spatial_transformer(p, x_rand, ctx, cfg, "xla", tome=(0.4, 16))
    assert float(jnp.abs(a - b).max()) > 1e-3  # merge actually engaged

    tok = rng.standard_normal((1, 1, 16)).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(tok[:, None], (2, 8, 8, 16)).copy())
    exact = _spatial_transformer(p, x, ctx, cfg, "xla")
    merged = _spatial_transformer(p, x, ctx, cfg, "xla", tome=(0.4, 16))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(exact),
                               rtol=2e-4, atol=2e-5)


def test_depthfm_generate_with_tome(rng):
    """Tiny DepthFMAmodal end-to-end with ToMe-SD on the UNet: runs under
    jit, static shapes, finite [0,1] output, and stays close to the exact
    path on a smooth (high-redundancy) input."""
    from amodal_depth_anything_tpu.models.depthfm import (
        DepthFMConfig, depthfm_generate, init_depthfm)
    cfg = DepthFMConfig(guide_type="image+mask+observation",
                        model_channels=32, channel_mult=(1, 2), num_heads=2,
                        context_dim=32, context_len=7,
                        vae_channels=(16, 32), vae_layers=1)
    params = init_depthfm(jax.random.PRNGKey(0), cfg)
    # zero_module init makes every spatial transformer an identity (torch
    # parity); jitter all UNet params so ToMe has an observable effect
    leaves, treedef = jax.tree.flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params["unet"] = jax.tree.unflatten(treedef, [
        a + 0.02 * jax.random.normal(k, a.shape, a.dtype)
        for a, k in zip(leaves, keys)])
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    ims = jnp.asarray(np.stack([xx, yy, xx * 0 + 0.5], -1)[None].repeat(2, 0),
                      jnp.float32) * 2 - 1
    guide = jnp.ones((2, 32, 32, 1), jnp.float32)
    kw = dict(guide_rgb=ims, guide_mask=guide, observation=guide * 0.5)
    f_exact = jax.jit(lambda p, r, x: depthfm_generate(
        p, cfg, r, x, num_steps=2, **kw))
    f_tome = jax.jit(lambda p, r, x: depthfm_generate(
        p, cfg, r, x, num_steps=2, tome=(0.4, 8), **kw))
    key = jax.random.PRNGKey(3)
    exact = np.asarray(f_exact(params, key, ims))
    out = np.asarray(f_tome(params, key, ims))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the merge must actually engage (outputs differ) but not blow up
    assert np.abs(out - exact).max() > 1e-6
    assert abs(float(out.mean()) - float(exact.mean())) < 0.5
