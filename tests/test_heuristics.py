"""SAM / CLIP / DDIM / heuristics pipeline tests (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.heuristics import (MaskHeuristics,
                                                  get_points_from_components)
from amodal_depth_anything_tpu.models.clip_vit import (CLIPVisionConfig,
                                                       clip_image_embed,
                                                       init_clip_vision)
from amodal_depth_anything_tpu.models.sam import (SAMConfig, init_sam,
                                                  sam_encode_image,
                                                  sam_predict_masks)
from amodal_depth_anything_tpu.ops.ddim import (ddim_sample,
                                                linear_alphas_cumprod)


def test_points_from_components():
    mask = np.zeros((64, 64), np.uint8)
    mask[5:8, 5:8] = 255              # small component -> centroid
    mask[20:60, 20:60] = 255          # large component -> grid
    pts = get_points_from_components(mask, small_component_thresh=100,
                                     grid_step=10)
    assert len(pts) >= 5
    assert any((5 <= x <= 8 and 5 <= y <= 8) for x, y in pts)


def test_sam_tiny_forward(rng):
    cfg = SAMConfig(img_size=64, embed_dim=32, depth=2, num_heads=2,
                    window_size=2, global_blocks=(1,), out_chans=32,
                    decoder_dim=32, decoder_heads=2)
    params = jax.jit(lambda k: init_sam(k, cfg))(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32))
    emb = jax.jit(lambda p, x: sam_encode_image(p, cfg, x))(params, img)
    assert emb.shape == (1, 4, 4, 32)
    pts = jnp.asarray([[[0.5, 0.5], [0.2, 0.3]]], jnp.float32)
    lbl = jnp.asarray([[1.0, -1.0]], jnp.float32)
    masks, iou = jax.jit(lambda p, e, c, l: sam_predict_masks(p, cfg, e, c, l))(
        params, emb, pts, lbl)
    assert masks.shape == (1, 4, 16, 16)
    assert iou.shape == (1, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_clip_tiny_forward(rng):
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, width=32, depth=2,
                           num_heads=2, projection_dim=16)
    params = jax.jit(lambda k: init_clip_vision(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    emb = jax.jit(lambda p, x: clip_image_embed(p, cfg, x,
                                                attn_impl="xla"))(params, x)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_ddim_schedule_and_sample(rng):
    ab = np.asarray(linear_alphas_cumprod())
    assert ab.shape == (1000,) and (np.diff(ab) < 0).all()
    assert 0 < ab[-1] < ab[0] <= 1

    calls = []

    def fake_eps(x, t):
        calls.append(1)
        return x * 0.1

    out = ddim_sample(fake_eps, jax.random.PRNGKey(0), (1, 4, 4, 4),
                      num_steps=5)
    assert out.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_heuristics_end_to_end(rng):
    h = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    hint = np.zeros((48, 48), np.float32)
    hint[10:30, 10:30] = 1.0
    amodal = h.amodal_mask_from_points(img, hint)
    assert amodal.shape == (48, 48)
    assert np.isfinite(amodal).all()
    assert set(np.unique(amodal)).issubset({0.0, 1.0})


def test_rmbg_matting_fn_in_heuristics(rng):
    """RMBG wired as matting_fn: tiny ISNet mattes the completion render."""
    from amodal_depth_anything_tpu.heuristics import make_rmbg_matting_fn
    from amodal_depth_anything_tpu.models.rmbg import RMBGConfig, init_rmbg

    cfg = RMBGConfig(width=8, stage_mid=(4, 4, 4, 8, 8, 8),
                     stage_out=(8, 8, 16, 16, 16, 16),
                     dec_mid=(4, 4, 4, 8, 8))
    params = jax.jit(lambda k: init_rmbg(k, cfg))(jax.random.PRNGKey(0))
    matting = make_rmbg_matting_fn(params, cfg, input_size=64)

    h = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True,
                                   matting_fn=matting)
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    hint = np.zeros((48, 48), np.float32)
    hint[10:30, 10:30] = 1.0
    amodal = h.amodal_mask_from_points(img, hint)
    assert amodal.shape == (48, 48)
    assert set(np.unique(amodal)).issubset({0.0, 1.0})


def test_rmbg_matting_forward(rng):
    from amodal_depth_anything_tpu.models.rmbg import (RMBGConfig, apply_rmbg,
                                                       init_rmbg)
    cfg = RMBGConfig(width=8, stage_mid=(4, 4, 4, 8, 8, 8),
                     stage_out=(8, 8, 16, 16, 16, 16),
                     dec_mid=(4, 4, 4, 8, 8), heights=(7, 6, 5, 4, 4, 4))
    params = jax.jit(lambda k: init_rmbg(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    matte = jax.jit(lambda p, x: apply_rmbg(p, cfg, x))(params, x)
    assert matte.shape == (1, 128, 128, 1)
    m = np.asarray(matte)
    assert np.isfinite(m).all() and m.min() >= 0 and m.max() <= 1


def test_ddim_joint_cfg_matches_separate(rng):
    """joint_fn (one batch-2B call per step) must reproduce the separate
    cond/uncond path exactly — batching is not an approximation."""
    w = jnp.asarray(rng.standard_normal((4, 4), dtype=np.float32)) * 0.05

    def cond(x, t):
        return x * 0.1 + x @ w

    def uncond(x, t):
        return x * 0.05

    def joint(x2, t2):
        b = x2.shape[0] // 2
        return jnp.concatenate([cond(x2[:b], t2[:b]),
                                uncond(x2[b:], t2[b:])], axis=0)

    kw = dict(num_steps=5, guidance_scale=1.5, dtype=jnp.float32)
    sep = ddim_sample(cond, jax.random.PRNGKey(3), (2, 3, 3, 4),
                      uncond_fn=uncond, **kw)
    jnt = ddim_sample(cond, jax.random.PRNGKey(3), (2, 3, 3, 4),
                      uncond_fn=uncond, joint_fn=joint, **kw)
    np.testing.assert_allclose(np.asarray(jnt), np.asarray(sep),
                               rtol=1e-6, atol=1e-6)


def test_ddim_deep_cache_interval1_matches_plain(rng):
    """deep_cache=(1, g) runs every step full — bit-identical to the
    plain scan (plumbing is a pure refactor)."""
    def model(x, t, deep_cache_groups=None, cached_deep=None):
        eps = jnp.tanh(x) * 0.2
        if deep_cache_groups is not None and cached_deep is None:
            return eps, jnp.zeros((1,), x.dtype)
        return eps

    plain = ddim_sample(model, jax.random.PRNGKey(5), (1, 4, 4, 4),
                        num_steps=4)
    dc = ddim_sample(model, jax.random.PRNGKey(5), (1, 4, 4, 4),
                     num_steps=4, deep_cache=(1, 2))
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(plain))

    with pytest.raises(ValueError, match="must divide"):
        ddim_sample(model, jax.random.PRNGKey(5), (1, 4, 4, 4),
                    num_steps=5, deep_cache=(2, 2))


def test_ddim_deep_cache_joint_guided(rng):
    """deep_cache + joint CFG: the full step returns (eps2b, deep2b); the
    shallow steps consume the batched cache."""
    captures, splices = [], []

    def joint(x2, t2, deep_cache_groups=None, cached_deep=None):
        eps = x2 * 0.1
        if deep_cache_groups is not None and cached_deep is None:
            captures.append(1)
            return eps, x2 * 0.5
        if cached_deep is not None:
            splices.append(1)
            eps = eps + 0.01 * cached_deep
        return eps

    def cond(x, t, **dc):
        raise AssertionError("joint path must be used")

    out = ddim_sample(cond, jax.random.PRNGKey(7), (1, 4, 4, 4),
                      num_steps=4, guidance_scale=1.5, uncond_fn=cond,
                      joint_fn=joint, deep_cache=(2, 2))
    assert out.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # traced once per scan body: 1 capture + 1 shallow
    assert len(captures) == 1 and len(splices) == 1


def test_mask_heuristics_deep_cache_end_to_end(rng):
    """DeepCache through the full heuristics pipeline (tiny p2g UNet has
    6 symmetric groups; G=2)."""
    import dataclasses

    h = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    h.p2g_cfg = dataclasses.replace(h.p2g_cfg, ddim_deep_cache=(2, 2))
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    hint = np.zeros((48, 48), np.float32)
    hint[10:30, 10:30] = 1.0
    amodal = h.amodal_mask_from_points(img, hint)
    assert amodal.shape == (48, 48)
    assert set(np.unique(amodal)).issubset({0.0, 1.0})


def test_ddim_deep_cache_separate_guided(rng):
    """deep_cache + separate cond/uncond fns (no joint_fn): the full step
    returns per-fn deep features as a (deep_c, deep_u) tuple cache; the
    shallow steps route each back to its own fn. Trace stays 1 full + 1
    shallow body per fn at any interval (inner scan)."""
    captures, splices = [], []

    def make(tag, scale):
        # cond's deep feature is [.,4], uncond's is [.,8]: the shallow
        # fns assert (statically, at trace time) that each receives ITS
        # OWN cache back — a swapped (deep_c, deep_u) unpack would fail
        def f(x, t, deep_cache_groups=None, cached_deep=None):
            eps = x * scale
            if deep_cache_groups is not None and cached_deep is None:
                captures.append(tag)
                deep = x if tag == "c" else jnp.concatenate([x, x], -1)
                return eps, deep
            if cached_deep is not None:
                splices.append(tag)
                assert cached_deep.shape[-1] == (4 if tag == "c" else 8)
                eps = eps + 0.01 * cached_deep[..., :4]
            return eps
        return f

    out = ddim_sample(make("c", 0.1), jax.random.PRNGKey(9), (1, 4, 4, 4),
                      num_steps=6, guidance_scale=1.5,
                      uncond_fn=make("u", 0.05), deep_cache=(3, 2))
    assert out.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # one full + one shallow trace per fn, regardless of interval 3
    assert sorted(captures) == ["c", "u"]
    assert sorted(splices) == ["c", "u"]


def test_heuristics_serving_roundtrip(rng, tmp_path):
    """MaskHeuristics.save_serving/load_serving: the ready-to-serve
    stack (incl. int8-quantized UNet + the RMBG matting hook) restores
    bit-exactly with no converters and no init programs."""
    import dataclasses

    from amodal_depth_anything_tpu.heuristics import make_rmbg_matting_fn
    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics
    from amodal_depth_anything_tpu.models.rmbg import RMBGConfig, init_rmbg

    mh = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    mh.p2g_cfg = dataclasses.replace(mh.p2g_cfg, ddim_steps=2)
    rcfg = RMBGConfig(width=8, stage_mid=(4, 4, 4, 8, 8, 8),
                      stage_out=(8, 8, 16, 16, 16, 16),
                      dec_mid=(4, 4, 4, 8, 8))
    mh.matting_fn = make_rmbg_matting_fn(
        jax.jit(lambda k: init_rmbg(k, rcfg))(jax.random.PRNGKey(1)),
        rcfg, input_size=64)
    # (the tiny preset's channels sit below quantize_diffusion_int8's
    # wide-site thresholds, so int8 trees are exercised by the amodal
    # pipeline round-trip test instead)

    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    visible = (rng.random((64, 64)) > 0.5)
    ref = mh.pix2gestalt_completion(image, visible)

    path = str(tmp_path / "heur")
    mh.save_serving(path)
    mh2 = MaskHeuristics.load_serving(path)
    assert mh2.p2g_cfg == mh.p2g_cfg
    assert mh2.sam_cfg == mh.sam_cfg
    got = mh2.pix2gestalt_completion(image, visible)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # matting hook restored and runnable
    m = mh2.matting_fn(np.asarray(ref))
    assert m.shape == ref.shape[:2] and set(np.unique(m)) <= {0.0, 1.0}


def test_heuristics_bf16_cast_and_serving_roundtrip(rng, tmp_path):
    """cast_to(bf16): the opt-in serving dtype (r5) — params cast, the
    completion stays finite/in-range, and the compute dtype plus the
    cast leaves round-trip through save_serving/load_serving so a
    restored bf16 stack reproduces the bf16 output bit-exactly."""
    import dataclasses

    import jax.numpy as jnp

    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics

    mh = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    mh.p2g_cfg = dataclasses.replace(mh.p2g_cfg, ddim_steps=2)
    mh.cast_to(jnp.bfloat16)
    w = mh.p2g_params["unet"]["input_blocks"]["0"]["0"]["w"]
    assert w.dtype == jnp.bfloat16

    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    visible = (rng.random((64, 64)) > 0.5)
    points = np.asarray([[20, 20], [40, 40]], np.float32)
    # SAM path runs in bf16 too (prompt coords stay f32)
    m = mh.sam_visible_mask(image, points)
    assert m.dtype == np.bool_ and m.shape == (64, 64)
    ref = mh.pix2gestalt_completion(image, visible)
    assert ref.dtype == np.float32  # outputs surface as f32
    assert np.isfinite(ref).all() and ref.min() >= 0 and ref.max() <= 1

    path = str(tmp_path / "heur_bf16")
    mh.save_serving(path)
    mh2 = MaskHeuristics.load_serving(path)
    assert mh2.compute_dtype == jnp.bfloat16
    got = mh2.pix2gestalt_completion(image, visible)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
