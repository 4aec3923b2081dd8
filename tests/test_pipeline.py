"""Blend-op parity vs cv2/torch and end-to-end pipeline smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          init_amodal_dav2)
from amodal_depth_anything_tpu.ops.blend import box_blur, median_filter_blend
from amodal_depth_anything_tpu.pipeline import (AmodalDepthPipeline,
                                                amodal_depth_graph)


def test_box_blur_matches_cv2(rng):
    import cv2
    x = rng.random((32, 32), dtype=np.float32)
    ours = np.asarray(box_blur(jnp.asarray(x[None, :, :, None])))[0, :, :, 0]
    theirs = cv2.blur(x, (3, 3))  # default BORDER_REFLECT_101
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_median_filter_blend_matches_reference_recipe(rng):
    import cv2
    import torch
    import torch.nn.functional as F

    base = rng.random((24, 24), dtype=np.float32)
    amodal = rng.random((24, 24), dtype=np.float32)
    mask = (rng.random((24, 24)) > 0.6).astype(np.float32)

    ours = np.asarray(median_filter_blend(
        jnp.asarray(amodal[None, :, :, None]),
        jnp.asarray(base[None, :, :, None]),
        jnp.asarray(mask[None, :, :, None])))[0, :, :, 0]

    # reference recipe (infer.py:30-44) assembled from torch/cv2 primitives
    w = 3
    blended = base.copy()
    blended[mask > 0] = amodal[mask > 0]
    kernel = torch.ones((1, 1, w, w))
    dil = F.conv2d(torch.from_numpy(mask)[None, None], kernel, padding=w // 2)
    border = ((dil > 0) & (dil < w * w))[0, 0].numpy()
    blurred = cv2.blur(blended, (w, w))
    expected = blended.copy()
    expected[border] = blurred[border]

    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


def test_full_pipeline_smoke(rng, tmp_path):
    import cv2

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal, amodal_cfg,
                               size=56, attn_impl="xla")
    img = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
    mask = np.zeros((80, 100), np.float32)
    mask[20:50, 30:70] = 1.0
    base, blended = pipe(img, mask)
    assert base.shape == (56, 56) and blended.shape == (56, 56)
    assert np.isfinite(base).all() and np.isfinite(blended).all()
    assert base.min() >= 0 and base.max() <= 1

    # file-in/file-out path (reference infer.py contract)
    img_path = str(tmp_path / "img.png")
    mask_path = str(tmp_path / "mask.png")
    cv2.imwrite(img_path, img)
    cv2.imwrite(mask_path, (mask * 255).astype(np.uint8))
    raw_r, amodal_r = pipe.infer_single_image(img_path, mask_path,
                                              str(tmp_path / "out"))
    assert raw_r.shape == (80, 100, 3)
    assert (tmp_path / "out" / "img_amodal_depth_rendered.png").exists()


def test_pipeline_tensor_parallel_serving_matches_single(rng):
    """mesh= serving scale-out: TP-sharded params + token-sharded trunks
    must reproduce the single-device pipeline numerically."""
    from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    img = (rng.random((2, 80, 100, 3)) * 255).astype(np.float32)
    mask = np.zeros((2, 80, 100), np.float32)
    mask[:, 20:50, 30:70] = 1.0

    plain = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                                amodal_cfg, size=56, attn_impl="xla")
    mesh = make_mesh(MeshConfig(data=2, model=4))
    tp = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal, amodal_cfg,
                             size=56, attn_impl="xla", mesh=mesh)
    assert tp.act_sharding is not None
    qkv = tp.params_amodal["backbone"]["blocks"]["attn"]["qkv"]["w"]
    assert "model" in str(qkv.sharding.spec)

    base_a, blend_a = plain(img, mask)
    base_b, blend_b = tp(img, mask)
    np.testing.assert_allclose(base_b, base_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(blend_b, blend_a, rtol=1e-5, atol=1e-5)


def test_pipeline_quantize_int8_calibrated(rng):
    """quantize_int8(calibration=...) quantizes all four trunk matmul
    families and keeps outputs close to the bf16 pipeline."""
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    img = (rng.random((80, 100, 3)) * 255).astype(np.float32)
    mask = np.zeros((80, 100), np.float32)
    mask[20:50, 30:70] = 1.0

    ref_pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                                   amodal_cfg, size=56, attn_impl="xla")
    base_ref, blend_ref = ref_pipe(img, mask)

    q_pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                                 amodal_cfg, size=56, attn_impl="xla")
    q_pipe.quantize_int8(base=True, amodal=True, head=True,
                         calibration=(img, mask))
    import jax.numpy as jnp
    for tree in (q_pipe.params_raw, q_pipe.params_amodal):
        blocks = tree["backbone"]["blocks"]
        for fam in (blocks["attn"]["qkv"], blocks["attn"]["proj"],
                    blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
            assert fam["w"].dtype == jnp.int8
        # head convs quantized too; sigmoid-feeding final 1x1 stays f32
        sc = tree["depth_head"]["scratch"]
        assert sc["output_conv1"]["w"].dtype == jnp.int8
        assert sc["output_conv2"]["conv2"]["w"].dtype != jnp.int8

    base_q, blend_q = q_pipe(img, mask)
    assert np.isfinite(base_q).all() and np.isfinite(blend_q).all()
    assert np.abs(base_q - base_ref).mean() < 0.05
    assert np.abs(blend_q - blend_ref).mean() < 0.05


def test_quality_harness_reports_deltas(rng):
    """pipeline/quality.py: zero delta for identical pipelines, nonzero
    for a ToMe-merged one, with difficulty buckets when visible/whole
    masks are present."""
    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline.amodal_pipeline import (
        amodal_depth_graph)
    from amodal_depth_anything_tpu.pipeline.quality import (
        blended_depth_delta, corpus_quality_report)

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p_raw = jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(
        jax.random.PRNGKey(0))
    p_am = jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(
        jax.random.PRNGKey(1))
    # random init drives the raw ReLU head all-negative (output flat 0,
    # which would make every delta vacuously zero); bias it live
    conv2 = p_raw["depth_head"]["scratch"]["output_conv2"]["conv2"]
    conv2["b"] = conv2["b"] + 1.0

    def run(tm):
        def f(im, mk):
            base, blended = amodal_depth_graph(
                p_raw, p_am, jnp.asarray(im), jnp.asarray(mk),
                raw_cfg=raw_cfg, amodal_cfg=am_cfg, size=28,
                attn_impl="xla", base_token_merge=tm)
            return np.asarray(base), np.asarray(blended)
        return f

    img = (rng.random((28, 28, 3)) * 255).astype(np.uint8)
    msk = np.zeros((28, 28), np.float32)
    msk[4:20, 4:20] = 1.0
    vis = np.zeros_like(msk)
    vis[4:20, 4:12] = 1.0
    corpus = [{"image": img, "mask": msk, "visible": vis, "whole": msk}]

    same = corpus_quality_report(run(None), run(None), corpus)
    assert same["overall"]["blended_max_abs"] == 0.0
    assert same["n_samples"] == 1
    assert same["per_bucket"]["hard"]["n"] == 1  # vis ratio 0.5 -> hard

    merged = corpus_quality_report(run(None), run((0, 1)), corpus)
    assert merged["overall"]["blended_max_abs"] > 0.0
    d = blended_depth_delta(np.zeros((1, 4, 4)), np.ones((1, 4, 4)),
                            np.zeros((1, 4, 4)), np.zeros((1, 4, 4)))
    assert d["blended_max_abs"] == 1.0 and d["base_max_abs"] == 0.0


def test_head_batch_tile_exact(rng):
    """batch-tiled DPT head (lax.map chunks) must match the all-at-once
    head — it exists purely to cap HBM at large batch. (Same math; XLA
    fusion order differs between the mapped/unmapped programs, so allow
    1-ulp noise.)"""
    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2, apply_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline.amodal_pipeline import (
        amodal_depth_graph)

    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p = jax.jit(lambda k: init_amodal_dav2(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((4, 28, 28, 3)), jnp.float32)
    g = jnp.asarray(rng.random((4, 28, 28, 1)) > 0.5, jnp.float32) * 2 - 1
    o = jnp.asarray(rng.random((4, 28, 28, 1)), jnp.float32) * 2 - 1

    a = apply_amodal_dav2(p, cfg, x, guide_mask=g, observation=o,
                          attn_impl="xla")
    b = apply_amodal_dav2(p, cfg, x, guide_mask=g, observation=o,
                          attn_impl="xla", head_batch_tile=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(ValueError):
        apply_amodal_dav2(p, cfg, x, guide_mask=g, observation=o,
                          attn_impl="xla", head_batch_tile=3)

    # through the fused graph too
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    p_raw = jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(
        jax.random.PRNGKey(1))
    img = jnp.asarray(rng.random((4, 28, 28, 3)) * 255, jnp.float32)
    msk = jnp.asarray(rng.random((4, 28, 28, 1)) > 0.5, jnp.float32)
    b0, d0 = amodal_depth_graph(p_raw, p, img, msk, raw_cfg=raw_cfg,
                                amodal_cfg=cfg, size=28, attn_impl="xla")
    b1, d1 = amodal_depth_graph(p_raw, p, img, msk, raw_cfg=raw_cfg,
                                amodal_cfg=cfg, size=28, attn_impl="xla",
                                head_batch_tile=2)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=1e-6)


def test_pipeline_quantize_int8_dynamic(rng):
    """quantize_int8(dynamic=True): full coverage, zero calibration."""
    import jax.numpy as jnp

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    img = (rng.random((80, 100, 3)) * 255).astype(np.float32)
    mask = np.zeros((80, 100), np.float32)
    mask[20:50, 30:70] = 1.0

    ref_pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                                   amodal_cfg, size=56, attn_impl="xla")
    base_ref, blend_ref = ref_pipe(img, mask)

    q_pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                                 amodal_cfg, size=56, attn_impl="xla")
    q_pipe.quantize_int8(base=True, amodal=True, head=True, dynamic=True)
    for tree in (q_pipe.params_raw, q_pipe.params_amodal):
        blocks = tree["backbone"]["blocks"]
        for fam in (blocks["attn"]["qkv"], blocks["attn"]["proj"],
                    blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
            assert fam["w"].dtype == jnp.int8
            assert "act_scale" not in fam
        # head convs: the dynamic walker keeps thin convs float — at
        # vitt size EVERY head conv is under the production fan
        # threshold (kh*kw*cin >= 512), so the head stays float here;
        # the sigmoid-feeding final 1x1 stays float at any size
        sc = tree["depth_head"]["scratch"]
        assert sc["output_conv2"]["conv2"]["w"].dtype != jnp.int8

    base_q, blend_q = q_pipe(img, mask)
    assert np.isfinite(base_q).all() and np.isfinite(blend_q).all()
    assert np.abs(blend_q - blend_ref).mean() < 0.05

    with pytest.raises(ValueError):
        q_pipe.quantize_int8(dynamic=True, calibration=(img, mask))


def test_pipeline_data_parallel_serving_matches_single(rng):
    """mesh= with a data-only axis: pure DP serving — batch sharded over
    'data', params replicated, result equal to the unsharded pipeline."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
    from amodal_depth_anything_tpu.pipeline import AmodalDepthPipeline

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p_raw = jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(
        jax.random.PRNGKey(0))
    p_am = jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(
        jax.random.PRNGKey(1))

    img = (rng.random((2, 48, 40, 3)) * 255).astype(np.float32)
    msk = (rng.random((2, 48, 40)) > 0.5).astype(np.float32)

    ref = AmodalDepthPipeline(p_raw, raw_cfg, p_am, am_cfg, size=56,
                              attn_impl="xla")
    want_base, want_blend = ref(img, msk)

    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])
    pipe = AmodalDepthPipeline(p_raw, raw_cfg, p_am, am_cfg, size=56,
                               attn_impl="xla", mesh=mesh)
    got_base, got_blend = pipe(img, msk)
    np.testing.assert_allclose(got_base, want_base, atol=1e-5)
    np.testing.assert_allclose(got_blend, want_blend, atol=1e-5)


def test_pipeline_serving_save_load_roundtrip(rng, tmp_path):
    """save_serving/load_serving: the quantized (int8) serving state
    restores bit-identically — int8 kernels stay int8, outputs equal."""
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    img = (rng.random((80, 100, 3)) * 255).astype(np.float32)
    mask = np.zeros((80, 100), np.float32)
    mask[20:50, 30:70] = 1.0

    pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                               amodal_cfg, size=56, attn_impl="xla",
                               dtype=jnp.bfloat16)
    pipe.quantize_int8(base=True, amodal=True, dynamic=True)
    base_want, blend_want = pipe(img, mask)

    path = str(tmp_path / "serving")
    pipe.save_serving(path)
    loaded = AmodalDepthPipeline.load_serving(path)
    assert loaded.size == 56 and loaded.attn_impl == "xla"
    assert loaded.dtype == jnp.bfloat16
    qkv = loaded.params_raw["backbone"]["blocks"]["attn"]["qkv"]
    assert qkv["w"].dtype == jnp.int8  # no re-cast on restore
    base_got, blend_got = loaded(img, mask)
    np.testing.assert_array_equal(base_got, base_want)
    np.testing.assert_array_equal(blend_got, blend_want)

    # wrong-kind guard
    with pytest.raises(ValueError, match="expected 'depthfm'"):
        from amodal_depth_anything_tpu.pipeline import DepthFMPipeline
        DepthFMPipeline.load_serving(path)


def test_pipeline_tome_knobs_and_serving_persistence(rng, tmp_path):
    """First-class ToMe/head-tile pipeline knobs: outputs match the graph
    called with the same kwargs, and save/load_serving persists them."""
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    params_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)

    img = (rng.random((80, 100, 3)) * 255).astype(np.float32)
    mask = np.zeros((80, 100), np.float32)
    mask[20:50, 30:70] = 1.0

    pipe = AmodalDepthPipeline(params_raw, raw_cfg, params_amodal,
                               amodal_cfg, size=56, attn_impl="xla",
                               amodal_token_merge=(2, 6), head_batch_tile=1)
    base, blend = pipe(img, mask)
    want_base, want_blend = amodal_depth_graph(
        pipe.params_raw, pipe.params_amodal,
        jnp.asarray(img[None]), jnp.asarray(mask[None, ..., None]),
        raw_cfg=raw_cfg, amodal_cfg=amodal_cfg, size=56, attn_impl="xla",
        amodal_token_merge=(2, 6), head_batch_tile=1)
    np.testing.assert_array_equal(base, np.asarray(want_base)[0])
    np.testing.assert_array_equal(blend, np.asarray(want_blend)[0])

    path = str(tmp_path / "serving_tome")
    pipe.save_serving(path)
    loaded = AmodalDepthPipeline.load_serving(path)
    assert loaded.amodal_token_merge == (2, 6)
    assert loaded.base_token_merge is None
    assert loaded.head_batch_tile == 1
    base2, blend2 = loaded(img, mask)
    np.testing.assert_array_equal(base2, base)
    np.testing.assert_array_equal(blend2, blend)


def test_serving_roundtrip_with_layer_masks(rng, tmp_path):
    """Per-layer mixed-precision trees (use_q bool + w_orig leaves,
    ops/quant.py layer_mask) persist through save_serving/load_serving
    bit-exactly."""
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline.amodal_pipeline import (
        AmodalDepthPipeline)

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    p_am = init_amodal_dav2(jax.random.PRNGKey(1), am_cfg)
    img = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
    mask = np.zeros((64, 72), np.float32)
    mask[10:40, 20:60] = 1.0

    pipe = AmodalDepthPipeline(p_raw, raw_cfg, p_am, am_cfg, size=56,
                               attn_impl="xla")
    pipe.quantize_int8(
        base=True, amodal=True, head=True, calibration=(img, mask),
        base_layer_mask=np.array([True, False, True, False]),
        amodal_layer_mask=np.array([False, True, False, True]))
    _, blended = pipe(img, mask)

    path = str(tmp_path / "sc")
    pipe.save_serving(path)
    pipe2 = AmodalDepthPipeline.load_serving(path)
    q = pipe2.params_raw["backbone"]["blocks"]["attn"]["qkv"]
    assert "use_q" in q and q["use_q"].dtype == jnp.bool_
    assert "w_orig" in q
    _, blended2 = pipe2(img, mask)
    np.testing.assert_array_equal(np.asarray(blended),
                                  np.asarray(blended2))


def test_bulk_to_device_bit_exact(rng):
    """bulk_to_device (the eager chunked host->device restore path,
    default since r5): mixed dtypes, scalars, empty and multi-chunk
    trees all come back bit-exact with dtypes preserved. Forced tiny
    chunk_bytes exercises the multi-chunk planner."""
    import ml_dtypes

    from amodal_depth_anything_tpu.pipeline.serving_ckpt import \
        bulk_to_device

    tree = {
        "a": {"w": rng.standard_normal((33, 17)).astype(np.float32),
              "b": rng.standard_normal((17,)).astype(ml_dtypes.bfloat16)},
        "q": {"k": rng.integers(-127, 127, (64, 8)).astype(np.int8),
              "scale": np.float32(0.5).reshape(())},
        "empty": np.zeros((0, 4), np.float32),
    }
    import os as _os
    flat_in = jax.tree_util.tree_flatten_with_path(tree)[0]
    for mode in ("host", "device"):  # host = default since runbook v35
        _os.environ["AMODAL_FLAT_SPLIT"] = mode
        try:
            out = bulk_to_device(tree, chunk_bytes=128)
        finally:
            del _os.environ["AMODAL_FLAT_SPLIT"]
        flat_out = jax.tree_util.tree_flatten_with_path(out)[0]
        for (p1, l1), (_, l2) in zip(flat_in, flat_out):
            assert l1.shape == l2.shape and l1.dtype == l2.dtype, (mode, p1)
            np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1),
                                          (mode, p1))


def test_flat_sidecar_roundtrip(rng, tmp_path):
    """save_serving_state writes the flat restore-accelerator sidecar
    (raw chunk files + plan) and restore_serving_state prefers it —
    leaves must come back bit-exact with dtypes/shapes preserved, in a
    tree whose insertion order differs from sorted order (the plan is
    stored in tree-flatten order and remapped on read)."""
    import ml_dtypes

    from amodal_depth_anything_tpu.pipeline.serving_ckpt import (
        restore_serving_state, save_serving_state)

    trees = {
        "zeta": {"w": rng.standard_normal((37, 5)).astype(np.float32),
                 "b": rng.standard_normal((5,)).astype(ml_dtypes.bfloat16)},
        "alpha": {"k": rng.integers(-127, 127, (16, 3)).astype(np.int8),
                  "nested": {"scale": np.float32(2.5).reshape(()),
                             "mask": np.array([True, False, True])}},
    }
    path = str(tmp_path / "sc_flat")
    save_serving_state(path, trees, {"kind": "test"})
    import os as _os
    assert _os.path.exists(_os.path.join(path, "flat", "plan.json"))

    got, meta = restore_serving_state(path, expect_kind="test")
    assert meta["kind"] == "test"
    flat_in = jax.tree_util.tree_flatten_with_path(trees)[0]
    flat_out = jax.tree_util.tree_flatten_with_path(got)[0]
    for (p1, l1), (p2, l2) in zip(flat_in, flat_out):
        assert p1 == p2
        assert l1.shape == l2.shape and l1.dtype == l2.dtype, p1
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))

    # device-split mode (AMODAL_FLAT_SPLIT=device — the default `got`
    # above exercised the host mode, default since runbook v35): group
    # split programs must stay bit-exact and dtype/shape/path identical
    _os.environ["AMODAL_FLAT_SPLIT"] = "device"
    try:
        got_h, _ = restore_serving_state(path, expect_kind="test")
    finally:
        del _os.environ["AMODAL_FLAT_SPLIT"]
    for (p1, l1), (p2, l2) in zip(flat_in,
                                  jax.tree_util.tree_flatten_with_path(
                                      got_h)[0]):
        assert p1 == p2
        assert l1.shape == l2.shape and l1.dtype == l2.dtype, p1
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1), p1)

    # and the Orbax fallback path still agrees when the sidecar is gone
    import shutil
    shutil.rmtree(_os.path.join(path, "flat"))
    got2, _ = restore_serving_state(path, expect_kind="test")
    for (p1, l1), (_, l2) in zip(flat_in,
                                 jax.tree_util.tree_flatten_with_path(
                                     got2)[0]):
        np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1), p1)
