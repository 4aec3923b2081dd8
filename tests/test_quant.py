"""Opt-in int8 W8A8 serving path: quant error bounds and transparent
dispatch through the scan-stacked dinov2 trunk."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.layers import linear
from amodal_depth_anything_tpu.ops.quant import (calibrate_amodal_dav2,
                                                 collect_trunk_act_stats,
                                                 int8_linear,
                                                 quantize_linear_int8,
                                                 quantize_vit_trunk_int8)


def test_int8_linear_error_bound(rng):
    d_in, d_out = 64, 96
    w = rng.standard_normal((d_in, d_out), dtype=np.float32) * 0.05
    b = rng.standard_normal(d_out).astype(np.float32) * 0.01
    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    # inputs bounded like an LN output with gamma=1: |x| <= 6
    x = jnp.asarray(np.clip(rng.standard_normal((4, 32, d_in)), -6, 6),
                    jnp.float32)
    ref = linear(p, x)
    q = quantize_linear_int8(p, act_scale=jnp.float32(6.0 / 127.0))
    assert q["w"].dtype == jnp.int8
    out = int8_linear(q, x)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err < 0.02 * max(scale, 1.0), (err, scale)
    # the dispatch in layers.linear routes int8 params automatically
    np.testing.assert_array_equal(np.asarray(linear(q, x)), np.asarray(out))


def test_quantized_trunk_forward_close(rng):
    from amodal_depth_anything_tpu.models import get_model

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    params = model.init(jax.random.PRNGKey(0))
    params_q = quantize_vit_trunk_int8(params)
    # only qkv + ffn-first got quantized
    assert params_q["backbone"]["blocks"]["attn"]["qkv"]["w"].dtype == jnp.int8
    assert params_q["backbone"]["blocks"]["mlp"]["fc1"]["w"].dtype == jnp.int8
    assert params_q["backbone"]["blocks"]["attn"]["proj"]["w"].dtype != jnp.int8

    x = jnp.asarray(rng.random((1, 56, 56, 3), dtype=np.float32))
    ref = np.asarray(model.apply(params, x))
    out = np.asarray(model.apply(params_q, x))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()
    assert np.abs(out - ref).mean() < 0.01


def test_act_stats_instrumented_forward_matches_trunk(rng):
    """The calibration scan reuses the deployed block math: its final
    carry must equal the trunk's pre-norm output bit-for-bit."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                              init_amodal_dav2)
    from amodal_depth_anything_tpu.models.dinov2 import (_run_blocks,
                                                         prepare_tokens)

    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = init_amodal_dav2(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 56, 56, 3), dtype=np.float32))

    stats = collect_trunk_act_stats(params, cfg.vit, x, attn_impl="xla")
    depth = cfg.vit.depth
    for k in ("qkv_in", "proj_in", "fc1_in", "fc2_in"):
        assert stats[k].shape == (depth,)
        assert (np.asarray(stats[k]) > 0).all()

    # drift check against the real trunk
    tokens = prepare_tokens(params["backbone"], cfg.vit, x, None)
    ref = _run_blocks(params["backbone"]["blocks"], tokens, [depth - 1],
                      cfg.vit, attn_impl="xla", remat=False)[-1]

    from amodal_depth_anything_tpu.models.layers import (attention_core,
                                                         layer_norm, linear,
                                                         mlp_hidden)

    def block_fn(t, p):
        n1 = layer_norm(p["norm1"], t)
        o = attention_core(p["attn"], n1, num_heads=cfg.vit.num_heads,
                           attn_impl="xla")
        h = linear(p["attn"]["proj"], o)
        if "ls1" in p:
            h = h * p["ls1"]["gamma"].astype(h.dtype)
        t = t + h
        n2 = layer_norm(p["norm2"], t)
        h = linear(p["mlp"]["fc2"], mlp_hidden(p["mlp"], n2))
        if "ls2" in p:
            h = h * p["ls2"]["gamma"].astype(h.dtype)
        return t + h, None

    carry, _ = jax.lax.scan(block_fn, tokens, params["backbone"]["blocks"])
    np.testing.assert_array_equal(np.asarray(carry), np.asarray(ref))


def test_calibrated_trunk_quantizes_all_four_families(rng):
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    stats = calibrate_amodal_dav2(params, cfg, x, attn_impl="xla")
    params_q = quantize_vit_trunk_int8(params, act_stats=stats, margin=1.1)
    blocks = params_q["backbone"]["blocks"]
    for fam in (blocks["attn"]["qkv"], blocks["attn"]["proj"],
                blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
        assert fam["w"].dtype == jnp.int8
        assert fam["act_scale"].shape == (cfg.vit.depth,)

    ref = np.asarray(model.apply(params, x))
    out = np.asarray(model.apply(params_q, x))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 0.08, np.abs(out - ref).max()
    assert np.abs(out - ref).mean() < 0.02


def test_smoothquant_migration_exact_unquantized(rng):
    """The smooth multiply (x * 1/s) @ (s * W) is mathematically exact;
    a migrated-but-unquantized tree must match the original closely in
    f32 (only rounding differs)."""
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config
    from amodal_depth_anything_tpu.ops.quant import smoothquant_vit_trunk

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    stats = calibrate_amodal_dav2(params, cfg, x, attn_impl="xla")
    assert stats["proj_in_ch"].shape == (cfg.vit.depth, cfg.vit.embed_dim)
    p_sm, stats_sm = smoothquant_vit_trunk(params, stats, alpha=0.5)
    blocks = p_sm["backbone"]["blocks"]
    assert blocks["attn"]["proj"]["smooth"].shape == \
        (cfg.vit.depth, cfg.vit.embed_dim)
    assert blocks["attn"]["proj"]["w"].dtype != jnp.int8
    # post-smooth per-tensor amax shrinks (or stays) vs the raw amax
    assert (np.asarray(stats_sm["proj_in"]) <=
            np.asarray(stats["proj_in"]) + 1e-5).all()

    ref = np.asarray(model.apply(params, x))
    out = np.asarray(model.apply(p_sm, x))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() < 2e-3 * scale, np.abs(out - ref).max()


def test_smoothquant_beats_plain_int8_on_outlier_channels(rng):
    """Per-tensor activation quant is destroyed by one hot input channel;
    SmoothQuant migrates it into the weight and must cut the error."""
    d_in, d_out = 64, 64
    w = rng.standard_normal((d_in, d_out), dtype=np.float32) * 0.05
    x = rng.standard_normal((512, d_in)).astype(np.float32)
    x[:, 7] *= 80.0  # the outlier channel
    xj = jnp.asarray(x)
    p = {"w": jnp.asarray(w)}
    ref = np.asarray(linear(p, xj))

    amax = jnp.max(jnp.abs(xj))  # per-tensor calibrated scale
    q_plain = quantize_linear_int8(p, amax / 127.0)
    err_plain = np.abs(np.asarray(int8_linear(q_plain, xj)) - ref).max()

    from amodal_depth_anything_tpu.ops.quant import _smooth_linear
    ch_amax = jnp.max(jnp.abs(xj), axis=0)
    p_sm, sm_amax = _smooth_linear(p, ch_amax, 0.5)
    q_sm = quantize_linear_int8(p_sm, sm_amax / 127.0)
    assert "smooth" in q_sm
    err_sm = np.abs(np.asarray(int8_linear(q_sm, xj)) - ref).max()
    assert err_sm < err_plain / 3, (err_sm, err_plain)


def test_smoothquant_trunk_int8_end_to_end(rng):
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 56, 56, 3), dtype=np.float32))

    stats = calibrate_amodal_dav2(params, cfg, x, attn_impl="xla")
    params_q = quantize_vit_trunk_int8(params, act_stats=stats, margin=1.1,
                                       smooth_alpha=0.5)
    blocks = params_q["backbone"]["blocks"]
    for fam in (blocks["attn"]["proj"], blocks["mlp"]["fc2"]):
        assert fam["w"].dtype == jnp.int8
        assert "smooth" in fam
    ref = np.asarray(model.apply(params, x))
    out = np.asarray(model.apply(params_q, x))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 0.08, np.abs(out - ref).max()


def test_quantize_families_subset(rng):
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 56, 56, 3), dtype=np.float32))
    stats = calibrate_amodal_dav2(params, cfg, x, attn_impl="xla")
    params_q = quantize_vit_trunk_int8(params, act_stats=stats,
                                       families=("qkv", "ffn2"))
    blocks = params_q["backbone"]["blocks"]
    assert blocks["attn"]["qkv"]["w"].dtype == jnp.int8
    assert blocks["mlp"]["fc2"]["w"].dtype == jnp.int8
    assert blocks["attn"]["proj"]["w"].dtype != jnp.int8
    assert blocks["mlp"]["fc1"]["w"].dtype != jnp.int8
    out = np.asarray(model.apply(params_q, x))
    assert np.isfinite(out).all()


def test_merge_act_stats(rng):
    from amodal_depth_anything_tpu.ops.quant import merge_act_stats

    a = {"qkv_in": jnp.asarray([1.0, 3.0]), "fc1_in": jnp.asarray([2.0, 1.0])}
    b = {"qkv_in": jnp.asarray([2.0, 1.0]), "fc1_in": jnp.asarray([1.0, 4.0])}
    m = merge_act_stats([a, b])
    np.testing.assert_array_equal(np.asarray(m["qkv_in"]), [2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(m["fc1_in"]), [2.0, 4.0])


def _head_fixture(rng):
    from amodal_depth_anything_tpu.models.dpt import (DPTConfig, dpt_head,
                                                      init_dpt_head)

    cfg = DPTConfig(in_channels=64, features=16, out_channels=(8, 16, 32, 32))
    params = init_dpt_head(jax.random.PRNGKey(2), cfg)
    # conv-transpose resize layers are zero-initialized; randomize so the
    # comparison has signal
    for k in ("0", "1"):
        rl = params["resize_layers"][k]
        rl["w"] = jax.random.normal(jax.random.PRNGKey(3), rl["w"].shape) * 0.1
    ph = pw = 4
    feats = []
    for _ in range(4):
        tok = jnp.asarray(rng.standard_normal((1, ph * pw, 64)), jnp.float32)
        feats.append((tok, tok[:, 0]))
    return cfg, params, feats, (ph, pw), dpt_head


def test_head_act_stats_instrumented_matches_head(rng):
    from amodal_depth_anything_tpu.ops.quant import collect_dpt_head_act_stats

    cfg, params, feats, hw, dpt_head = _head_fixture(rng)
    ref = dpt_head(params, cfg, feats, hw)
    stats, out = collect_dpt_head_act_stats(params, cfg, feats, hw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert all(float(v) > 0 for v in stats.values())
    # every quantizable conv got a stat except refinenet4's unused skip RCU
    assert "scratch.refinenet4.resConfUnit1.conv1" not in stats
    assert "scratch.refinenet1.resConfUnit1.conv1" in stats


def test_quantized_head_forward_close(rng):
    from amodal_depth_anything_tpu.ops.quant import (
        collect_dpt_head_act_stats, quantize_dpt_head_int8)

    cfg, params, feats, hw, dpt_head = _head_fixture(rng)
    ref = np.asarray(dpt_head(params, cfg, feats, hw))
    stats, _ = collect_dpt_head_act_stats(params, cfg, feats, hw)
    params_q = quantize_dpt_head_int8(params, stats)
    assert params_q["projects"]["0"]["w"].dtype == jnp.int8
    assert params_q["scratch"]["refinenet1"]["out_conv"]["w"].dtype == jnp.int8
    # final sigmoid-feeding conv and refinenet4's unused RCU stay bf16/f32
    assert params_q["scratch"]["output_conv2"]["conv2"]["w"].dtype != jnp.int8
    assert params_q["scratch"]["refinenet4"]["resConfUnit1"]["conv1"]["w"].dtype != jnp.int8

    out = np.asarray(dpt_head(params_q, cfg, feats, hw))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 0.1, np.abs(out - ref).max()
    assert np.abs(out - ref).mean() < 0.02


def test_quantize_diffusion_int8_tiny(rng):
    """Dynamic-activation W8A8 over the DepthFM UNet+VAE tree: wide
    convs/linears quantize, thin convs and output convs stay float, and
    the 4-step eval output stays close to the f32 model."""
    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.depthfm import (
        DepthFMConfig, depthfm_generate, init_depthfm)
    from amodal_depth_anything_tpu.ops.quant import quantize_diffusion_int8

    cfg = DepthFMConfig(guide_type="mask+observation", model_channels=64,
                        channel_mult=(1, 2), num_heads=2, context_dim=64,
                        vae_channels=(32, 64), vae_layers=1)
    params = jax.jit(lambda k: init_depthfm(k, cfg))(jax.random.PRNGKey(0))
    # thresholds scaled down for the tiny dims
    q = quantize_diffusion_int8(params, min_conv_fan=128, min_lin_dim=48)

    # wide res-block conv quantized; UNet final conv and VAE decoder
    # conv_out stay float; conv_in (thin) stays float
    assert q["unet"]["input_blocks"]["1"]["0"]["conv1"]["w"].dtype == jnp.int8
    assert q["unet"]["out"]["conv"]["w"].dtype != jnp.int8
    assert q["vae"]["decoder"]["conv_out"]["w"].dtype != jnp.int8
    assert q["unet"]["input_blocks"]["0"]["0"]["w"].dtype != jnp.int8
    # VAE mid attention linears quantized (64x64 > 48)
    assert q["vae"]["decoder"]["mid_block"]["attentions"]["0"]["to_q"][
        "w"].dtype == jnp.int8

    ims = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)
    mask = jnp.ones((1, 32, 32, 1), jnp.float32)
    obs = jnp.zeros((1, 32, 32, 1), jnp.float32)
    ref = np.asarray(depthfm_generate(params, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    got = np.asarray(depthfm_generate(q, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).mean() < 0.08, np.abs(got - ref).mean()


def test_quantize_trunk_dynamic(rng):
    """dynamic=True quantizes all four matmul families with NO stored
    act scales (run-time amax) and stays close to the float model."""
    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, apply_amodal_dav2, init_amodal_dav2)
    from amodal_depth_anything_tpu.ops.quant import quantize_vit_trunk_int8

    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p = jax.jit(lambda k: init_amodal_dav2(k, cfg))(jax.random.PRNGKey(0))
    q = quantize_vit_trunk_int8(p, dynamic=True)
    blocks = q["backbone"]["blocks"]
    for fam in (blocks["attn"]["qkv"], blocks["attn"]["proj"],
                blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
        assert fam["w"].dtype == jnp.int8
        assert "act_scale" not in fam  # dynamic at run time

    x = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    g = jnp.ones((1, 28, 28, 1), jnp.float32)
    ref = np.asarray(apply_amodal_dav2(p, cfg, x, guide_mask=g,
                                       observation=g * 0.5,
                                       attn_impl="xla"))
    got = np.asarray(apply_amodal_dav2(q, cfg, x, guide_mask=g,
                                       observation=g * 0.5,
                                       attn_impl="xla"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).mean() < 0.05, np.abs(got - ref).mean()


def test_calibrate_diffusion_scales_promotes_exact(rng):
    """Static promotion with margin=1.0 and the serving input as the
    calibration input reproduces the dynamic path BIT-EXACTLY at a
    single site (the static act_scale equals the amax the dynamic path
    would compute), and the scale leaf lands on the right node."""
    from amodal_depth_anything_tpu.ops.quant import (
        calibrate_diffusion_scales, int8_linear, quantize_diffusion_int8)

    w = rng.standard_normal((256, 256)).astype(np.float32)
    b = rng.standard_normal((256,)).astype(np.float32)
    tree = {"block": {"fc": {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                      "norm": {"scale": jnp.ones((4,))}}}
    q = quantize_diffusion_int8(tree)
    assert q["block"]["fc"]["w"].dtype == jnp.int8
    assert "act_scale" not in q["block"]["fc"]

    x = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
    dynamic = np.asarray(int8_linear(q["block"]["fc"], x))

    def run(qp, x):
        from amodal_depth_anything_tpu.ops import quant
        return quant.int8_linear(qp["block"]["fc"], x)

    qs = calibrate_diffusion_scales(q, run, x, margin=1.0)
    fc = qs["block"]["fc"]
    assert "act_scale" in fc
    np.testing.assert_allclose(
        float(fc["act_scale"]),
        max(float(np.max(np.abs(x))) / 127.0, 1e-9), rtol=1e-6)
    static = np.asarray(int8_linear(fc, x))
    np.testing.assert_array_equal(static, dynamic)
    # untouched leaves unchanged
    np.testing.assert_array_equal(np.asarray(qs["block"]["norm"]["scale"]),
                                  np.asarray(q["block"]["norm"]["scale"]))


def test_calibrate_diffusion_scales_errors_without_sites():
    import pytest

    from amodal_depth_anything_tpu.ops.quant import \
        calibrate_diffusion_scales

    tree = {"fc": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}}  # float

    with pytest.raises(ValueError, match="no dynamic int8 sites"):
        calibrate_diffusion_scales(tree, lambda qp, x: x, jnp.ones((2, 4)))


def test_depthfm_pipeline_calibrated_int8(rng):
    """Pipeline-level static promotion: quantize_int8(calibration=...)
    bakes act_scale leaves in, the serving forward stays close to the
    dynamic-int8 forward, and save/load_serving round-trips the static
    tree dtype-exactly."""
    import dataclasses

    from amodal_depth_anything_tpu.pipeline.depthfm_pipeline import \
        DepthFMPipeline

    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    mask = np.ones((40, 40), np.float32)
    obs = rng.random((40, 40)).astype(np.float32)

    def build():
        return DepthFMPipeline.init_random(jax.random.PRNGKey(0), size=32,
                                           num_steps=2)

    dyn = build()
    dyn.quantize_int8(min_conv_fan=16, min_lin_dim=16)
    out_dyn = dyn(img, mask, obs)

    cal = build()
    cal.quantize_int8(min_conv_fan=16, min_lin_dim=16,
                      calibration=(img, mask, obs), margin=1.0)
    scales = [p for p in jax.tree_util.tree_leaves_with_path(cal.params)
              if "act_scale" in jax.tree_util.keystr(p[0])]
    assert scales, "no static act_scale leaves after calibration"
    out_cal = cal(img, mask, obs)
    assert np.isfinite(out_cal).all()
    # same sites, scales = per-trajectory max vs per-step dynamic: close
    assert np.abs(out_cal - out_dyn).mean() < 0.1

    cal.save_serving("/tmp/dfm_calib_serving")
    restored = DepthFMPipeline.load_serving("/tmp/dfm_calib_serving")
    out_restored = restored(img, mask, obs)
    np.testing.assert_array_equal(out_restored, out_cal)


def test_quantize_diffusion_weight_only(rng):
    """Weight-only int8 ('w8' trees): wide sites store int8 weights +
    per-channel scales and NO activation quantization; the dequantized
    forward tracks the f32 model tighter than W8A8 (weight rounding is
    the only error source) and the fused upsample path still runs."""
    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.depthfm import (
        DepthFMConfig, depthfm_generate, init_depthfm)
    from amodal_depth_anything_tpu.ops.quant import quantize_diffusion_int8

    cfg = DepthFMConfig(guide_type="mask+observation", model_channels=64,
                        channel_mult=(1, 2), num_heads=2, context_dim=64,
                        vae_channels=(32, 64), vae_layers=1)
    params = jax.jit(lambda k: init_depthfm(k, cfg))(jax.random.PRNGKey(0))
    q = quantize_diffusion_int8(params, min_conv_fan=128, min_lin_dim=48,
                                weight_only=True)

    blk = q["unet"]["input_blocks"]["1"]["0"]["conv1"]
    assert "w" not in blk and blk["w8"].dtype == jnp.int8
    assert "act_scale" not in blk
    assert q["unet"]["out"]["conv"]["w"].dtype != jnp.int8  # skipped
    assert q["vae"]["decoder"]["conv_out"]["w"].dtype != jnp.int8
    aq = q["vae"]["decoder"]["mid_block"]["attentions"]["0"]["to_q"]
    assert aq["w8"].dtype == jnp.int8 and aq["w_scale"].ndim == 1
    # upsampler sites skipped in weight_only mode: the fused-upsample
    # kernel fold would materialize the dequantized f32 kernel anyway
    up = q["vae"]["decoder"]["up_blocks"]["0"]["upsampler"]
    assert "w8" not in up and up["w"].dtype != jnp.int8

    ims = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)
    mask = jnp.ones((1, 32, 32, 1), jnp.float32)
    obs = jnp.zeros((1, 32, 32, 1), jnp.float32)
    ref = np.asarray(depthfm_generate(params, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    got = np.asarray(depthfm_generate(q, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).mean() < 0.04, np.abs(got - ref).mean()


def test_w8_ops_match_dequantized_reference(rng):
    """w8_linear / w8_conv2d / the fused-upsample 'w8' branch must equal
    running the plain op on the explicitly dequantized kernel."""
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.layers import linear
    from amodal_depth_anything_tpu.ops.conv import (conv2d,
                                                    fused_upsample2x_conv)
    from amodal_depth_anything_tpu.ops.quant import (quantize_conv_w8,
                                                     quantize_linear_w8,
                                                     w8_weight)

    lp = {"w": jnp.asarray(rng.standard_normal((48, 64)), jnp.float32),
          "b": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 48)), jnp.float32)
    lq = quantize_linear_w8(lp)
    ref = x @ w8_weight(lq, jnp.float32) + lp["b"]
    np.testing.assert_allclose(np.asarray(linear(lq, x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    cp = {"w": jnp.asarray(rng.standard_normal((3, 3, 16, 32)), jnp.float32),
          "b": jnp.asarray(rng.standard_normal((32,)), jnp.float32)}
    xc = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    cq = quantize_conv_w8(cp)
    ref_c = conv2d({"w": w8_weight(cq, jnp.float32), "b": cp["b"]}, xc,
                   padding=1)
    np.testing.assert_allclose(np.asarray(conv2d(cq, xc, padding=1)),
                               np.asarray(ref_c), rtol=1e-5, atol=1e-5)

    fused_q = np.asarray(fused_upsample2x_conv(cq, xc))
    fused_ref = np.asarray(fused_upsample2x_conv(
        {"w": w8_weight(cq, jnp.float32), "b": cp["b"]}, xc))
    np.testing.assert_allclose(fused_q, fused_ref, rtol=1e-5, atol=1e-5)


def test_heuristics_p2g_int8_knob(rng):
    """MaskHeuristics.quantize_p2g_int8 rebuilds the jitted program and
    the completion stays finite and close to the unquantized one."""
    import jax

    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics

    mh = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    import dataclasses
    mh.p2g_cfg = dataclasses.replace(mh.p2g_cfg, ddim_steps=2)
    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    visible = (rng.random((64, 64)) > 0.5)
    exact = mh.pix2gestalt_completion(image, visible)
    mh.quantize_p2g_int8(weight_only=True)
    got = mh.pix2gestalt_completion(image, visible)
    assert np.isfinite(got).all()
    assert got.shape == exact.shape
    assert np.abs(got - exact).mean() < 0.08, np.abs(got - exact).mean()


def test_pipeline_mixed_scale_quantization(rng):
    """mixed=True: LN-bound scales on qkv/ffn1 + calibrated(+smooth)
    proj/ffn2 — all four families int8, output sane; the hybrid that
    combines the gate-passing LN clip with outlier-migrated coverage."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline.amodal_pipeline import (
        AmodalDepthPipeline)

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    p_am = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)
    img = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
    mask = np.zeros((64, 72), np.float32)
    mask[10:40, 20:60] = 1.0

    ref = AmodalDepthPipeline(p_raw, raw_cfg, p_am, amodal_cfg, size=56,
                              attn_impl="xla")
    base_ref, blend_ref = ref(img, mask)

    q = AmodalDepthPipeline(p_raw, raw_cfg, p_am, amodal_cfg, size=56,
                            attn_impl="xla")
    q.quantize_int8(base=True, amodal=True, calibration=(img, mask),
                    smooth_alpha=0.5, mixed=True)
    blocks = q.params_raw["backbone"]["blocks"]
    for fam in (blocks["attn"]["qkv"], blocks["attn"]["proj"],
                blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
        assert fam["w"].dtype == jnp.int8
    # proj/fc2 carry the smooth migration; qkv/fc1 are plain LN-bound
    assert "smooth" in blocks["attn"]["proj"]
    assert "smooth" not in blocks["attn"]["qkv"]
    base_q, blend_q = q(img, mask)
    assert np.isfinite(blend_q).all()
    assert np.abs(blend_q - blend_ref).max() < 0.3

    # mixed without calibration is an error
    import pytest
    bad = AmodalDepthPipeline(p_raw, raw_cfg, p_am, amodal_cfg, size=56,
                              attn_impl="xla")
    with pytest.raises(ValueError):
        bad.quantize_int8(base=True, mixed=True)


def test_quantize_layer_mask(rng):
    """Per-layer mixed precision (`layer_mask`): the stacked tree carries
    int8 + original weights and a per-layer `use_q` flag; `int8_linear`
    cond-dispatches inside the scan. Masked-out layers are BIT-exact vs
    the unquantized trunk; an all-True mask matches full quantization."""
    import pytest

    from amodal_depth_anything_tpu.models.dinov2 import (
        ViTConfig, dinov2_intermediate_layers, init_dinov2)

    cfg = ViTConfig.preset("vitt")
    params = {"backbone": init_dinov2(jax.random.PRNGKey(0), cfg)}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))

    def taps(p):
        # compare at the DPT taps (random-weight ReLU heads go dead, so
        # head-level deltas are vacuously zero)
        outs = dinov2_intermediate_layers(p["backbone"], cfg, x, None,
                                          (0, 1, 2, 3), attn_impl="xla")
        return np.stack([np.asarray(t) for t, _ in outs])

    exact = taps(params)
    full = taps(quantize_vit_trunk_int8(params))

    m_none = taps(quantize_vit_trunk_int8(
        params, layer_mask=np.zeros(4, bool)))
    np.testing.assert_array_equal(m_none, exact)

    m_all = taps(quantize_vit_trunk_int8(
        params, layer_mask=np.ones(4, bool)))
    np.testing.assert_array_equal(m_all, full)

    mask = np.array([True, False, True, False])
    m_half = taps(quantize_vit_trunk_int8(params, layer_mask=mask))
    assert np.abs(m_half - exact).max() > 0  # something quantized
    assert np.abs(m_half - exact).max() <= np.abs(full - exact).max() * 2

    # calibrated + mask and dynamic + mask both dispatch fine
    stats = collect_trunk_act_stats(
        params, cfg, jnp.asarray(
            rng.random((1, 56, 56, 3), dtype=np.float32)))
    m_cal = taps(quantize_vit_trunk_int8(
        params, act_stats=stats, layer_mask=mask))
    assert np.isfinite(m_cal).all()
    m_dyn = taps(quantize_vit_trunk_int8(
        params, dynamic=True, layer_mask=mask))
    assert np.isfinite(m_dyn).all()

    # wrong mask length and smooth+mask combos fail loudly
    with pytest.raises(ValueError):
        quantize_vit_trunk_int8(params, layer_mask=np.ones(3, bool))
    with pytest.raises(ValueError):
        quantize_vit_trunk_int8(params, act_stats=stats, smooth_alpha=0.5,
                                layer_mask=mask)


def test_pipeline_layer_mask_plumbing(rng):
    """AmodalDepthPipeline.quantize_int8(base_layer_mask=...) restricts
    the base trunk only; masked pipeline output sits between exact and
    fully-quantized."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline.amodal_pipeline import (
        AmodalDepthPipeline)

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    p_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
    p_am = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)
    img = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
    mask = np.zeros((64, 72), np.float32)
    mask[10:40, 20:60] = 1.0

    ref = AmodalDepthPipeline(p_raw, raw_cfg, p_am, amodal_cfg, size=56,
                              attn_impl="xla")
    _, blend_ref = ref(img, mask)

    q = AmodalDepthPipeline(p_raw, raw_cfg, p_am, amodal_cfg, size=56,
                            attn_impl="xla")
    q.quantize_int8(base=True, amodal=True,
                    base_layer_mask=np.array([True, True, False, False]),
                    amodal_layer_mask=np.zeros(4, bool))
    qkv = q.params_raw["backbone"]["blocks"]["attn"]["qkv"]
    assert qkv["w"].dtype == jnp.int8 and "use_q" in qkv
    # amodal mask all-False -> pipeline must still run; the delta stays
    # bounded (random-weight heads can deaden it to zero, so no lower
    # bound here — the trunk-level lower bound lives in
    # test_quantize_layer_mask)
    _, blend_q = q(img, mask)
    assert np.isfinite(blend_q).all()
    assert np.abs(blend_q - blend_ref).max() < 0.5


def test_w4_ops_match_dequantized_reference(rng):
    """Nibble-packed weight-only int4: pack/unpack round-trips exactly;
    w4_linear / w4_conv2d / the fused-upsample 'w4' branch equal the
    plain op on the explicitly dequantized kernel; per-group scales keep
    the dequant error bounded."""
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.layers import linear
    from amodal_depth_anything_tpu.ops.conv import (conv2d,
                                                    fused_upsample2x_conv)
    from amodal_depth_anything_tpu.ops.quant import (_pack_nibbles,
                                                     _unpack_nibbles,
                                                     quantize_conv_w4,
                                                     quantize_linear_w4,
                                                     w4_weight)

    q = jnp.asarray(rng.integers(-8, 8, (6, 4)), jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(_unpack_nibbles(_pack_nibbles(q, 0), 0)), np.asarray(q))
    q2 = jnp.asarray(rng.integers(-8, 8, (3, 3, 8, 5)), jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(_unpack_nibbles(_pack_nibbles(q2, 2), 2)),
        np.asarray(q2))

    lp = {"w": jnp.asarray(rng.standard_normal((128, 64)), jnp.float32),
          "b": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 128)), jnp.float32)
    lq = quantize_linear_w4(lp)
    assert lq["w4"].shape == (64, 64)  # packed along the input axis
    ref = x @ w4_weight(lq, jnp.float32) + lp["b"]
    np.testing.assert_allclose(np.asarray(linear(lq, x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # dequant error bounded by half an int4 step of the group scale
    wd = np.asarray(w4_weight(lq, jnp.float32))
    werr = np.abs(wd - np.asarray(lp["w"])).max()
    assert werr < np.abs(np.asarray(lp["w"])).max() / 7.0, werr

    cp = {"w": jnp.asarray(rng.standard_normal((3, 3, 16, 32)),
                           jnp.float32),
          "b": jnp.asarray(rng.standard_normal((32,)), jnp.float32)}
    xc = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    cq = quantize_conv_w4(cp)
    assert cq["w4"].shape == (3, 3, 8, 32)
    ref_c = conv2d({"w": w4_weight(cq, jnp.float32), "b": cp["b"]}, xc,
                   padding=1)
    np.testing.assert_allclose(np.asarray(conv2d(cq, xc, padding=1)),
                               np.asarray(ref_c), rtol=1e-5, atol=1e-5)

    fused_q = np.asarray(fused_upsample2x_conv(cq, xc))
    fused_ref = np.asarray(fused_upsample2x_conv(
        {"w": w4_weight(cq, jnp.float32), "b": cp["b"]}, xc))
    np.testing.assert_allclose(fused_q, fused_ref, rtol=1e-5, atol=1e-5)


def test_quantize_diffusion_w4(rng):
    """bits=4 weight-only over a diffusion tree: wide sites pack to half
    the int8 bytes, skip rules still apply, the generate forward stays
    close to f32; bits=4 without weight_only raises."""
    import pytest

    import jax
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.models.depthfm import (
        DepthFMConfig, depthfm_generate, init_depthfm)
    from amodal_depth_anything_tpu.ops.quant import quantize_diffusion_int8

    cfg = DepthFMConfig(guide_type="mask+observation", model_channels=64,
                        channel_mult=(1, 2), num_heads=2, context_dim=64,
                        vae_channels=(32, 64), vae_layers=1)
    params = jax.jit(lambda k: init_depthfm(k, cfg))(jax.random.PRNGKey(0))
    q = quantize_diffusion_int8(params, min_conv_fan=128, min_lin_dim=48,
                                weight_only=True, bits=4)

    blk = q["unet"]["input_blocks"]["1"]["0"]["conv1"]
    assert "w" not in blk and blk["w4"].dtype == jnp.int8
    w_orig = params["unet"]["input_blocks"]["1"]["0"]["conv1"]["w"]
    assert blk["w4"].size == w_orig.size // 2  # nibble-packed
    assert q["unet"]["out"]["conv"]["w"].dtype != jnp.int8  # skipped
    up = q["vae"]["decoder"]["up_blocks"]["0"]["upsampler"]
    assert "w4" not in up and "w8" not in up

    ims = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)
    mask = jnp.ones((1, 32, 32, 1), jnp.float32)
    obs = jnp.zeros((1, 32, 32, 1), jnp.float32)
    ref = np.asarray(depthfm_generate(params, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    got = np.asarray(depthfm_generate(q, cfg, jax.random.PRNGKey(1),
                                      ims, num_steps=2, guide_mask=mask,
                                      observation=obs, attn_impl="xla"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).mean() < 0.08, np.abs(got - ref).mean()

    with pytest.raises(ValueError):
        quantize_diffusion_int8(params, weight_only=False, bits=4)


def test_heuristics_p2g_w4_knob(rng):
    """quantize_p2g_int8(bits=4): the int4 UNet completion stays finite
    and close to exact."""
    import dataclasses

    import jax

    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics

    mh = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)
    mh.p2g_cfg = dataclasses.replace(mh.p2g_cfg, ddim_steps=2)
    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    visible = (rng.random((64, 64)) > 0.5)
    exact = mh.pix2gestalt_completion(image, visible)
    mh.quantize_p2g_int8(weight_only=True, bits=4)
    got = mh.pix2gestalt_completion(image, visible)
    assert np.isfinite(got).all()
    assert np.abs(got - exact).mean() < 0.15, np.abs(got - exact).mean()
