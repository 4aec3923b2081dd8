"""DepthFM generative branch tests (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.models.depthfm import cosine_alpha_bar, q_sample
from amodal_depth_anything_tpu.models.unet_ldm import (UNetConfig, apply_unet,
                                                       build_plan, init_unet,
                                                       timestep_embedding)
from amodal_depth_anything_tpu.models.vae import (VAEConfig, init_vae,
                                                  vae_decode, vae_encode_mode)

HW = 32  # latent 4x4 with /8 VAE


def test_timestep_embedding_matches_torch_formula(rng):
    import math
    import torch
    t = np.array([0.0, 0.25, 10.0], np.float32)
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 64))
    half = 32
    freqs = torch.exp(-math.log(10000) *
                      torch.arange(half, dtype=torch.float32) / half)
    args = torch.from_numpy(t)[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_unet_plan_matches_reference_topology():
    """SD-1.5 UNet at DepthFM hparams: 12 input blocks, 3-layer middle,
    12 output blocks (openaimodel.py main-block construction)."""
    inp, mid, out = build_plan(UNetConfig())
    assert len(inp) == 12
    assert len(out) == 12
    assert [k for k, _ in mid] == ["res", "attn", "res"]
    # levels 0-2 have attention (ds 1,2,4); level 3 (ds 8) does not
    kinds = [[k for k, _ in layers] for layers in inp]
    assert kinds[1] == ["res", "attn"]
    assert kinds[10] == ["res"]  # ds=8 level: no attn
    assert kinds[3] == ["down"]


def test_unet_forward_shapes(rng):
    cfg = UNetConfig(in_channels=10, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=16)
    params = jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 8, 8, 6), dtype=np.float32))
    ctx_ca = jnp.asarray(rng.standard_normal((2, 7, 16), dtype=np.float32))
    t = jnp.asarray([0.1, 0.9], jnp.float32)
    out = jax.jit(lambda p, x, t, c, cc: apply_unet(p, cfg, x, t, c, cc,
                                                    attn_impl="xla"))(
        params, x, t, ctx, ctx_ca)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    params = jax.jit(lambda k: init_vae(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    z = jax.jit(lambda p, x: vae_encode_mode(p, x, cfg))(params, x)
    assert z.shape == (1, 8, 8, 4)  # one downsample for 2 blocks
    y = jax.jit(lambda p, z: vae_decode(p, z, cfg))(params, z)
    assert y.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_cosine_schedule_monotone():
    t = jnp.linspace(0.01, 0.99, 50)
    ab = np.asarray(cosine_alpha_bar(t))
    assert (np.diff(ab) < 0).all()
    assert 0 <= ab.min() and ab.max() <= 1
    x = jnp.ones((1, 4, 4, 4))
    noised = q_sample(x, 400, jnp.zeros_like(x))
    assert np.isfinite(np.asarray(noised)).all()


def test_depthfm_train_and_generate(rng):
    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    ims = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32)) * 2 - 1
    depth = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    mask = jnp.ones((1, HW, HW, 1), jnp.float32)
    obs = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))

    pred, target = model.apply(params, ims, rng=jax.random.PRNGKey(1),
                               mode="train", depth=depth, guide_mask=mask,
                               observation=obs, attn_impl="xla")
    # tiny VAE has 2 blocks -> one /2 downsample
    assert pred.shape == target.shape == (1, HW // 2, HW // 2, 4)
    assert np.isfinite(np.asarray(pred)).all()

    gen = model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                      num_steps=2, guide_mask=mask, observation=obs,
                      attn_impl="xla")
    assert gen.shape == (1, HW, HW, 1)
    g = np.asarray(gen)
    assert np.isfinite(g).all() and g.min() >= 0 and g.max() <= 1


def test_unet_remat_grads_match(rng):
    """remat=True (per-level jax.checkpoint, the reference's
    use_checkpoint contract) must not change values or gradients."""
    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    ims = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32)) * 2 - 1
    depth = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    mask = jnp.ones((1, HW, HW, 1), jnp.float32)
    obs = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))

    def loss(unet, remat):
        p = {**params, "unet": unet}
        pred, target = model.apply(p, ims, rng=jax.random.PRNGKey(1),
                                   mode="train", depth=depth,
                                   guide_mask=mask, observation=obs,
                                   attn_impl="xla", remat=remat)
        return jnp.mean((pred - target) ** 2)

    l0, g0 = jax.value_and_grad(lambda u: loss(u, False))(params["unet"])
    l1, g1 = jax.value_and_grad(lambda u: loss(u, True))(params["unet"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)


def test_depthfm_conv_in_zero_guidance_channels():
    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    w = np.asarray(params["unet"]["input_blocks"]["0"]["0"]["w"])
    assert w.shape[2] == 10  # 8 + mask + observation
    assert np.all(w[:, :, 8:, :] == 0)
    assert np.any(w[:, :, :8, :] != 0)


def test_depthfm_predict_depth_plain(rng):
    """Plain-DepthFM inference (reference dfm.py:59-94, the pseudo-label
    factory's labeler): in-batch ensembling, channel+ensemble mean,
    exp + per-sample min-max, NO 1-x flip."""
    from amodal_depth_anything_tpu.models.depthfm import (
        DepthFMConfig, depthfm_predict_depth, init_depthfm)

    cfg = DepthFMConfig(guide_type="none", model_channels=16,
                        channel_mult=(1, 2), num_heads=2, context_dim=16,
                        vae_channels=(16, 32), vae_layers=1)
    params = jax.jit(lambda k: init_depthfm(k, cfg))(jax.random.PRNGKey(0))
    ims = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)

    d1 = np.asarray(depthfm_predict_depth(params, cfg,
                                          jax.random.PRNGKey(1), ims,
                                          num_steps=2, attn_impl="xla"))
    assert d1.shape == (1, 32, 32, 1)
    assert d1.min() >= 0.0 and d1.max() <= 1.0
    assert abs(d1.max() - 1.0) < 1e-5  # min-max normalized

    d3 = np.asarray(depthfm_predict_depth(params, cfg,
                                          jax.random.PRNGKey(1), ims,
                                          num_steps=2, ensemble_size=3,
                                          attn_impl="xla"))
    assert d3.shape == (1, 32, 32, 1)
    assert not np.allclose(d1, d3)  # ensembling changes the estimate

    with pytest.raises(AssertionError):
        depthfm_predict_depth(params, cfg, jax.random.PRNGKey(1),
                              jnp.repeat(ims, 2, 0), ensemble_size=2,
                              attn_impl="xla")


def test_sam_pl_gen_depthfm_script(tmp_path, monkeypatch, rng):
    """Factory script end-to-end with tiny models injected at the
    converter seams: chunking, id derivation, uint16 label output."""
    from PIL import Image

    from amodal_depth_anything_tpu.convert import depthfm_convert
    from amodal_depth_anything_tpu.convert import torch_to_jax
    from amodal_depth_anything_tpu.models.depthfm import (DepthFMConfig,
                                                          init_depthfm)
    from amodal_depth_anything_tpu.scripts import sam_pl_gen_depthfm

    cfg = DepthFMConfig(guide_type="none", model_channels=16,
                        channel_mult=(1, 2), num_heads=2, context_dim=16,
                        vae_channels=(16, 32), vae_layers=1)
    full = jax.jit(lambda k: init_depthfm(k, cfg))(jax.random.PRNGKey(0))

    monkeypatch.setattr(
        depthfm_convert, "load_depthfm_ckpt",
        lambda path, guide_type="none": (cfg, {
            "unet": full["unet"],
            "empty_text_embed": full["empty_text_embed"]}))
    monkeypatch.setattr(depthfm_convert, "convert_sd_vae",
                        lambda sd, **kw: full["vae"])
    monkeypatch.setattr(torch_to_jax, "load_state_dict", lambda p: {})

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for sid in ("11", "22", "33"):
        im = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(im).save(img_dir / f"sa_{sid}.jpg")
    (tmp_path / "split.txt").write_text("11\n22\n33\n")

    out = tmp_path / "depth"
    sam_pl_gen_depthfm.main([
        "--image_dir", str(img_dir), "--split", str(tmp_path / "split.txt"),
        "--ckpt", "fake.ckpt", "--vae_ckpt", "fake_vae.safetensors",
        "--out_dir", str(out), "--num_steps", "2", "--ensemble", "2",
        "--size", "32", "--dtype", "float32",
        "--data_index", "1", "--num_chunks", "2"])
    files = sorted(p.name for p in out.iterdir())
    assert files == ["33_depth.png"]  # chunk 1 of 2 over 3 ids
    d = np.asarray(Image.open(out / "33_depth.png"))
    assert d.dtype == np.uint16 and d.shape == (32, 32)

    # opt-in DeepCache path through the factory CLI (1 id via chunking)
    out_dc = tmp_path / "depth_dc"
    sam_pl_gen_depthfm.main([
        "--image_dir", str(img_dir), "--split", str(tmp_path / "split.txt"),
        "--ckpt", "fake.ckpt", "--vae_ckpt", "fake_vae.safetensors",
        "--out_dir", str(out_dc), "--num_steps", "2", "--ensemble", "2",
        "--size", "32", "--dtype", "float32", "--deep_cache", "2,2",
        "--data_index", "0", "--num_chunks", "3"])
    assert sorted(p.name for p in out_dc.iterdir()) == ["11_depth.png"]


# ------------------------------------------------------- DeepCache caching

def _jitter_tree(tree, scale=0.02, seed=99):
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(treedef, [
        a + scale * jax.random.normal(k, a.shape, a.dtype)
        for a, k in zip(leaves, keys)])


def test_parse_deep_cache_specs():
    """One parser for every knob surface (bench env, CLI flags): the
    gated recommendations are group-tuned tuples ('2,2'), so 'N,G' must
    round-trip; bare ints / 'N' keep the historical groups-3 default."""
    from amodal_depth_anything_tpu.ops.ddim import parse_deep_cache
    assert parse_deep_cache(None) is None
    assert parse_deep_cache("") is None
    assert parse_deep_cache(0) is None
    assert parse_deep_cache("0") is None
    assert parse_deep_cache(2) == (2, 3)
    assert parse_deep_cache("2") == (2, 3)
    assert parse_deep_cache("2,2") == (2, 2)
    assert parse_deep_cache("5,1") == (5, 1)
    assert parse_deep_cache("4", default_groups=2) == (4, 2)
    assert parse_deep_cache((2, 2)) == (2, 2)      # tuple passthrough
    assert parse_deep_cache([5, 1]) == (5, 1)      # json-loaded list


def test_unet_deep_cache_splice_is_exact_on_same_input(rng):
    """With identical (x, t), the shallow pass spliced with the captured
    deep feature must reproduce the full pass BIT-EXACTLY — the DeepCache
    approximation lives only in reusing the feature across steps."""
    cfg = UNetConfig(in_channels=4, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=16)
    params = _jitter_tree(
        jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    cc = jnp.asarray(rng.standard_normal((2, 7, 16), dtype=np.float32))
    t = jnp.asarray([0.3, 0.7], jnp.float32)

    full = jax.jit(lambda p, x, t, cc: apply_unet(
        p, cfg, x, t, None, cc, attn_impl="xla"))(params, x, t, cc)
    y, deep = jax.jit(lambda p, x, t, cc: apply_unet(
        p, cfg, x, t, None, cc, attn_impl="xla", deep_cache_groups=2))(
        params, x, t, cc)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(full))
    y2 = jax.jit(lambda p, x, t, cc, d: apply_unet(
        p, cfg, x, t, None, cc, attn_impl="xla", deep_cache_groups=2,
        cached_deep=d))(params, x, t, cc, deep)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(full))


def test_unet_deep_cache_groups_validation(rng):
    cfg = UNetConfig(in_channels=4, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=16)
    params = jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    cc = jnp.zeros((1, 7, 16), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    with pytest.raises(ValueError, match="deep_cache_groups"):
        apply_unet(params, cfg, x, t, None, cc, attn_impl="xla",
                   deep_cache_groups=6)  # == len(inp): nothing cached


def test_depthfm_deep_cache_interval1_is_bit_exact(rng):
    """interval=1 = every Euler step full — must match the plain path
    bit-for-bit (proves the deep-cache plumbing is a pure refactor)."""
    model = get_model("DepthFMAmodal", tiny=True)
    params = _jitter_tree(model.init(jax.random.PRNGKey(0)))
    ims = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32)) * 2 - 1
    mask = jnp.ones((1, HW, HW, 1), jnp.float32)
    obs = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    plain = model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                        num_steps=2, guide_mask=mask, observation=obs,
                        attn_impl="xla")
    cached = model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                         num_steps=2, guide_mask=mask, observation=obs,
                         attn_impl="xla", deep_cache=(1, 2))
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(plain))


def test_depthfm_deep_cache_interval2(rng):
    """interval=2 over 2 steps: 1 full + 1 shallow; output stays a valid
    depth map and is CLOSE to the exact path (same weights/noise)."""
    model = get_model("DepthFMAmodal", tiny=True)
    params = _jitter_tree(model.init(jax.random.PRNGKey(0)))
    ims = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32)) * 2 - 1
    mask = jnp.ones((1, HW, HW, 1), jnp.float32)
    obs = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    exact = model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                        num_steps=2, guide_mask=mask, observation=obs,
                        attn_impl="xla")
    dc = model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                     num_steps=2, guide_mask=mask, observation=obs,
                     attn_impl="xla", deep_cache=(2, 2))
    d = np.asarray(dc)
    assert np.isfinite(d).all() and d.min() >= 0 and d.max() <= 1
    # approximation, not garbage (jittered weights keep signal non-zero)
    assert np.abs(d - np.asarray(exact)).mean() < 0.2

    with pytest.raises(ValueError, match="must divide"):
        model.apply(params, ims, rng=jax.random.PRNGKey(2), mode="eval",
                    num_steps=3, guide_mask=mask, observation=obs,
                    attn_impl="xla", deep_cache=(2, 2))
