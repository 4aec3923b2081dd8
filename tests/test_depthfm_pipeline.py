"""DepthFMPipeline: the generative family's serving API (tiny models).

Covers the user-facing contract (uint8-in / [0,1]-float-out, batching,
guide validation), the from_checkpoints torch round trip through real
files (load_depthfm_ckpt conv-in widening + VAE topology inference), and
the serving-optimization knobs (dynamic int8, ToMe).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.pipeline import DepthFMPipeline


def _inputs(rng, hw=(40, 48)):
    img = (rng.random((*hw, 3)) * 255).astype(np.uint8)
    mask = (rng.random(hw) > 0.5).astype(np.float32)
    obs = rng.random(hw).astype(np.float32)
    return img, mask, obs


def test_depthfm_pipeline_amodal(rng):
    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2)

    img, mask, obs = _inputs(rng)
    out = pipe(img, mask, obs)
    assert out.shape == (32, 32) and out.dtype == np.float32
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0

    # batched: [B,H,W,...] in -> [B,S,S] out, row 0 equal to the
    # unbatched result (same per-sample program)
    imgs = np.stack([img, img[::-1]])
    outs = pipe(imgs, np.stack([mask, mask]), np.stack([obs, obs]))
    assert outs.shape == (2, 32, 32)
    np.testing.assert_allclose(outs[0], out, atol=1e-5)

    with pytest.raises(ValueError, match="requires mask"):
        pipe(img, None, obs)
    with pytest.raises(ValueError, match="requires observation"):
        pipe(img, mask, None)


def test_depthfm_pipeline_plain_and_optimizations(rng):
    model = get_model("DepthFM", tiny=True)  # guide_type="none"
    params = model.init(jax.random.PRNGKey(1))
    img, _, _ = _inputs(rng)

    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2)
    d1 = pipe.predict_depth(img, ensemble_size=2)
    assert d1.shape == (32, 32) and np.isfinite(d1).all()
    assert d1.min() >= 0.0 and d1.max() <= 1.0

    # ToMe-SD knob: force merging at the tiny token count (4x4 latent
    # -> 16 tokens at the transformer level); result stays finite and
    # differs from the exact path
    pipe_tome = DepthFMPipeline(params, model.config, size=32, num_steps=2,
                                tome=(0.5, 8))
    d2 = pipe_tome.predict_depth(img, ensemble_size=2)
    assert np.isfinite(d2).all()

    # dynamic int8: with the width gates lowered to cover the tiny
    # layers, the params actually change dtype and the output moves but
    # stays close (at default thresholds a tiny model is untouched)
    pipe.quantize_int8(min_conv_fan=1, min_lin_dim=1)
    leaves = jax.tree.leaves(pipe.params["unet"])
    assert any(getattr(a, "dtype", None) == jnp.int8 for a in leaves)
    d3 = pipe.predict_depth(img, ensemble_size=2)
    assert np.isfinite(d3).all()
    assert not np.array_equal(d3, d1)
    assert np.abs(d3 - d1).mean() < 0.2


def test_depthfm_pipeline_dp_mesh(rng):
    """Data-parallel serving: batch sharded over the mesh's 'data' axis,
    result equal to the unsharded pipeline."""
    from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh

    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    img, mask, obs = _inputs(rng)
    imgs = np.stack([img, img[::-1]])
    masks, obss = np.stack([mask, mask]), np.stack([obs, obs])

    ref = DepthFMPipeline(params, model.config, size=32, num_steps=2)
    want = ref(imgs, masks, obss)

    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])
    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2,
                           mesh=mesh)
    got = pipe(imgs, masks, obss)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depthfm_pipeline_from_checkpoints(rng, tmp_path):
    """Real-file round trip: emit a tiny depthfm-v1.ckpt (8-in UNet +
    hparams + empty text embedding, reference `dfm_amodal.py:91-142`
    layout) and a diffusers-layout VAE .pth, then from_checkpoints must
    rebuild the widened amodal model and run."""
    import torch
    from test_convert_depthfm import emit_unet_sd, emit_vae_sd

    from amodal_depth_anything_tpu.models.depthfm import DepthFMConfig
    from amodal_depth_anything_tpu.models.unet_ldm import (UNetConfig,
                                                           init_unet)
    from amodal_depth_anything_tpu.models.vae import VAEConfig, init_vae

    # the checkpoint's UNet is the UNWIDENED 8-in base (conv-in widening
    # happens at load); hparams carry the rest of the topology
    base_unet_cfg = UNetConfig(in_channels=8, model_channels=32,
                               channel_mult=(1, 2), num_heads=2,
                               context_dim=32)
    unet_params = jax.jit(lambda k: init_unet(k, base_unet_cfg))(
        jax.random.PRNGKey(2))
    unet_sd = {k: torch.from_numpy(np.array(v))
               for k, v in emit_unet_sd(unet_params, base_unet_cfg).items()}
    ckpt = {
        "ldm_hparams": {"context_dim": 32, "model_channels": 32,
                        "channel_mult": [1, 2], "num_heads": 2},
        "noising_step": 400,
        "state_dict": unet_sd,
        "empty_text_embedding": np.zeros((7, 32), np.float32),
    }
    ckpt_path = tmp_path / "depthfm-v1.ckpt"
    torch.save(ckpt, ckpt_path)

    vae_cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    vae_params = jax.jit(lambda k: init_vae(k, vae_cfg))(
        jax.random.PRNGKey(3))
    vae_sd = {k: torch.from_numpy(np.array(v))
              for k, v in emit_vae_sd(vae_params).items()}
    vae_path = tmp_path / "vae.pth"
    torch.save(vae_sd, vae_path)

    pipe = DepthFMPipeline.from_checkpoints(
        str(ckpt_path), str(vae_path), size=32, num_steps=2)
    assert pipe.cfg.guide_type == "mask+observation"
    # VAE topology and context length inferred from the files
    assert pipe.cfg.vae_channels == (16, 32)
    assert pipe.cfg.vae_layers == 1 and pipe.cfg.context_len == 7
    # conv-in widened 8 -> 10 with zero guidance channels
    w = pipe.params["unet"]["input_blocks"]["0"]["0"]["w"]
    assert w.shape[2] == 10
    assert float(jnp.abs(w[:, :, 8:, :]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(w[:, :, :8, :], np.float32),
                               np.asarray(unet_params["input_blocks"]["0"]
                                          ["0"]["w"], np.float32))

    img, mask, obs = _inputs(rng)
    out = pipe(img, mask, obs)
    assert out.shape == (32, 32) and np.isfinite(out).all()


def test_depthfm_pipeline_matches_model_apply(rng):
    """The pipeline's fused graph equals the registry apply on
    pre-processed inputs (same conventions: rgb [-1,1] bilinear, mask
    0/1 nearest, observation bilinear)."""
    from amodal_depth_anything_tpu.ops.resize import (resize2d,
                                                      resize_nearest)

    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2,
                           seed=5)
    img, mask, obs = _inputs(rng)
    got = pipe(img, mask, obs)

    s = (32, 32)
    rgb = resize2d(jnp.asarray(img[None], jnp.float32) / 255.0,
                   size=s, method="bilinear") * 2.0 - 1.0
    m = (resize_nearest(jnp.asarray(mask[None, :, :, None]), size=s) > 0
         ).astype(jnp.float32)
    o = resize2d(jnp.asarray(obs[None, :, :, None]), size=s,
                 method="bilinear")
    want = model.apply(params, rgb, rng=jax.random.PRNGKey(5), mode="eval",
                       num_steps=2, guide_mask=m, observation=o,
                       attn_impl=None)
    np.testing.assert_allclose(got, np.asarray(want[0, ..., 0], np.float32),
                               atol=1e-5)


def test_depthfm_pipeline_serving_save_load_roundtrip(rng, tmp_path):
    """save_serving/load_serving restores the quantized serving state
    bit-identically (no re-cast, no re-quantization)."""
    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2,
                           dtype=jnp.bfloat16, tome=(0.5, 4))
    pipe.quantize_int8(min_conv_fan=8, min_lin_dim=4)

    img, mask, obs = _inputs(rng)
    want = pipe(img, mask, obs)

    path = str(tmp_path / "serving")
    pipe.save_serving(path)
    loaded = DepthFMPipeline.load_serving(path)
    assert loaded.size == 32 and loaded.num_steps == 2
    assert loaded.dtype == jnp.bfloat16 and loaded.tome == (0.5, 4)
    got = loaded(img, mask, obs)
    np.testing.assert_array_equal(got, want)
