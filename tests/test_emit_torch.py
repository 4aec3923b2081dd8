"""Round-trips for the remaining convert/emit_torch.py inverse emitters
(DAV2 raw+amodal, pix2gestalt ckpt layout, CLIP vision) — the
SAM/RMBG/ZoeDepth/UNet/VAE emitters are covered by their own
test_convert_* files. These are what `verify_checkpoints --rehearse`
synthesizes checkpoint-day stand-ins with."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert import emit_torch as E
from amodal_depth_anything_tpu.convert.heuristics_convert import (
    convert_clip_vision, convert_pix2gestalt_unet)
from amodal_depth_anything_tpu.convert.torch_to_jax import (convert_dav2,
                                                            infer_dav2_config)
from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          init_amodal_dav2)
from amodal_depth_anything_tpu.models.clip_vit import (CLIPVisionConfig,
                                                       init_clip_vision)
from amodal_depth_anything_tpu.models.unet_ldm import UNetConfig, init_unet


def _paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _check(a, b):
    pa, pb = _paths(a), _paths(b)
    assert set(pa) == set(pb), set(pa) ^ set(pb)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)


def test_dav2_emit_roundtrip_amodal_and_raw():
    for raw, gt in ((False, "mask+observation"), (True, "none")):
        cfg = DAV2Config(encoder="vitt", guide_type=gt, raw=raw)
        params = jax.jit(lambda k, c=cfg: init_amodal_dav2(k, c))(
            jax.random.PRNGKey(0))
        sd = E.emit_dav2_sd(params, cfg)
        # the emitted layout must be config-inferable, like the published
        # checkpoints (torch_to_jax.infer_dav2_config)
        inferred = infer_dav2_config(sd)
        assert inferred.raw == raw
        if not raw:
            assert inferred.guide_type == gt
        _check(params, convert_dav2(sd, cfg))


def test_pix2gestalt_ckpt_emit_roundtrip():
    """epoch=000005.ckpt layout: UNet under model.diffusion_model. with
    the 8-channel conv_in (4 noisy latent + 4 conditioning latent,
    reference app.py:53-57); cc_projection emitted alongside."""
    cfg = UNetConfig(in_channels=8, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=32,
                     use_linear_in_transformer=False)
    params = jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(5))
    cc = {"w": np.zeros((772, 768), np.float32),
          "b": np.zeros((768,), np.float32)}
    sd = E.emit_pix2gestalt_ckpt_sd(params, cfg, cc_projection=cc)
    assert sd["cc_projection.weight"].shape == (768, 772)
    assert sd["model.diffusion_model.input_blocks.0.0.weight"].shape[1] == 8
    _check(params, convert_pix2gestalt_unet(sd, cfg))


def test_clip_vision_emit_roundtrip():
    cfg = CLIPVisionConfig(width=32, depth=2, num_heads=2, image_size=32,
                           patch_size=16, projection_dim=16)
    params = jax.jit(lambda k: init_clip_vision(k, cfg))(jax.random.PRNGKey(6))
    _check(params, convert_clip_vision(E.emit_clip_vision_sd(params, cfg),
                                       cfg))
