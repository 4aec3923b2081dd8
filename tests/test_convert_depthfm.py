"""UNet/VAE converter round-trip: the package's inverse emitters
(convert/emit_torch.py) against the converters — exact structural +
numerical identity."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.depthfm_convert import (convert_ldm_unet,
                                                               convert_sd_vae)
# emitters live in the package since round 3; re-exported here because
# test_verify_checkpoints/test_depthfm_pipeline import them from this module
from amodal_depth_anything_tpu.convert.emit_torch import (emit_unet_sd,
                                                          emit_vae_sd)
from amodal_depth_anything_tpu.models.unet_ldm import UNetConfig, init_unet
from amodal_depth_anything_tpu.models.vae import VAEConfig, init_vae


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_unet_converter_roundtrip():
    cfg = UNetConfig(in_channels=10, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=16)
    params = jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(3))
    sd = emit_unet_sd(params, cfg)
    converted = convert_ldm_unet(sd, cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_vae_converter_roundtrip():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    params = jax.jit(lambda k: init_vae(k, cfg))(jax.random.PRNGKey(4))
    sd = emit_vae_sd(params)
    converted = convert_sd_vae(sd, n_down_blocks=2, layers_per_block=1)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
