"""ZoeDepth converter round-trip (tiny config) via the package emitter."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.emit_torch import emit_zoedepth_sd
from amodal_depth_anything_tpu.convert.zoedepth_convert import convert_zoedepth
from amodal_depth_anything_tpu.models.beit import BEiTConfig
from amodal_depth_anything_tpu.models.zoedepth import (ZoeDepthConfig,
                                                       init_zoedepth)


def test_zoedepth_converter_roundtrip():
    cfg = ZoeDepthConfig(
        backbone=BEiTConfig(embed_dim=64, depth=2, num_heads=2, img_size=64,
                            in_chans=5),
        hooks=(0, 1), tap_channels=(8, 16, 32, 32), features=16,
        n_bins=8, bin_embedding_dim=16, n_attractors=(4, 2, 2, 1),
        midas_out=8)
    params = jax.jit(lambda k: init_zoedepth(k, cfg))(jax.random.PRNGKey(0))

    sd = emit_zoedepth_sd(params)  # module.-prefixed, as shipped
    assert all(k.startswith("module.") for k in sd)
    converted = convert_zoedepth(sd, cfg)
    a = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    b = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
         jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
