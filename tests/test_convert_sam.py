"""SAM converter round-trip: the package emitter (inverse transforms)
against convert_sam — exact recovery."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.emit_torch import emit_sam_sd
from amodal_depth_anything_tpu.convert.sam_convert import convert_sam
from amodal_depth_anything_tpu.models.sam import SAMConfig, init_sam


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_sam_converter_roundtrip():
    cfg = SAMConfig(img_size=64, embed_dim=32, depth=2, num_heads=2,
                    window_size=2, global_blocks=(1,), out_chans=32,
                    decoder_dim=32, decoder_heads=2)
    params = jax.jit(lambda k: init_sam(k, cfg))(jax.random.PRNGKey(0))

    converted = convert_sam(emit_sam_sd(params), cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
