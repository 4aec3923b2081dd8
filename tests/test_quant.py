"""Opt-in int8 W8A8 serving path: quant error bounds and transparent
dispatch through the scan-stacked dinov2 trunk."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.layers import linear
from amodal_depth_anything_tpu.ops.quant import (int8_linear,
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
