"""Model-level tests: shapes, guidance zero-init no-op, converter round-trip,
Pallas-vs-XLA attention parity (interpret mode), gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.convert.torch_to_jax import (convert_dav2,
                                                            infer_dav2_config)
from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config, init_amodal_dav2
from amodal_depth_anything_tpu.ops.flash_attention import mha, mha_reference

# Tiny test geometry: 56x56 inputs -> 4x4 patch grid (patch 14)
HW = 56


def tiny_cfg(**kw):
    return DAV2Config(encoder="vitt", **kw)


def test_amodal_forward_shapes(rng):
    model = get_model("AmodalDAv2", encoder="vitt")
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32))
    m = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32)) * 2 - 1
    o = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32)) * 2 - 1
    out = model.apply(params, x, guide_mask=m, observation=o, attn_impl="xla")
    assert out.shape == (1, HW, HW, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_raw_forward_shapes(rng):
    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, HW, HW, 3), dtype=np.float32))
    out = model.apply(params, x, attn_impl="xla")
    assert out.shape == (2, HW, HW)
    assert np.all(np.asarray(out) >= 0)


def test_zero_guidance_is_noop(rng):
    """Zero-initialized guidance patch-embed must not change the output
    (reference zero-init contract, dav2.py:54-61)."""
    key = jax.random.PRNGKey(1)
    guided = get_model("AmodalDAv2", encoder="vitt",
                       guide_type="mask+observation")
    pg = guided.init(key)

    x = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32))
    m = jnp.ones((1, HW, HW, 1), jnp.float32)
    o = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    out1 = guided.apply(pg, x, guide_mask=m, observation=o, attn_impl="xla")
    out2 = guided.apply(pg, x, guide_mask=-m, observation=o * 0.5,
                        attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def _fake_torch_sd(cfg: DAV2Config, seed=0):
    """Random state dict with the reference's torch key names/layouts."""
    nrng = np.random.default_rng(seed)
    params = init_amodal_dav2(jax.random.PRNGKey(seed), cfg)

    sd = {}
    prefix = "" if cfg.raw else "encoder."
    vit = cfg.vit

    def r(*shape):
        return nrng.standard_normal(shape).astype(np.float32) * 0.05

    d = vit.embed_dim
    sd[f"{prefix}pretrained.cls_token"] = r(1, 1, d)
    sd[f"{prefix}pretrained.pos_embed"] = r(1, vit.num_patches + 1, d)
    sd[f"{prefix}pretrained.mask_token"] = r(1, d)
    sd[f"{prefix}pretrained.patch_embed.proj.weight"] = r(d, 3, 14, 14)
    sd[f"{prefix}pretrained.patch_embed.proj.bias"] = r(d)
    if vit.guide_channels:
        sd[f"{prefix}pretrained.patch_embed_guidance.proj.weight"] = \
            r(d, vit.guide_channels, 14, 14)
        sd[f"{prefix}pretrained.patch_embed_guidance.proj.bias"] = r(d)
    for i in range(vit.depth):
        b = f"{prefix}pretrained.blocks.{i}."
        sd[f"{b}norm1.weight"], sd[f"{b}norm1.bias"] = r(d), r(d)
        sd[f"{b}norm2.weight"], sd[f"{b}norm2.bias"] = r(d), r(d)
        sd[f"{b}attn.qkv.weight"], sd[f"{b}attn.qkv.bias"] = r(3 * d, d), r(3 * d)
        sd[f"{b}attn.proj.weight"], sd[f"{b}attn.proj.bias"] = r(d, d), r(d)
        sd[f"{b}ls1.gamma"], sd[f"{b}ls2.gamma"] = r(d), r(d)
        hid = int(d * 4)
        sd[f"{b}mlp.fc1.weight"], sd[f"{b}mlp.fc1.bias"] = r(hid, d), r(hid)
        sd[f"{b}mlp.fc2.weight"], sd[f"{b}mlp.fc2.bias"] = r(d, hid), r(d)
    sd[f"{prefix}pretrained.norm.weight"] = r(d)
    sd[f"{prefix}pretrained.norm.bias"] = r(d)

    dpt = cfg.dpt
    hp = f"{prefix}depth_head."
    for i, ch in enumerate(dpt.out_channels):
        sd[f"{hp}projects.{i}.weight"] = r(ch, d, 1, 1)
        sd[f"{hp}projects.{i}.bias"] = r(ch)
    c0, c1, _, c3 = dpt.out_channels
    sd[f"{hp}resize_layers.0.weight"] = r(c0, c0, 4, 4)
    sd[f"{hp}resize_layers.0.bias"] = r(c0)
    sd[f"{hp}resize_layers.1.weight"] = r(c1, c1, 2, 2)
    sd[f"{hp}resize_layers.1.bias"] = r(c1)
    sd[f"{hp}resize_layers.3.weight"] = r(c3, c3, 3, 3)
    sd[f"{hp}resize_layers.3.bias"] = r(c3)
    if dpt.use_input_projection:
        for i, ch in enumerate(dpt.out_channels):
            sd[f"{hp}input_projection.{i}.0.weight"] = r(ch, ch, 3, 3)
            sd[f"{hp}input_projection.{i}.0.bias"] = r(ch)
            sd[f"{hp}input_projection.{i}.1.weight"] = r(ch)
            sd[f"{hp}input_projection.{i}.1.bias"] = r(ch)
    f = dpt.features
    for i, ch in enumerate(dpt.out_channels):
        sd[f"{hp}scratch.layer{i + 1}_rn.weight"] = r(f, ch, 3, 3)
    for i in range(1, 5):
        rr = f"{hp}scratch.refinenet{i}."
        for u in ("resConfUnit1", "resConfUnit2"):
            sd[f"{rr}{u}.conv1.weight"], sd[f"{rr}{u}.conv1.bias"] = r(f, f, 3, 3), r(f)
            sd[f"{rr}{u}.conv2.weight"], sd[f"{rr}{u}.conv2.bias"] = r(f, f, 3, 3), r(f)
        sd[f"{rr}out_conv.weight"], sd[f"{rr}out_conv.bias"] = r(f, f, 1, 1), r(f)
    sd[f"{hp}scratch.output_conv1.weight"] = r(f // 2, f, 3, 3)
    sd[f"{hp}scratch.output_conv1.bias"] = r(f // 2)
    sd[f"{hp}scratch.output_conv2.0.weight"] = r(32, f // 2, 3, 3)
    sd[f"{hp}scratch.output_conv2.0.bias"] = r(32)
    sd[f"{hp}scratch.output_conv2.2.weight"] = r(1, 32, 1, 1)
    sd[f"{hp}scratch.output_conv2.2.bias"] = r(1)

    # sanity: converted tree must exactly mirror our init structure
    converted = convert_dav2(sd, cfg)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ref_paths == got_paths, ref_paths ^ got_paths
    return sd, converted


def test_converter_structure_and_config_inference():
    cfg = tiny_cfg()
    sd, converted = _fake_torch_sd(cfg)
    inferred = infer_dav2_config(sd)
    assert inferred.encoder == "vitt"
    assert not inferred.raw
    assert inferred.guide_type == "mask+observation"
    # shapes line up with init
    params = init_amodal_dav2(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape),
                 params, converted)

    raw_cfg = tiny_cfg(raw=True, guide_type="none")
    sd_raw, _ = _fake_torch_sd(raw_cfg)
    inferred_raw = infer_dav2_config(sd_raw)
    assert inferred_raw.raw


def test_pallas_attention_interpret_matches_xla(rng):
    b, h, n, d = 1, 2, 37, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d), dtype=np.float32))
               for _ in range(3))
    ref = mha_reference(q, k, v)
    out = mha(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_attention_grad_matches_xla(rng):
    b, h, n, d = 1, 2, 16, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d), dtype=np.float32))
               for _ in range(3))

    def loss_pallas(q, k, v):
        return jnp.sum(mha(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_prepadded_kv_len_matches_xla(rng):
    """Model-level pre-padding: padded q/k/v + kv_len == unpadded XLA."""
    b, h, n, d = 1, 2, 37, 64
    from amodal_depth_anything_tpu.ops.flash_attention import pad_seq_len
    n_pad = pad_seq_len(n)
    assert n_pad > n
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d), dtype=np.float32))
               for _ in range(3))
    pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
    ref = mha_reference(q, k, v)
    out = mha(qp, kp, vp, interpret=True, kv_len=n)[:, :, :n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # grads: cotangents zero on padded rows (the model-level contract)
    def loss_pallas(q, k, v):
        return jnp.sum(mha(q, k, v, interpret=True, kv_len=n)[:, :, :n] ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(qp, kp, vp)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        # padded rows must carry exactly zero grad (qkv dW correctness)
        np.testing.assert_array_equal(np.asarray(a[:, :, n:]), 0.0)
        np.testing.assert_allclose(np.asarray(a[:, :, :n]), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_dinov2_padded_trunk_matches_xla(rng):
    """The dinov2 trunk with pallas-interpret (model-level padding active)
    matches the xla path (no padding)."""
    model = get_model("AmodalDAv2", encoder="vitt")
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32))
    m = jnp.ones((1, HW, HW, 1), jnp.float32)
    o = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))
    ref = model.apply(params, x, guide_mask=m, observation=o,
                      attn_impl="xla")
    out = model.apply(params, x, guide_mask=m, observation=o,
                      attn_impl="pallas-interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_training_gradient_flows(rng):
    model = get_model("AmodalDAv2", encoder="vitt")
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, HW, HW, 3), dtype=np.float32))
    m = jnp.ones((1, HW, HW, 1), jnp.float32)
    o = jnp.asarray(rng.random((1, HW, HW, 1), dtype=np.float32))

    def loss_fn(p):
        pred = model.apply(p, x, guide_mask=m, observation=o,
                           attn_impl="xla", remat=True)
        return jnp.mean((pred - 0.5) ** 2)

    grads = jax.grad(loss_fn)(params)
    gnorm = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads))
    assert np.isfinite(np.asarray(gnorm)) and np.asarray(gnorm) > 0
