"""Pipeline parallelism (GPipe over 'pipe' axis): forward + gradient
parity against the plain scanned trunk, with DPT-style taps."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models.dinov2 import ViTConfig, init_dinov2
from amodal_depth_anything_tpu.models.layers import vit_block
from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
from amodal_depth_anything_tpu.parallel.pipeline import (pipeline_vit_blocks,
                                                         stage_params)

CFG = ViTConfig.preset("vitt")  # depth 4, dim 64, heads 2


def _block_fn(p, x):
    return vit_block(p, x, num_heads=CFG.num_heads, ffn=CFG.ffn,
                     attn_impl="xla")


def _ref_forward(stacked, tokens, taps):
    outs = []
    x = tokens
    for i in range(CFG.depth):
        p = jax.tree.map(lambda a: a[i], stacked)
        x = _block_fn(p, x)
        if i in taps:
            outs.append(x)
    return x, outs


def _setup(rng, batch=4, n=20):
    params = init_dinov2(jax.random.PRNGKey(0), CFG)
    stacked = params["blocks"]
    tokens = jnp.asarray(rng.standard_normal((batch, n, CFG.embed_dim)),
                         jnp.float32)
    return stacked, tokens


def test_pipeline_forward_matches_scan(rng):
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    stacked, tokens = _setup(rng)
    taps = (0, 1, 2, 3)

    out, tap_outs = pipeline_vit_blocks(
        stacked, tokens, _block_fn, mesh=mesh, n_microbatches=2, taps=taps)
    ref, ref_taps = _ref_forward(stacked, tokens, taps)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert len(tap_outs) == 4
    for got, want in zip(tap_outs, ref_taps):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    # last tap IS the final output for vitt (tap at depth-1)
    np.testing.assert_allclose(np.asarray(tap_outs[-1]), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_backward_matches_scan(rng):
    """jax.grad through the scan+ppermute schedule IS pipelined backprop;
    gradients must match the sequential trunk."""
    mesh = make_mesh(MeshConfig(data=1, model=1, pipe=8))
    cfg8 = ViTConfig(embed_dim=64, depth=8, num_heads=2, ffn="mlp")
    params = init_dinov2(jax.random.PRNGKey(1), cfg8)
    stacked = params["blocks"]
    tokens = jnp.asarray(rng.standard_normal((4, 12, 64)), jnp.float32)

    def bf(p, x):
        return vit_block(p, x, num_heads=2, ffn="mlp", attn_impl="xla")

    def pp_loss(stacked):
        out, _ = pipeline_vit_blocks(stacked, tokens, bf, mesh=mesh,
                                     n_microbatches=4, batch_axis=None)
        return jnp.sum(out ** 2)

    def ref_loss(stacked):
        x = tokens
        for i in range(8):
            x = bf(jax.tree.map(lambda a, i=i: a[i], stacked), x)
        return jnp.sum(x ** 2)

    g_pp = jax.grad(pp_loss)(stacked)
    g_ref = jax.grad(ref_loss)(stacked)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_stage_params_split():
    stacked, _ = _setup(np.random.default_rng(0))
    staged = stage_params(stacked, 2)
    qkv = staged["attn"]["qkv"]["w"]
    assert qkv.shape[:2] == (2, 2)  # 4 layers -> 2 stages x 2 layers


def test_trunk_pipeline_integration_matches_sequential(rng):
    """dinov2_intermediate_layers(pipeline_mesh=...) — the whole guided
    model runs with a pipelined trunk and must match the sequential path
    (taps + final norm + DPT head end to end)."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, apply_amodal_dav2, init_amodal_dav2)

    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    params = init_amodal_dav2(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.random((4, 56, 56, 3)), jnp.float32)
    m = jnp.asarray((rng.random((4, 56, 56, 1)) > 0.5), jnp.float32) * 2 - 1
    o = jnp.asarray(rng.random((4, 56, 56, 1)), jnp.float32) * 2 - 1

    ref = apply_amodal_dav2(params, cfg, x, guide_mask=m, observation=o,
                            attn_impl="xla")

    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    out = apply_amodal_dav2(params, cfg, x, guide_mask=m, observation=o,
                            attn_impl="xla", pipeline_mesh=mesh,
                            pipeline_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trunk_pipeline_remat_grads_match(rng):
    """pipeline_mesh honors remat: gradients with remat=True under the
    pipelined trunk equal the non-remat pipelined gradients."""
    from amodal_depth_anything_tpu.models.dinov2 import (
        ViTConfig, dinov2_intermediate_layers, init_dinov2)

    cfg = ViTConfig.preset("vitt")
    params = {"backbone": init_dinov2(jax.random.PRNGKey(0), cfg)}
    x = jnp.asarray(rng.standard_normal((4, 56, 56, 3)), jnp.float32)
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))

    def loss(p, remat):
        feats = dinov2_intermediate_layers(
            p["backbone"], cfg, x, None, (3,), attn_impl="xla",
            remat=remat, pipeline_mesh=mesh, pipeline_microbatches=2)
        return jnp.sum(feats[0][0] ** 2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
