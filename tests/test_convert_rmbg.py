"""RMBG converter round-trip incl. BatchNorm folding correctness."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.rmbg_convert import convert_rmbg
from amodal_depth_anything_tpu.models.rmbg import RMBGConfig, init_rmbg


def test_rmbg_converter_roundtrip_and_bn_fold():
    cfg = RMBGConfig(width=8, stage_mid=(4, 4, 4, 8, 8, 8),
                     stage_out=(8, 8, 16, 16, 16, 16),
                     dec_mid=(4, 4, 4, 8, 8))
    params = jax.tree.map(np.asarray,
                          jax.jit(lambda k: init_rmbg(k, cfg))(
                              jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    sd: dict = {}

    def conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def rebn(name, p):
        conv(f"{name}.conv_s1", p)
        c = p["bn_scale"].shape[0]
        gamma = rng.random(c).astype(np.float32) + 0.5
        beta = rng.standard_normal(c).astype(np.float32)
        mean = rng.standard_normal(c).astype(np.float32)
        var = rng.random(c).astype(np.float32) + 0.5
        sd[f"{name}.bn_s1.weight"] = gamma
        sd[f"{name}.bn_s1.bias"] = beta
        sd[f"{name}.bn_s1.running_mean"] = mean
        sd[f"{name}.bn_s1.running_var"] = var
        return gamma, beta, mean, var

    def emit_rsu(prefix, p, height):
        stats = {}
        stats["in"] = rebn(f"{prefix}.rebnconvin", p["in"])
        for i in range(1, height + 1):
            stats[f"enc{i}"] = rebn(f"{prefix}.rebnconv{i}", p[f"enc{i}"])
        for i in range(height - 1, 0, -1):
            stats[f"dec{i}"] = rebn(f"{prefix}.rebnconv{i}d", p[f"dec{i}"])
        return stats

    conv("conv_in", params["conv_in"])
    all_stats = {}
    for s in range(1, 7):
        all_stats[f"stage{s}"] = emit_rsu(f"stage{s}", params[f"stage{s}"],
                                          cfg.heights[s - 1])
    for s in range(5, 0, -1):
        all_stats[f"stage{s}d"] = emit_rsu(f"stage{s}d", params[f"stage{s}d"],
                                           cfg.heights[s - 1])
    for i in range(1, 7):
        conv(f"side{i}", params[f"side{i}"])

    converted = convert_rmbg(sd, cfg)

    # conv weights round-trip exactly
    np.testing.assert_array_equal(converted["conv_in"]["w"],
                                  params["conv_in"]["w"])
    np.testing.assert_array_equal(converted["side1"]["w"],
                                  params["side1"]["w"])
    # BN folding: scale/bias reproduce eval-mode BN
    g, b, m, v = all_stats["stage1"]["in"]
    expect_scale = g / np.sqrt(v + 1e-5)
    expect_bias = b - m * expect_scale
    got = converted["stage1"]["in"]
    np.testing.assert_allclose(got["bn_scale"], expect_scale, rtol=1e-6)
    np.testing.assert_allclose(got["bn_bias"], expect_bias, rtol=1e-5,
                               atol=1e-6)
    # full structural match
    a = {jax.tree_util.keystr(p_): v.shape for p_, v in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    c = {jax.tree_util.keystr(p_): np.asarray(v).shape for p_, v in
         jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert a == c
