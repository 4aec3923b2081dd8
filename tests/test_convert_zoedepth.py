"""ZoeDepth converter round-trip (tiny config)."""

import numpy as np

import jax

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

    sd: dict = {}

    def lin(name, p, bias=True):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        if bias and "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def convt(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(0, 3, 1, 2)
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def mlp2(prefix, p):
        conv(f"{prefix}.0", p["conv1"])
        conv(f"{prefix}.2", p["conv2"])

    bb = "core.core.pretrained.model"
    conv(f"{bb}.patch_embed.proj", params["backbone"]["patch_embed"]["proj"])
    sd[f"{bb}.cls_token"] = np.asarray(params["backbone"]["cls_token"])
    for i, blk in params["backbone"]["blocks"].items():
        b = f"{bb}.blocks.{i}"
        ln(f"{b}.norm1", blk["norm1"])
        sd[f"{b}.attn.qkv.weight"] = np.asarray(blk["attn"]["qkv_w"]).T
        sd[f"{b}.attn.q_bias"] = np.asarray(blk["attn"]["q_bias"])
        sd[f"{b}.attn.v_bias"] = np.asarray(blk["attn"]["v_bias"])
        lin(f"{b}.attn.proj", blk["attn"]["proj"])
        sd[f"{b}.attn.relative_position_bias_table"] = \
            np.asarray(blk["attn"]["rel_pos_table"])
        sd[f"{b}.gamma_1"] = np.asarray(blk["gamma_1"])
        sd[f"{b}.gamma_2"] = np.asarray(blk["gamma_2"])
        ln(f"{b}.norm2", blk["norm2"])
        lin(f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        lin(f"{b}.mlp.fc2", blk["mlp"]["fc2"])

    pp = "core.core.pretrained"
    for i in range(4):
        lin(f"{pp}.act_postprocess{i + 1}.0.project.0",
            params["readout"][str(i)])
        conv(f"{pp}.act_postprocess{i + 1}.3",
             params["reassemble"][str(i)]["project"])
    convt(f"{pp}.act_postprocess1.4", params["reassemble"]["0"]["resize"])
    convt(f"{pp}.act_postprocess2.4", params["reassemble"]["1"]["resize"])
    conv(f"{pp}.act_postprocess4.4", params["reassemble"]["3"]["resize"])

    sc = "core.core.scratch"
    for i in range(1, 5):
        conv(f"{sc}.layer{i}_rn", params["scratch"][f"layer{i}_rn"])
        r = params["scratch"][f"refinenet{i}"]
        for u in ("resConfUnit1", "resConfUnit2"):
            conv(f"{sc}.refinenet{i}.{u}.conv1", r[u]["conv1"])
            conv(f"{sc}.refinenet{i}.{u}.conv2", r[u]["conv2"])
        conv(f"{sc}.refinenet{i}.out_conv", r["out_conv"])
    conv(f"{sc}.output_conv.0", params["scratch"]["output_conv"]["conv1"])
    conv(f"{sc}.output_conv.2", params["scratch"]["output_conv"]["conv2"])
    conv(f"{sc}.output_conv.4", params["scratch"]["output_conv"]["conv3"])

    conv("conv2", params["conv2"])
    mlp2("seed_bin_regressor._net", params["seed_bin_regressor"])
    mlp2("seed_projector._net", params["seed_projector"])
    for i in range(4):
        mlp2(f"projectors.{i}._net", params["projectors"][str(i)])
        mlp2(f"attractors.{i}._net", params["attractors"][str(i)])
    mlp2("conditional_log_binomial.mlp", params["conditional_log_binomial"])

    converted = convert_zoedepth({f"module.{k}": v for k, v in sd.items()},
                                 cfg)
    a = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    b = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
         jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
