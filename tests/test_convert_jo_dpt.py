"""jo_amodal DPT converter round-trip (tiny config)."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.jo_dpt_convert import convert_jo_dpt
from amodal_depth_anything_tpu.models.jo_dpt import JoDPTConfig, init_jo_dpt


def test_jo_dpt_converter_roundtrip():
    cfg = JoDPTConfig(embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                      tap_channels=(8, 16, 32, 32), features=16,
                      spade_hidden=8, img_size=64)
    params, bn = init_jo_dpt(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(np.asarray, params)
    bn = jax.tree.map(np.asarray, bn)

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

    bb = "model.pretrained.model"
    conv(f"{bb}.patch_embed.proj", params["patch_embed"]["proj"])
    sd[f"{bb}.cls_token"] = params["cls_token"]
    sd[f"{bb}.pos_embed"] = params["pos_embed"]
    ln(f"{bb}.norm", params["norm"])
    for i in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[i], params["blocks"])
        b = f"{bb}.blocks.{i}"
        ln(f"{b}.norm1", blk["norm1"])
        lin(f"{b}.attn.qkv", blk["attn"]["qkv"])
        lin(f"{b}.attn.proj", blk["attn"]["proj"])
        ln(f"{b}.norm2", blk["norm2"])
        lin(f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        lin(f"{b}.mlp.fc2", blk["mlp"]["fc2"])
    for i in range(4):
        ap = f"model.pretrained.act_postprocess{i + 1}"
        lin(f"{ap}.0.project.0", params["readout"][str(i)])
        conv(f"{ap}.3", params["reassemble"][str(i)]["project"])
    convt("model.pretrained.act_postprocess1.4",
          params["reassemble"]["0"]["resize"])
    convt("model.pretrained.act_postprocess2.4",
          params["reassemble"]["1"]["resize"])
    conv("model.pretrained.act_postprocess4.4",
         params["reassemble"]["3"]["resize"])
    for i in range(1, 5):
        conv(f"model.scratch.layer{i}_rn", params["scratch"][f"layer{i}_rn"])
        r = params["scratch"][f"refinenet{i}"]
        for u in ("resConfUnit1", "resConfUnit2"):
            conv(f"model.scratch.refinenet{i}.{u}.conv1", r[u]["conv1"])
            conv(f"model.scratch.refinenet{i}.{u}.conv2", r[u]["conv2"])
        conv(f"model.scratch.refinenet{i}.out_conv", r["out_conv"])
    oc = params["scratch"]["output_conv"]
    conv("model.scratch.output_conv.0", oc["conv1"])
    conv("model.scratch.output_conv.2", oc["conv2"])
    conv("model.scratch.output_conv.4", oc["conv3"])
    for i in range(1, 5):
        s = f"model.spade_fusion{i}"
        sp = params["spade"][str(i)]
        conv(f"{s}.mlp_shared.0", sp["mlp_shared"])
        conv(f"{s}.mlp_gamma", sp["mlp_gamma"])
        conv(f"{s}.mlp_beta", sp["mlp_beta"])
        sd[f"{s}.param_free_norm.running_mean"] = bn[str(i)]["mean"]
        sd[f"{s}.param_free_norm.running_var"] = bn[str(i)]["var"]

    cparams, cbn = convert_jo_dpt(sd, cfg)

    def flat(t):
        return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    a, b = flat((params, bn)), flat((cparams, cbn))
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
