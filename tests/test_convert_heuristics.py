"""CLIP converter round-trip (tiny config)."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.heuristics_convert import \
    convert_clip_vision
from amodal_depth_anything_tpu.models.clip_vit import (CLIPVisionConfig,
                                                       init_clip_vision)


def test_clip_converter_roundtrip():
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, width=16, depth=2,
                           num_heads=2, projection_dim=8)
    params = jax.jit(lambda k: init_clip_vision(k, cfg))(jax.random.PRNGKey(0))

    sd: dict = {}
    p = "vision_model."
    sd[f"{p}embeddings.patch_embedding.weight"] = \
        np.asarray(params["patch_embed"]["w"]).transpose(3, 2, 0, 1)
    sd[f"{p}embeddings.class_embedding"] = np.asarray(
        params["class_embedding"])
    sd[f"{p}embeddings.position_embedding.weight"] = np.asarray(
        params["pos_embed"])
    for name, key in (("pre_layrnorm", "pre_ln"),
                      ("post_layernorm", "post_ln")):
        sd[f"{p}{name}.weight"] = np.asarray(params[key]["scale"])
        sd[f"{p}{name}.bias"] = np.asarray(params[key]["bias"])
    sd["visual_projection.weight"] = np.asarray(params["proj"]["w"]).T

    for i in range(cfg.depth):
        b = f"{p}encoder.layers.{i}"
        blk = jax.tree.map(lambda a: np.asarray(a)[i], params["blocks"])
        qkv_w = blk["attn"]["qkv"]["w"]
        qkv_b = blk["attn"]["qkv"]["b"]
        d = cfg.width
        for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{b}.self_attn.{nm}.weight"] = qkv_w[:, j * d:(j + 1) * d].T
            sd[f"{b}.self_attn.{nm}.bias"] = qkv_b[j * d:(j + 1) * d]
        sd[f"{b}.self_attn.out_proj.weight"] = blk["attn"]["proj"]["w"].T
        sd[f"{b}.self_attn.out_proj.bias"] = blk["attn"]["proj"]["b"]
        for ln_t, ln_o in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            sd[f"{b}.{ln_t}.weight"] = blk[ln_o]["scale"]
            sd[f"{b}.{ln_t}.bias"] = blk[ln_o]["bias"]
        for fc in ("fc1", "fc2"):
            sd[f"{b}.mlp.{fc}.weight"] = blk["mlp"][fc]["w"].T
            sd[f"{b}.mlp.{fc}.bias"] = blk["mlp"][fc]["b"]

    converted = convert_clip_vision(sd, cfg)
    a = {jax.tree_util.keystr(pth): np.asarray(v) for pth, v in
         jax.tree_util.tree_flatten_with_path(params)[0]}
    b = {jax.tree_util.keystr(pth): np.asarray(v) for pth, v in
         jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0, err_msg=k)
