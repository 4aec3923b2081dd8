"""SAM converter round-trip: emit a torch-layout state dict from our tiny
params (inverse transforms) and check exact recovery."""

import numpy as np

import jax

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

    def attn4(prefix, p):
        lin(f"{prefix}.q_proj", p["q"])
        lin(f"{prefix}.k_proj", p["k"])
        lin(f"{prefix}.v_proj", p["v"])
        lin(f"{prefix}.out_proj", p["out"])

    enc = params["encoder"]
    conv("image_encoder.patch_embed.proj", enc["patch_embed"]["proj"])
    sd["image_encoder.pos_embed"] = np.asarray(enc["pos_embed"])
    for i, blk in enc["blocks"].items():
        b = f"image_encoder.blocks.{i}"
        ln(f"{b}.norm1", blk["norm1"])
        lin(f"{b}.attn.qkv", blk["attn"]["qkv"])
        lin(f"{b}.attn.proj", blk["attn"]["proj"])
        sd[f"{b}.attn.rel_pos_h"] = np.asarray(blk["attn"]["rel_pos_h"])
        sd[f"{b}.attn.rel_pos_w"] = np.asarray(blk["attn"]["rel_pos_w"])
        ln(f"{b}.norm2", blk["norm2"])
        lin(f"{b}.mlp.lin1", blk["mlp"]["fc1"])
        lin(f"{b}.mlp.lin2", blk["mlp"]["fc2"])
    conv("image_encoder.neck.0", enc["neck"]["conv1"])
    ln("image_encoder.neck.1", enc["neck"]["ln1"])
    conv("image_encoder.neck.2", enc["neck"]["conv2"])
    ln("image_encoder.neck.3", enc["neck"]["ln2"])

    pr = params["prompt"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(pr["pe_gaussian"])
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            np.asarray(pr["point_embeddings"][i:i + 1])
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(pr["not_a_point"])
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(pr["no_mask"])

    dec = params["decoder"]
    sd["mask_decoder.iou_token.weight"] = np.asarray(dec["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(dec["mask_tokens"])
    for i, layer in dec["layers"].items():
        t = f"mask_decoder.transformer.layers.{i}"
        attn4(f"{t}.self_attn", layer["self_attn"])
        ln(f"{t}.norm1", layer["norm1"])
        attn4(f"{t}.cross_attn_token_to_image", layer["cross_t2i"])
        ln(f"{t}.norm2", layer["norm2"])
        lin(f"{t}.mlp.lin1", layer["mlp"]["fc1"])
        lin(f"{t}.mlp.lin2", layer["mlp"]["fc2"])
        ln(f"{t}.norm3", layer["norm3"])
        attn4(f"{t}.cross_attn_image_to_token", layer["cross_i2t"])
        ln(f"{t}.norm4", layer["norm4"])
    attn4("mask_decoder.transformer.final_attn_token_to_image",
          dec["final_attn"])
    ln("mask_decoder.transformer.norm_final_attn", dec["norm_final"])
    convt("mask_decoder.output_upscaling.0", dec["upscale_conv1"])
    ln("mask_decoder.output_upscaling.1", dec["upscale_ln"])
    convt("mask_decoder.output_upscaling.3", dec["upscale_conv2"])
    for i, mlp in dec["hyper_mlps"].items():
        for j, layer in mlp.items():
            lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                layer)
    for j, layer in dec["iou_head"].items():
        lin(f"mask_decoder.iou_prediction_head.layers.{j}", layer)

    converted = convert_sam(sd, cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
