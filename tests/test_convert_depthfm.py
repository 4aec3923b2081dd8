"""UNet/VAE converter round-trip: build a torch-layout state dict from our
randomly initialized params (inverse transforms), convert, and check
exact structural + numerical identity."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.depthfm_convert import (convert_ldm_unet,
                                                               convert_sd_vae)
from amodal_depth_anything_tpu.models.unet_ldm import (UNetConfig, build_plan,
                                                       init_unet)
from amodal_depth_anything_tpu.models.vae import VAEConfig, init_vae


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _emit_lin(sd, name, p, bias=True):
    sd[f"{name}.weight"] = np.asarray(p["w"]).T
    if bias and "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _emit_conv(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _emit_gn(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _emit_res(sd, prefix, p):
    _emit_gn(sd, f"{prefix}.in_layers.0", p["norm1"])
    _emit_conv(sd, f"{prefix}.in_layers.2", p["conv1"])
    _emit_lin(sd, f"{prefix}.emb_layers.1", p["emb"])
    _emit_gn(sd, f"{prefix}.out_layers.0", p["norm2"])
    _emit_conv(sd, f"{prefix}.out_layers.3", p["conv2"])
    if "skip" in p:
        _emit_conv(sd, f"{prefix}.skip_connection", p["skip"])


def _emit_transformer(sd, prefix, p, cfg):
    _emit_gn(sd, f"{prefix}.norm", p["norm"])
    emit = _emit_lin if cfg.use_linear_in_transformer else _emit_conv
    emit(sd, f"{prefix}.proj_in", p["proj_in"])
    emit(sd, f"{prefix}.proj_out", p["proj_out"])
    for d, blk in p["transformer_blocks"].items():
        b = f"{prefix}.transformer_blocks.{d}"
        for an in ("attn1", "attn2"):
            _emit_lin(sd, f"{b}.{an}.to_q", blk[an]["to_q"], bias=False)
            _emit_lin(sd, f"{b}.{an}.to_k", blk[an]["to_k"], bias=False)
            _emit_lin(sd, f"{b}.{an}.to_v", blk[an]["to_v"], bias=False)
            _emit_lin(sd, f"{b}.{an}.to_out.0", blk[an]["to_out"])
        _emit_lin(sd, f"{b}.ff.net.0.proj", blk["ff"]["geglu"])
        _emit_lin(sd, f"{b}.ff.net.2", blk["ff"]["out"])
        for n in ("norm1", "norm2", "norm3"):
            _emit_gn(sd, f"{b}.{n}", blk[n])


def emit_unet_sd(params, cfg) -> dict:
    """Inverse of convert_ldm_unet: our pytree -> torch-layout state dict
    (numpy values). Shared by the round-trip test and the DepthFM
    pipeline from_checkpoints test."""
    inp, mid, out = build_plan(cfg)

    sd: dict = {}
    _emit_lin(sd, "time_embed.0", params["time_embed"]["fc1"])
    _emit_lin(sd, "time_embed.2", params["time_embed"]["fc2"])
    _emit_gn(sd, "out.0", params["out"]["norm"])
    _emit_conv(sd, "out.2", params["out"]["conv"])

    def emit_layer(kind, torch_prefix, p):
        if kind == "conv_in":
            _emit_conv(sd, torch_prefix, p)
        elif kind == "res":
            _emit_res(sd, torch_prefix, p)
        elif kind == "attn":
            _emit_transformer(sd, torch_prefix, p, cfg)
        elif kind == "down":
            _emit_conv(sd, f"{torch_prefix}.op", p)
        elif kind == "up":
            _emit_conv(sd, f"{torch_prefix}.conv", p)

    for i, layers in enumerate(inp):
        for j, (kind, _m) in enumerate(layers):
            emit_layer(kind, f"input_blocks.{i}.{j}",
                       params["input_blocks"][str(i)][str(j)])
    for j, (kind, _m) in enumerate(mid):
        emit_layer(kind, f"middle_block.{j}", params["middle_block"][str(j)])
    for i, layers in enumerate(out):
        for j, (kind, _m) in enumerate(layers):
            emit_layer(kind, f"output_blocks.{i}.{j}",
                       params["output_blocks"][str(i)][str(j)])
    return sd


def test_unet_converter_roundtrip():
    cfg = UNetConfig(in_channels=10, model_channels=32, channel_mult=(1, 2),
                     num_heads=2, context_dim=16)
    params = jax.jit(lambda k: init_unet(k, cfg))(jax.random.PRNGKey(3))
    sd = emit_unet_sd(params, cfg)
    converted = convert_ldm_unet(sd, cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def emit_vae_sd(params) -> dict:
    """Inverse of convert_sd_vae: our VAE pytree -> diffusers-layout
    state dict (numpy values)."""
    sd: dict = {}

    def emit_resnet(prefix, p):
        _emit_gn(sd, f"{prefix}.norm1", p["norm1"])
        _emit_conv(sd, f"{prefix}.conv1", p["conv1"])
        _emit_gn(sd, f"{prefix}.norm2", p["norm2"])
        _emit_conv(sd, f"{prefix}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            _emit_conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])

    def emit_mid(prefix, p):
        emit_resnet(f"{prefix}.resnets.0", p["resnets"]["0"])
        emit_resnet(f"{prefix}.resnets.1", p["resnets"]["1"])
        at = p["attentions"]["0"]
        _emit_gn(sd, f"{prefix}.attentions.0.group_norm", at["group_norm"])
        for n in ("to_q", "to_k", "to_v"):
            _emit_lin(sd, f"{prefix}.attentions.0.{n}", at[n])
        _emit_lin(sd, f"{prefix}.attentions.0.to_out.0", at["to_out"])

    enc = params["encoder"]
    _emit_conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enc["down_blocks"].items():
        for j, r in blk["resnets"].items():
            emit_resnet(f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsampler" in blk:
            _emit_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       blk["downsampler"])
    emit_mid("encoder.mid_block", enc["mid_block"])
    _emit_gn(sd, "encoder.conv_norm_out", enc["conv_norm_out"])
    _emit_conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _emit_conv(sd, "decoder.conv_in", dec["conv_in"])
    emit_mid("decoder.mid_block", dec["mid_block"])
    for i, blk in dec["up_blocks"].items():
        for j, r in blk["resnets"].items():
            emit_resnet(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsampler" in blk:
            _emit_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                       blk["upsampler"])
    _emit_gn(sd, "decoder.conv_norm_out", dec["conv_norm_out"])
    _emit_conv(sd, "decoder.conv_out", dec["conv_out"])
    _emit_conv(sd, "quant_conv", params["quant_conv"])
    _emit_conv(sd, "post_quant_conv", params["post_quant_conv"])
    return sd


def test_vae_converter_roundtrip():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    params = jax.jit(lambda k: init_vae(k, cfg))(jax.random.PRNGKey(4))
    sd = emit_vae_sd(params)
    converted = convert_sd_vae(sd, n_down_blocks=2, layers_per_block=1)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
