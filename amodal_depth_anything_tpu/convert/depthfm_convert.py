"""DepthFM / SD checkpoint conversion: torch -> JAX pytrees.

Covers the two torch artifacts the reference loads:
  * `depthfm-v1.ckpt` (reference `dfm_amodal.py:42-48`): dict with
    `state_dict` (LDM UNet, torch key layout `input_blocks.{i}.{j}...`),
    `ldm_hparams`, `noising_step`, `empty_text_embedding`.
  * diffusers `AutoencoderKL` (SD-1.5 vae) state dict.

Because our parameter trees mirror the torch module indices (see
`models/unet_ldm.py`), conversion is a mechanical per-layer transform:
linear [out,in]->[in,out], conv OIHW->HWIO, GN weight/bias -> scale/bias.
"""

from __future__ import annotations

import numpy as np

from ..models.unet_ldm import UNetConfig, build_plan

__all__ = ["convert_ldm_unet", "convert_sd_vae", "load_depthfm_ckpt"]


def _lin(sd, name, *, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _conv(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _res(sd, prefix):
    p = {
        "norm1": _gn(sd, f"{prefix}.in_layers.0"),
        "conv1": _conv(sd, f"{prefix}.in_layers.2"),
        "emb": _lin(sd, f"{prefix}.emb_layers.1"),
        "norm2": _gn(sd, f"{prefix}.out_layers.0"),
        "conv2": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        p["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return p


def _transformer(sd, prefix, cfg: UNetConfig):
    blocks = {}
    for d in range(cfg.transformer_depth):
        b = f"{prefix}.transformer_blocks.{d}"
        blocks[str(d)] = {
            "attn1": {
                "to_q": _lin(sd, f"{b}.attn1.to_q", bias=False),
                "to_k": _lin(sd, f"{b}.attn1.to_k", bias=False),
                "to_v": _lin(sd, f"{b}.attn1.to_v", bias=False),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": _lin(sd, f"{b}.attn2.to_q", bias=False),
                "to_k": _lin(sd, f"{b}.attn2.to_k", bias=False),
                "to_v": _lin(sd, f"{b}.attn2.to_v", bias=False),
                "to_out": _lin(sd, f"{b}.attn2.to_out.0"),
            },
            "ff": {"geglu": _lin(sd, f"{b}.ff.net.0.proj"),
                   "out": _lin(sd, f"{b}.ff.net.2")},
            "norm1": _gn(sd, f"{b}.norm1"),
            "norm2": _gn(sd, f"{b}.norm2"),
            "norm3": _gn(sd, f"{b}.norm3"),
        }
    if cfg.use_linear_in_transformer:
        proj_in = _lin(sd, f"{prefix}.proj_in")
        proj_out = _lin(sd, f"{prefix}.proj_out")
    else:
        proj_in = _conv(sd, f"{prefix}.proj_in")
        proj_out = _conv(sd, f"{prefix}.proj_out")
    return {"norm": _gn(sd, f"{prefix}.norm"), "proj_in": proj_in,
            "transformer_blocks": blocks, "proj_out": proj_out}


def convert_ldm_unet(sd: dict, cfg: UNetConfig) -> dict:
    """torch UNet state dict -> our plan-shaped pytree."""
    inp, mid, out = build_plan(cfg)
    params: dict = {
        "time_embed": {"fc1": _lin(sd, "time_embed.0"),
                       "fc2": _lin(sd, "time_embed.2")},
        "input_blocks": {}, "middle_block": {}, "output_blocks": {},
        "out": {"norm": _gn(sd, "out.0"), "conv": _conv(sd, "out.2")},
    }

    def convert_layer(kind, torch_prefix):
        if kind == "conv_in":
            return _conv(sd, torch_prefix)
        if kind == "res":
            return _res(sd, torch_prefix)
        if kind == "attn":
            return _transformer(sd, torch_prefix, cfg)
        if kind == "down":
            return _conv(sd, f"{torch_prefix}.op")
        if kind == "up":
            return _conv(sd, f"{torch_prefix}.conv")
        raise ValueError(kind)

    for i, layers in enumerate(inp):
        params["input_blocks"][str(i)] = {
            str(j): convert_layer(kind, f"input_blocks.{i}.{j}")
            for j, (kind, _m) in enumerate(layers)}
    params["middle_block"] = {
        str(j): convert_layer(kind, f"middle_block.{j}")
        for j, (kind, _m) in enumerate(mid)}
    for i, layers in enumerate(out):
        params["output_blocks"][str(i)] = {
            str(j): convert_layer(kind, f"output_blocks.{i}.{j}")
            for j, (kind, _m) in enumerate(layers)}
    return params


def convert_sd_vae(sd: dict, n_down_blocks: int = 4,
                   layers_per_block: int = 2) -> dict:
    """diffusers AutoencoderKL state dict -> our VAE pytree."""
    def resnet(prefix):
        p = {"norm1": _gn(sd, f"{prefix}.norm1"),
             "conv1": _conv(sd, f"{prefix}.conv1"),
             "norm2": _gn(sd, f"{prefix}.norm2"),
             "conv2": _conv(sd, f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
        return p

    def attn(prefix):
        return {"group_norm": _gn(sd, f"{prefix}.group_norm"),
                "to_q": _lin(sd, f"{prefix}.to_q"),
                "to_k": _lin(sd, f"{prefix}.to_k"),
                "to_v": _lin(sd, f"{prefix}.to_v"),
                "to_out": _lin(sd, f"{prefix}.to_out.0")}

    def mid(prefix):
        return {"resnets": {"0": resnet(f"{prefix}.resnets.0"),
                            "1": resnet(f"{prefix}.resnets.1")},
                "attentions": {"0": attn(f"{prefix}.attentions.0")}}

    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"), "down_blocks": {}}
    for i in range(n_down_blocks):
        blk = {"resnets": {str(j): resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                           for j in range(layers_per_block)}}
        ds_key = f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"
        if ds_key in sd:
            blk["downsampler"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down_blocks"][str(i)] = blk
    enc["mid_block"] = mid("encoder.mid_block")
    enc["conv_norm_out"] = _gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "mid_block": mid("decoder.mid_block"), "up_blocks": {}}
    for i in range(n_down_blocks):
        blk = {"resnets": {str(j): resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(layers_per_block + 1)}}
        us_key = f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"
        if us_key in sd:
            blk["upsampler"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up_blocks"][str(i)] = blk
    dec["conv_norm_out"] = _gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv(sd, "quant_conv"),
            "post_quant_conv": _conv(sd, "post_quant_conv")}


def load_depthfm_ckpt(ckpt_path: str, guide_type: str = "mask+observation"):
    """depthfm-v1.ckpt -> (DepthFMConfig, partial params). The VAE ships
    separately (diffusers); combine with `convert_sd_vae`."""
    import torch

    from ..models.depthfm import DepthFMConfig

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    hp = ckpt["ldm_hparams"]
    cfg = DepthFMConfig(guide_type=guide_type,
                        noising_step=int(ckpt["noising_step"]),
                        context_dim=int(hp["context_dim"]),
                        model_channels=int(hp["model_channels"]),
                        channel_mult=tuple(hp["channel_mult"]),
                        num_heads=int(hp["num_heads"]))
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    unet = convert_ldm_unet(sd, cfg.unet)
    # widen conv-in: pretrained 8 channels + zero guidance channels
    # (reference dfm_amodal.py:70-83)
    w = unet["input_blocks"]["0"]["0"]["w"]
    if cfg.additional_dim:
        pad = np.zeros((*w.shape[:2], cfg.additional_dim, w.shape[3]),
                       w.dtype)
        unet["input_blocks"]["0"]["0"]["w"] = np.concatenate([w, pad], axis=2)
    empty = np.asarray(ckpt["empty_text_embedding"])
    if empty.ndim == 2:
        empty = empty[None]
    return cfg, {"unet": unet, "empty_text_embed": empty}
