"""SAM checkpoint conversion: `sam_vit_h.pth` (torch) -> our pytree.

Maps the official Segment-Anything state-dict layout (the `sam_vit_h.pth`
the reference demo downloads, README.md:56-68 / `app.py:34-39`) onto
`models/sam.py`'s functional parameter tree:

  image_encoder.blocks.{i}.attn.{qkv,proj,rel_pos_h,rel_pos_w} etc,
  image_encoder.neck.{0..3}, prompt_encoder.pe_layer/point_embeddings,
  mask_decoder.transformer.layers.{i}.* / output_upscaling /
  output_hypernetworks_mlps / iou_prediction_head.

Notes: SAM's pos_embed is already [1, gh, gw, C] (channels-last); conv
kernels transpose OIHW->HWIO; ConvTranspose2d k=s=2 upscalers reshape
[Ci,Co,k,k]->[Ci,k,k,Co]; mask-prompt downscaling convs are not mapped
(point prompts only — the reference demo uses points, app.py:106-111).
"""

from __future__ import annotations

import numpy as np

from ..models.sam import SAMConfig

__all__ = ["convert_sam"]


def _lin(sd, name, *, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _conv(sd, name, *, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _convt(sd, name):
    return {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(0, 2, 3, 1)),
            "b": sd[f"{name}.bias"]}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _attn4(sd, prefix):
    return {"q": _lin(sd, f"{prefix}.q_proj"),
            "k": _lin(sd, f"{prefix}.k_proj"),
            "v": _lin(sd, f"{prefix}.v_proj"),
            "out": _lin(sd, f"{prefix}.out_proj")}


def convert_sam(sd: dict, cfg: SAMConfig = SAMConfig()) -> dict:
    enc = {
        "patch_embed": {"proj": _conv(sd, "image_encoder.patch_embed.proj")},
        "pos_embed": sd["image_encoder.pos_embed"],
        "blocks": {},
        "neck": {
            "conv1": _conv(sd, "image_encoder.neck.0", bias=False),
            "ln1": _ln(sd, "image_encoder.neck.1"),
            "conv2": _conv(sd, "image_encoder.neck.2", bias=False),
            "ln2": _ln(sd, "image_encoder.neck.3"),
        },
    }
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}"
        enc["blocks"][str(i)] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": sd[f"{b}.attn.rel_pos_h"],
                "rel_pos_w": sd[f"{b}.attn.rel_pos_w"],
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.lin1"),
                    "fc2": _lin(sd, f"{b}.mlp.lin2")},
        }

    prompt = {
        "pe_gaussian": sd[
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeddings": np.concatenate(
            [sd[f"prompt_encoder.point_embeddings.{i}.weight"]
             for i in range(4)], axis=0),
        "not_a_point": sd["prompt_encoder.not_a_point_embed.weight"],
        "no_mask": sd["prompt_encoder.no_mask_embed.weight"],
    }

    n_masks = cfg.num_multimask + 1
    dec = {
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "layers": {},
        "final_attn": _attn4(
            sd, "mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": _ln(sd, "mask_decoder.transformer.norm_final_attn"),
        "upscale_conv1": _convt(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _convt(sd, "mask_decoder.output_upscaling.3"),
        "hyper_mlps": {}, "iou_head": {},
    }
    for i in range(cfg.decoder_layers):
        t = f"mask_decoder.transformer.layers.{i}"
        dec["layers"][str(i)] = {
            "self_attn": _attn4(sd, f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "cross_t2i": _attn4(sd, f"{t}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{t}.mlp.lin1"),
                    "fc2": _lin(sd, f"{t}.mlp.lin2")},
            "norm3": _ln(sd, f"{t}.norm3"),
            "cross_i2t": _attn4(sd, f"{t}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{t}.norm4"),
        }
    for i in range(n_masks):
        m = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        dec["hyper_mlps"][str(i)] = {str(j): _lin(sd, f"{m}.{j}")
                                     for j in range(3)}
    dec["iou_head"] = {str(j): _lin(
        sd, f"mask_decoder.iou_prediction_head.layers.{j}")
        for j in range(3)}

    return {"encoder": enc, "prompt": prompt, "decoder": dec}
