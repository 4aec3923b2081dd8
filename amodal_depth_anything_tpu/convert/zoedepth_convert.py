"""ZoeDepth / InvisibleStitch checkpoint conversion (torch -> pytree).

Maps the `invisible-stitch.pt` / ZoeDepth-N layout (reference
`invisible_stitch.py:77-110`, ZoeDepth `models/model_io.py:27-56` which
strips optional `model`/`module.` wrappers) onto `models/zoedepth.py`:

  core.core.pretrained.model.*         BEiT-L timm backbone
    blocks.{i}.attn.{qkv.weight,q_bias,v_bias,proj,
                     relative_position_bias_table}
    blocks.{i}.{gamma_1,gamma_2,norm1,norm2,mlp.fc1,mlp.fc2}
    patch_embed.proj (possibly widened to 5 input channels), cls_token
  core.core.pretrained.act_postprocess{1..4}   readout + reassemble
  core.core.scratch.layer{1..4}_rn / refinenet{1..4} / output_conv
  conv2, seed_bin_regressor._net.{0,2}, seed_projector._net.{0,2},
  projectors.{i}._net.{0,2}, attractors.{i}._net.{0,2},
  conditional_log_binomial.mlp.{0,2}
"""

from __future__ import annotations

import numpy as np

from ..models.zoedepth import ZoeDepthConfig

__all__ = ["convert_zoedepth", "strip_zoe_prefixes"]


def strip_zoe_prefixes(sd: dict) -> dict:
    """Handle the 'model'/'module.' wrapping zoe's model_io strips."""
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


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


def _mlp2(sd, prefix):
    return {"conv1": _conv(sd, f"{prefix}.0"), "conv2": _conv(sd, f"{prefix}.2")}


def _fusion(sd, prefix):
    return {
        "resConfUnit1": {"conv1": _conv(sd, f"{prefix}.resConfUnit1.conv1"),
                         "conv2": _conv(sd, f"{prefix}.resConfUnit1.conv2")},
        "resConfUnit2": {"conv1": _conv(sd, f"{prefix}.resConfUnit2.conv1"),
                         "conv2": _conv(sd, f"{prefix}.resConfUnit2.conv2")},
        "out_conv": _conv(sd, f"{prefix}.out_conv"),
    }


def convert_zoedepth(sd: dict, cfg: ZoeDepthConfig = ZoeDepthConfig()) -> dict:
    sd = strip_zoe_prefixes(sd)
    bb = "core.core.pretrained.model"
    backbone: dict = {
        "patch_embed": {"proj": _conv(sd, f"{bb}.patch_embed.proj")},
        "cls_token": sd[f"{bb}.cls_token"],
        "blocks": {},
    }
    for i in range(cfg.backbone.depth):
        b = f"{bb}.blocks.{i}"
        backbone["blocks"][str(i)] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv_w": np.ascontiguousarray(sd[f"{b}.attn.qkv.weight"].T),
                "q_bias": sd[f"{b}.attn.q_bias"],
                "v_bias": sd[f"{b}.attn.v_bias"],
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_table": sd[
                    f"{b}.attn.relative_position_bias_table"],
            },
            "gamma_1": sd[f"{b}.gamma_1"],
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2")},
            "gamma_2": sd[f"{b}.gamma_2"],
        }

    pp = "core.core.pretrained"
    params: dict = {"backbone": backbone, "readout": {}, "reassemble": {},
                    "scratch": {}}
    for i in range(4):
        ap = f"{pp}.act_postprocess{i + 1}"
        params["readout"][str(i)] = _lin(sd, f"{ap}.0.project.0")
        params["reassemble"][str(i)] = {"project": _conv(sd, f"{ap}.3")}
    params["reassemble"]["0"]["resize"] = _convt(sd,
                                                 f"{pp}.act_postprocess1.4")
    params["reassemble"]["1"]["resize"] = _convt(sd,
                                                 f"{pp}.act_postprocess2.4")
    params["reassemble"]["3"]["resize"] = _conv(sd, f"{pp}.act_postprocess4.4")

    sc = "core.core.scratch"
    scratch = params["scratch"]
    for i in range(1, 5):
        scratch[f"layer{i}_rn"] = _conv(sd, f"{sc}.layer{i}_rn", bias=False)
        scratch[f"refinenet{i}"] = _fusion(sd, f"{sc}.refinenet{i}")
    scratch["output_conv"] = {
        "conv1": _conv(sd, f"{sc}.output_conv.0"),
        "conv2": _conv(sd, f"{sc}.output_conv.2"),
        "conv3": _conv(sd, f"{sc}.output_conv.4"),
    }

    params["conv2"] = _conv(sd, "conv2")
    params["seed_bin_regressor"] = _mlp2(sd, "seed_bin_regressor._net")
    params["seed_projector"] = _mlp2(sd, "seed_projector._net")
    params["projectors"] = {str(i): _mlp2(sd, f"projectors.{i}._net")
                            for i in range(4)}
    params["attractors"] = {str(i): _mlp2(sd, f"attractors.{i}._net")
                            for i in range(4)}
    params["conditional_log_binomial"] = _mlp2(
        sd, "conditional_log_binomial.mlp")
    return params
