"""PartialCompletionContentDPT checkpoint conversion (torch -> pytree).

Maps the jo_amodal DPT checkpoint (`amodal_depth.pth.tar` state_dict,
reference `PartialCompletionContentDPT.py:43` — keys under `model.`)
onto `models/jo_dpt.py`: timm ViT-L/16 backbone (4-channel patch embed),
`act_postprocess` readout/reassemble stacks, scratch refinenets, SPADE
fusion blocks (param-free BN running stats -> `bn_state`), and the MiDaS
output head. The auxiliary `d_feat` 256->80 feature conv (reference
`dpt/models.py:102`, unused by the training/eval path) is not mapped.
"""

from __future__ import annotations

import numpy as np

from ..models.jo_dpt import JoDPTConfig

__all__ = ["convert_jo_dpt"]


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


def convert_jo_dpt(sd: dict, cfg: JoDPTConfig = JoDPTConfig()):
    """Returns (params, bn_state)."""
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    bb = "pretrained.model"
    blocks = []
    for i in range(cfg.depth):
        b = f"{bb}.blocks.{i}"
        blocks.append({
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2")},
        })

    def stack(dicts):
        out = {}
        for k in dicts[0]:
            vals = [d[k] for d in dicts]
            out[k] = stack(vals) if isinstance(vals[0], dict) \
                else np.stack(vals)
        return out

    params: dict = {
        "patch_embed": {"proj": _conv(sd, f"{bb}.patch_embed.proj")},
        "cls_token": sd[f"{bb}.cls_token"],
        "pos_embed": sd[f"{bb}.pos_embed"],
        "blocks": stack(blocks),
        "norm": _ln(sd, f"{bb}.norm") if f"{bb}.norm.weight" in sd else
        {"scale": np.ones(cfg.embed_dim, np.float32),
         "bias": np.zeros(cfg.embed_dim, np.float32)},
        "readout": {}, "reassemble": {}, "scratch": {}, "spade": {},
    }
    for i in range(4):
        ap = f"pretrained.act_postprocess{i + 1}"
        params["readout"][str(i)] = _lin(sd, f"{ap}.0.project.0")
        params["reassemble"][str(i)] = {"project": _conv(sd, f"{ap}.3")}
    params["reassemble"]["0"]["resize"] = _convt(sd, "pretrained.act_postprocess1.4")
    params["reassemble"]["1"]["resize"] = _convt(sd, "pretrained.act_postprocess2.4")
    params["reassemble"]["3"]["resize"] = _conv(sd, "pretrained.act_postprocess4.4")

    sc = params["scratch"]
    for i in range(1, 5):
        sc[f"layer{i}_rn"] = _conv(sd, f"scratch.layer{i}_rn", bias=False)
        r = f"scratch.refinenet{i}"
        sc[f"refinenet{i}"] = {
            "resConfUnit1": {"conv1": _conv(sd, f"{r}.resConfUnit1.conv1"),
                             "conv2": _conv(sd, f"{r}.resConfUnit1.conv2")},
            "resConfUnit2": {"conv1": _conv(sd, f"{r}.resConfUnit2.conv1"),
                             "conv2": _conv(sd, f"{r}.resConfUnit2.conv2")},
            "out_conv": _conv(sd, f"{r}.out_conv"),
        }
    sc["output_conv"] = {"conv1": _conv(sd, "scratch.output_conv.0"),
                         "conv2": _conv(sd, "scratch.output_conv.2"),
                         "conv3": _conv(sd, "scratch.output_conv.4")}

    bn_state = {}
    for i in range(1, 5):
        s = f"spade_fusion{i}"
        params["spade"][str(i)] = {
            "mlp_shared": _conv(sd, f"{s}.mlp_shared.0"),
            "mlp_gamma": _conv(sd, f"{s}.mlp_gamma"),
            "mlp_beta": _conv(sd, f"{s}.mlp_beta"),
        }
        bn_state[str(i)] = {"mean": sd[f"{s}.param_free_norm.running_mean"],
                            "var": sd[f"{s}.param_free_norm.running_var"]}
    return params, bn_state
