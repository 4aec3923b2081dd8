"""Converters for the model-heuristics stack: pix2gestalt SD + CLIP.

pix2gestalt ships an SD-1.5-style LDM checkpoint (`epoch=000005.ckpt`,
reference README.md:56-68) whose UNet lives under the
`model.diffusion_model.` prefix (conv proj_in/out, context_dim 768); the
CLIP ViT-L/14 vision tower follows the HF `transformers`
`vision_model.*` layout.
"""

from __future__ import annotations

import numpy as np

from ..models.clip_vit import CLIPVisionConfig
from .depthfm_convert import convert_ldm_unet

__all__ = ["convert_pix2gestalt_unet", "convert_clip_vision",
           "p2g_cfg_from_ckpt"]


def _strip_dm(ckpt_state_dict: dict) -> dict:
    prefix = "model.diffusion_model."
    sd = {k[len(prefix):]: v for k, v in ckpt_state_dict.items()
          if k.startswith(prefix)}
    return sd or ckpt_state_dict  # already stripped


def p2g_cfg_from_ckpt(ckpt_state_dict: dict):
    """Auto-detect the pix2gestalt conditioning layout and UNet hparams
    from the checkpoint itself (the layout is unverifiable offline —
    see Pix2GestaltConfig). Reads conv-in channels (8 -> 'image',
    12 -> 'image+mask'), model_channels, context_dim, and whether the
    zero123-style `cc_projection` head is present.

    Returns (Pix2GestaltConfig, cc_projection pytree | None)."""
    from ..heuristics.mask_heuristics import Pix2GestaltConfig

    sd = _strip_dm(ckpt_state_dict)
    conv_in = sd["input_blocks.0.0.weight"]  # [C_out, C_in, 3, 3]
    in_ch = int(conv_in.shape[1])
    if in_ch not in (8, 12):
        raise ValueError(f"unexpected pix2gestalt conv-in channels "
                         f"{in_ch} (expected 8 or 12)")
    to_k = sd["input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"]
    cfg = Pix2GestaltConfig(
        cond_mode="image+mask" if in_ch == 12 else "image",
        model_channels=int(conv_in.shape[0]),
        context_dim=int(to_k.shape[1]))
    cc = None
    if "cc_projection.weight" in ckpt_state_dict:
        cc = {"w": np.ascontiguousarray(
            ckpt_state_dict["cc_projection.weight"].T)}
        if "cc_projection.bias" in ckpt_state_dict:
            cc["b"] = ckpt_state_dict["cc_projection.bias"]
    return cfg, cc


def convert_pix2gestalt_unet(ckpt_state_dict: dict, unet_cfg) -> dict:
    """Full LDM checkpoint state dict -> our UNet pytree (strips the
    `model.diffusion_model.` prefix, then the standard LDM mapping)."""
    return convert_ldm_unet(_strip_dm(ckpt_state_dict), unet_cfg)


def _lin(sd, name, *, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_clip_vision(sd: dict,
                        cfg: CLIPVisionConfig = CLIPVisionConfig()) -> dict:
    """HF transformers CLIPVisionModelWithProjection state dict -> pytree.

    Expects `vision_model.*` + `visual_projection.weight` keys."""
    p = "vision_model."
    blocks = []
    for i in range(cfg.depth):
        b = f"{p}encoder.layers.{i}"
        q = _lin(sd, f"{b}.self_attn.q_proj")
        k = _lin(sd, f"{b}.self_attn.k_proj")
        v = _lin(sd, f"{b}.self_attn.v_proj")
        qkv = {"w": np.concatenate([q["w"], k["w"], v["w"]], axis=1),
               "b": np.concatenate([q["b"], k["b"], v["b"]])}
        blocks.append({
            "ln1": _ln(sd, f"{b}.layer_norm1"),
            "attn": {"qkv": qkv, "proj": _lin(sd, f"{b}.self_attn.out_proj")},
            "ln2": _ln(sd, f"{b}.layer_norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2")},
        })
    stacked = {}

    def stack(key_path, dicts):
        out = {}
        for k in dicts[0]:
            vals = [d[k] for d in dicts]
            out[k] = stack(key_path + (k,), vals) if isinstance(vals[0], dict) \
                else np.stack(vals)
        return out

    stacked = stack((), blocks)
    return {
        "patch_embed": {
            "w": np.ascontiguousarray(
                sd[f"{p}embeddings.patch_embedding.weight"]
                .transpose(2, 3, 1, 0))},
        "class_embedding": sd[f"{p}embeddings.class_embedding"],
        "pos_embed": sd[f"{p}embeddings.position_embedding.weight"],
        "pre_ln": _ln(sd, f"{p}pre_layrnorm"),
        "blocks": stacked,
        "post_ln": _ln(sd, f"{p}post_layernorm"),
        "proj": {"w": np.ascontiguousarray(sd["visual_projection.weight"].T)},
    }
