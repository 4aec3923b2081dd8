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

__all__ = ["convert_pix2gestalt_unet", "convert_clip_vision"]


def convert_pix2gestalt_unet(ckpt_state_dict: dict, unet_cfg) -> dict:
    """Full LDM checkpoint state dict -> our UNet pytree (strips the
    `model.diffusion_model.` prefix, then the standard LDM mapping)."""
    prefix = "model.diffusion_model."
    sd = {k[len(prefix):]: v for k, v in ckpt_state_dict.items()
          if k.startswith(prefix)}
    if not sd:
        sd = ckpt_state_dict  # already stripped
    return convert_ldm_unet(sd, unet_cfg)


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
