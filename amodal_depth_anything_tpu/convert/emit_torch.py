"""Inverse converters: our param pytrees -> reference-layout state dicts.

Each ``emit_*_sd`` is the exact inverse of the corresponding ``convert_*``
in this package (round-trip asserted bit-exact in tests/test_convert_*).
Two uses:

* **Export**: weights trained in this framework can be written back into
  the reference's on-disk formats (torch ``.pth`` state dicts, HF
  ``model.safetensors``, LDM ``epoch=*.ckpt`` layouts) for consumers of
  the original repo (reference load sites: `infer.py:59-66`,
  `app.py:41-60`, `src/models/depth_model.py` from_pretrained).
* **Rehearsal**: ``scripts/verify_checkpoints.py --rehearse`` writes tiny
  synthetic checkpoints in the exact on-disk formats and runs the whole
  checkpoint-day gate against them, so the network-blocked real weights
  can be verified with one command the day they land.

All emitters return ``dict[str, np.ndarray]`` (no torch import needed);
callers ``torch.save``/``safetensors`` them as appropriate.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "emit_dav2_sd", "emit_sam_sd", "emit_rmbg_sd", "emit_zoedepth_sd",
    "emit_unet_sd", "emit_vae_sd", "emit_pix2gestalt_ckpt_sd",
    "emit_clip_vision_sd",
]


# ---------------------------------------------------------------- helpers

def _np(x):
    return np.asarray(x)


def _unstack(tree, i):
    """Slice layer i out of a stacked-[L,...] block tree."""
    if isinstance(tree, dict):
        return {k: _unstack(v, i) for k, v in tree.items()}
    return _np(tree)[i]


def _lin(sd, name, p, *, bias=True):
    sd[f"{name}.weight"] = np.ascontiguousarray(_np(p["w"]).T)
    if bias and "b" in p:
        sd[f"{name}.bias"] = _np(p["b"])


def _conv(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(
        _np(p["w"]).transpose(3, 2, 0, 1))
    if "b" in p:
        sd[f"{name}.bias"] = _np(p["b"])


def _convt(sd, name, p):
    # ours [C_in, k, k, C_out] -> ConvTranspose2d [C_in, C_out, k, k]
    sd[f"{name}.weight"] = np.ascontiguousarray(
        _np(p["w"]).transpose(0, 3, 1, 2))
    sd[f"{name}.bias"] = _np(p["b"])


def _ln(sd, name, p):
    sd[f"{name}.weight"] = _np(p["scale"])
    sd[f"{name}.bias"] = _np(p["bias"])


# ------------------------------------------------------------------ DAV2

def emit_dav2_sd(params: dict, cfg) -> dict:
    """Inverse of torch_to_jax.convert_dav2: our pytree -> the reference's
    DAV2 state-dict layout (raw base: bare keys; AmodalDAv2: under
    ``encoder.``, matching the HF safetensors)."""
    vit = cfg.vit
    prefix = "" if cfg.raw else "encoder."
    sd: dict = {}

    bb = params["backbone"]
    p = f"{prefix}pretrained."
    sd[f"{p}cls_token"] = _np(bb["cls_token"])
    sd[f"{p}pos_embed"] = _np(bb["pos_embed"])
    sd[f"{p}mask_token"] = _np(bb["mask_token"])
    _conv(sd, f"{p}patch_embed.proj", bb["patch_embed"]["proj"])
    if "patch_embed_guidance" in bb:
        _conv(sd, f"{p}patch_embed_guidance.proj",
              bb["patch_embed_guidance"]["proj"])
    _ln(sd, f"{p}norm", bb["norm"])
    for i in range(vit.depth):
        blk = _unstack(bb["blocks"], i)
        b = f"{p}blocks.{i}."
        _ln(sd, f"{b}norm1", blk["norm1"])
        _lin(sd, f"{b}attn.qkv", blk["attn"]["qkv"])
        _lin(sd, f"{b}attn.proj", blk["attn"]["proj"])
        sd[f"{b}ls1.gamma"] = blk["ls1"]["gamma"]
        _ln(sd, f"{b}norm2", blk["norm2"])
        sd[f"{b}ls2.gamma"] = blk["ls2"]["gamma"]
        if vit.ffn == "mlp":
            _lin(sd, f"{b}mlp.fc1", blk["mlp"]["fc1"])
            _lin(sd, f"{b}mlp.fc2", blk["mlp"]["fc2"])
        else:  # swiglufused
            _lin(sd, f"{b}mlp.w12", blk["mlp"]["w12"])
            _lin(sd, f"{b}mlp.w3", blk["mlp"]["w3"])

    hd = params["depth_head"]
    hp = f"{prefix}depth_head."
    for i in range(4):
        _conv(sd, f"{hp}projects.{i}", hd["projects"][str(i)])
    _convt(sd, f"{hp}resize_layers.0", hd["resize_layers"]["0"])
    _convt(sd, f"{hp}resize_layers.1", hd["resize_layers"]["1"])
    _conv(sd, f"{hp}resize_layers.3", hd["resize_layers"]["3"])
    if "input_projection" in hd:
        for i in range(4):
            ip = hd["input_projection"][str(i)]
            _conv(sd, f"{hp}input_projection.{i}.0", ip["conv"])
            _ln(sd, f"{hp}input_projection.{i}.1", ip["ln"])
    sc = hd["scratch"]
    for i in range(1, 5):
        _conv(sd, f"{hp}scratch.layer{i}_rn", sc[f"layer{i}_rn"])
        r = sc[f"refinenet{i}"]
        rr = f"{hp}scratch.refinenet{i}."
        for u in ("resConfUnit1", "resConfUnit2"):
            _conv(sd, f"{rr}{u}.conv1", r[u]["conv1"])
            _conv(sd, f"{rr}{u}.conv2", r[u]["conv2"])
        _conv(sd, f"{rr}out_conv", r["out_conv"])
    _conv(sd, f"{hp}scratch.output_conv1", sc["output_conv1"])
    _conv(sd, f"{hp}scratch.output_conv2.0", sc["output_conv2"]["conv1"])
    _conv(sd, f"{hp}scratch.output_conv2.2", sc["output_conv2"]["conv2"])
    return sd


# ------------------------------------------------------------------- SAM

def emit_sam_sd(params: dict) -> dict:
    """Inverse of sam_convert.convert_sam (reference SAM vit-h pth layout,
    `app.py:35`)."""
    sd: dict = {}

    def attn4(prefix, p):
        _lin(sd, f"{prefix}.q_proj", p["q"])
        _lin(sd, f"{prefix}.k_proj", p["k"])
        _lin(sd, f"{prefix}.v_proj", p["v"])
        _lin(sd, f"{prefix}.out_proj", p["out"])

    enc = params["encoder"]
    _conv(sd, "image_encoder.patch_embed.proj", enc["patch_embed"]["proj"])
    sd["image_encoder.pos_embed"] = _np(enc["pos_embed"])
    for i, blk in enc["blocks"].items():
        b = f"image_encoder.blocks.{i}"
        _ln(sd, f"{b}.norm1", blk["norm1"])
        _lin(sd, f"{b}.attn.qkv", blk["attn"]["qkv"])
        _lin(sd, f"{b}.attn.proj", blk["attn"]["proj"])
        sd[f"{b}.attn.rel_pos_h"] = _np(blk["attn"]["rel_pos_h"])
        sd[f"{b}.attn.rel_pos_w"] = _np(blk["attn"]["rel_pos_w"])
        _ln(sd, f"{b}.norm2", blk["norm2"])
        _lin(sd, f"{b}.mlp.lin1", blk["mlp"]["fc1"])
        _lin(sd, f"{b}.mlp.lin2", blk["mlp"]["fc2"])
    _conv(sd, "image_encoder.neck.0", enc["neck"]["conv1"])
    _ln(sd, "image_encoder.neck.1", enc["neck"]["ln1"])
    _conv(sd, "image_encoder.neck.2", enc["neck"]["conv2"])
    _ln(sd, "image_encoder.neck.3", enc["neck"]["ln2"])

    pr = params["prompt"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        _np(pr["pe_gaussian"])
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            _np(pr["point_embeddings"][i:i + 1])
    sd["prompt_encoder.not_a_point_embed.weight"] = _np(pr["not_a_point"])
    sd["prompt_encoder.no_mask_embed.weight"] = _np(pr["no_mask"])

    dec = params["decoder"]
    sd["mask_decoder.iou_token.weight"] = _np(dec["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = _np(dec["mask_tokens"])
    for i, layer in dec["layers"].items():
        t = f"mask_decoder.transformer.layers.{i}"
        attn4(f"{t}.self_attn", layer["self_attn"])
        _ln(sd, f"{t}.norm1", layer["norm1"])
        attn4(f"{t}.cross_attn_token_to_image", layer["cross_t2i"])
        _ln(sd, f"{t}.norm2", layer["norm2"])
        _lin(sd, f"{t}.mlp.lin1", layer["mlp"]["fc1"])
        _lin(sd, f"{t}.mlp.lin2", layer["mlp"]["fc2"])
        _ln(sd, f"{t}.norm3", layer["norm3"])
        attn4(f"{t}.cross_attn_image_to_token", layer["cross_i2t"])
        _ln(sd, f"{t}.norm4", layer["norm4"])
    attn4("mask_decoder.transformer.final_attn_token_to_image",
          dec["final_attn"])
    _ln(sd, "mask_decoder.transformer.norm_final_attn", dec["norm_final"])
    _convt(sd, "mask_decoder.output_upscaling.0", dec["upscale_conv1"])
    _ln(sd, "mask_decoder.output_upscaling.1", dec["upscale_ln"])
    _convt(sd, "mask_decoder.output_upscaling.3", dec["upscale_conv2"])
    for i, mlp in dec["hyper_mlps"].items():
        for j, layer in mlp.items():
            _lin(sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                 layer)
    for j, layer in dec["iou_head"].items():
        _lin(sd, f"mask_decoder.iou_prediction_head.layers.{j}", layer)
    return sd


# ------------------------------------------------------------------ RMBG

def emit_rmbg_sd(params: dict, cfg, *, bn_stats=None) -> dict:
    """Inverse of rmbg_convert.convert_rmbg (briaai/RMBG-1.4 layout).

    Our pytree stores eval-mode FOLDED BatchNorm (bn_scale/bn_bias); the
    torch layout stores (gamma, beta, running_mean, running_var). The
    default emission uses mean=0, var=1-eps, gamma=bn_scale, beta=bn_bias,
    which the converter folds back to bit-identical bn_scale/bn_bias.
    Pass ``bn_stats`` (rng) to emit random-but-consistent stats instead.
    """
    sd: dict = {}

    def conv(name, p):
        _conv(sd, name, p)

    def rebn(name, p):
        conv(f"{name}.conv_s1", p)
        scale, bias = _np(p["bn_scale"]), _np(p["bn_bias"])
        c = scale.shape[0]
        if bn_stats is not None:
            mean = bn_stats.standard_normal(c).astype(np.float32)
            var = bn_stats.random(c).astype(np.float32) + 0.5
            gamma = scale * np.sqrt(var + 1e-5)
            beta = bias + mean * scale
        else:
            mean = np.zeros(c, np.float32)
            var = np.full(c, 1.0 - 1e-5, np.float32)
            gamma, beta = scale, bias
        sd[f"{name}.bn_s1.weight"] = gamma
        sd[f"{name}.bn_s1.bias"] = beta
        sd[f"{name}.bn_s1.running_mean"] = mean
        sd[f"{name}.bn_s1.running_var"] = var

    def emit_rsu(prefix, p, height):
        rebn(f"{prefix}.rebnconvin", p["in"])
        for i in range(1, height + 1):
            rebn(f"{prefix}.rebnconv{i}", p[f"enc{i}"])
        for i in range(height - 1, 0, -1):
            rebn(f"{prefix}.rebnconv{i}d", p[f"dec{i}"])

    conv("conv_in", params["conv_in"])
    for s in range(1, 7):
        emit_rsu(f"stage{s}", params[f"stage{s}"], cfg.heights[s - 1])
    for s in range(5, 0, -1):
        emit_rsu(f"stage{s}d", params[f"stage{s}d"], cfg.heights[s - 1])
    for i in range(1, 7):
        conv(f"side{i}", params[f"side{i}"])
    return sd


# -------------------------------------------------------------- ZoeDepth

def emit_zoedepth_sd(params: dict, *, module_prefix: bool = True) -> dict:
    """Inverse of zoedepth_convert.convert_zoedepth (invisible-stitch
    ZoeDepth checkpoint layout; keys under ``module.`` as shipped)."""
    sd: dict = {}

    def mlp2(prefix, p):
        _conv(sd, f"{prefix}.0", p["conv1"])
        _conv(sd, f"{prefix}.2", p["conv2"])

    bb = "core.core.pretrained.model"
    _conv(sd, f"{bb}.patch_embed.proj", params["backbone"]["patch_embed"]["proj"])
    sd[f"{bb}.cls_token"] = _np(params["backbone"]["cls_token"])
    for i, blk in params["backbone"]["blocks"].items():
        b = f"{bb}.blocks.{i}"
        _ln(sd, f"{b}.norm1", blk["norm1"])
        sd[f"{b}.attn.qkv.weight"] = np.ascontiguousarray(
            _np(blk["attn"]["qkv_w"]).T)
        sd[f"{b}.attn.q_bias"] = _np(blk["attn"]["q_bias"])
        sd[f"{b}.attn.v_bias"] = _np(blk["attn"]["v_bias"])
        _lin(sd, f"{b}.attn.proj", blk["attn"]["proj"])
        sd[f"{b}.attn.relative_position_bias_table"] = \
            _np(blk["attn"]["rel_pos_table"])
        sd[f"{b}.gamma_1"] = _np(blk["gamma_1"])
        sd[f"{b}.gamma_2"] = _np(blk["gamma_2"])
        _ln(sd, f"{b}.norm2", blk["norm2"])
        _lin(sd, f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        _lin(sd, f"{b}.mlp.fc2", blk["mlp"]["fc2"])

    pp = "core.core.pretrained"
    for i in range(4):
        _lin(sd, f"{pp}.act_postprocess{i + 1}.0.project.0",
             params["readout"][str(i)])
        _conv(sd, f"{pp}.act_postprocess{i + 1}.3",
              params["reassemble"][str(i)]["project"])
    _convt(sd, f"{pp}.act_postprocess1.4", params["reassemble"]["0"]["resize"])
    _convt(sd, f"{pp}.act_postprocess2.4", params["reassemble"]["1"]["resize"])
    _conv(sd, f"{pp}.act_postprocess4.4", params["reassemble"]["3"]["resize"])

    sc = "core.core.scratch"
    for i in range(1, 5):
        _conv(sd, f"{sc}.layer{i}_rn", params["scratch"][f"layer{i}_rn"])
        r = params["scratch"][f"refinenet{i}"]
        for u in ("resConfUnit1", "resConfUnit2"):
            _conv(sd, f"{sc}.refinenet{i}.{u}.conv1", r[u]["conv1"])
            _conv(sd, f"{sc}.refinenet{i}.{u}.conv2", r[u]["conv2"])
        _conv(sd, f"{sc}.refinenet{i}.out_conv", r["out_conv"])
    _conv(sd, f"{sc}.output_conv.0", params["scratch"]["output_conv"]["conv1"])
    _conv(sd, f"{sc}.output_conv.2", params["scratch"]["output_conv"]["conv2"])
    _conv(sd, f"{sc}.output_conv.4", params["scratch"]["output_conv"]["conv3"])

    _conv(sd, "conv2", params["conv2"])
    mlp2("seed_bin_regressor._net", params["seed_bin_regressor"])
    mlp2("seed_projector._net", params["seed_projector"])
    for i in range(4):
        mlp2(f"projectors.{i}._net", params["projectors"][str(i)])
        mlp2(f"attractors.{i}._net", params["attractors"][str(i)])
    mlp2("conditional_log_binomial.mlp", params["conditional_log_binomial"])
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


# --------------------------------------------------------- LDM UNet / VAE

def _gn(sd, name, p):
    sd[f"{name}.weight"] = _np(p["scale"])
    sd[f"{name}.bias"] = _np(p["bias"])


def _res(sd, prefix, p):
    _gn(sd, f"{prefix}.in_layers.0", p["norm1"])
    _conv(sd, f"{prefix}.in_layers.2", p["conv1"])
    _lin(sd, f"{prefix}.emb_layers.1", p["emb"])
    _gn(sd, f"{prefix}.out_layers.0", p["norm2"])
    _conv(sd, f"{prefix}.out_layers.3", p["conv2"])
    if "skip" in p:
        _conv(sd, f"{prefix}.skip_connection", p["skip"])


def _transformer(sd, prefix, p, cfg):
    _gn(sd, f"{prefix}.norm", p["norm"])
    emit = _lin if cfg.use_linear_in_transformer else _conv
    emit(sd, f"{prefix}.proj_in", p["proj_in"])
    emit(sd, f"{prefix}.proj_out", p["proj_out"])
    for d, blk in p["transformer_blocks"].items():
        b = f"{prefix}.transformer_blocks.{d}"
        for an in ("attn1", "attn2"):
            _lin(sd, f"{b}.{an}.to_q", blk[an]["to_q"], bias=False)
            _lin(sd, f"{b}.{an}.to_k", blk[an]["to_k"], bias=False)
            _lin(sd, f"{b}.{an}.to_v", blk[an]["to_v"], bias=False)
            _lin(sd, f"{b}.{an}.to_out.0", blk[an]["to_out"])
        _lin(sd, f"{b}.ff.net.0.proj", blk["ff"]["geglu"])
        _lin(sd, f"{b}.ff.net.2", blk["ff"]["out"])
        for n in ("norm1", "norm2", "norm3"):
            _gn(sd, f"{b}.{n}", blk[n])


def emit_unet_sd(params, cfg) -> dict:
    """Inverse of depthfm_convert.convert_ldm_unet: our pytree ->
    torch-layout LDM UNet state dict (numpy values)."""
    from ..models.unet_ldm import build_plan
    inp, mid, out = build_plan(cfg)

    sd: dict = {}
    _lin(sd, "time_embed.0", params["time_embed"]["fc1"])
    _lin(sd, "time_embed.2", params["time_embed"]["fc2"])
    _gn(sd, "out.0", params["out"]["norm"])
    _conv(sd, "out.2", params["out"]["conv"])

    def emit_layer(kind, torch_prefix, p):
        if kind == "conv_in":
            _conv(sd, torch_prefix, p)
        elif kind == "res":
            _res(sd, torch_prefix, p)
        elif kind == "attn":
            _transformer(sd, torch_prefix, p, cfg)
        elif kind == "down":
            _conv(sd, f"{torch_prefix}.op", p)
        elif kind == "up":
            _conv(sd, f"{torch_prefix}.conv", p)

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


def emit_vae_sd(params) -> dict:
    """Inverse of depthfm_convert.convert_sd_vae: our VAE pytree ->
    diffusers-layout state dict (numpy values)."""
    sd: dict = {}

    def emit_resnet(prefix, p):
        _gn(sd, f"{prefix}.norm1", p["norm1"])
        _conv(sd, f"{prefix}.conv1", p["conv1"])
        _gn(sd, f"{prefix}.norm2", p["norm2"])
        _conv(sd, f"{prefix}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            _conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])

    def emit_mid(prefix, p):
        emit_resnet(f"{prefix}.resnets.0", p["resnets"]["0"])
        emit_resnet(f"{prefix}.resnets.1", p["resnets"]["1"])
        at = p["attentions"]["0"]
        _gn(sd, f"{prefix}.attentions.0.group_norm", at["group_norm"])
        for n in ("to_q", "to_k", "to_v"):
            _lin(sd, f"{prefix}.attentions.0.{n}", at[n])
        _lin(sd, f"{prefix}.attentions.0.to_out.0", at["to_out"])

    enc = params["encoder"]
    _conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enc["down_blocks"].items():
        for j, r in blk["resnets"].items():
            emit_resnet(f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsampler" in blk:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  blk["downsampler"])
    emit_mid("encoder.mid_block", enc["mid_block"])
    _gn(sd, "encoder.conv_norm_out", enc["conv_norm_out"])
    _conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _conv(sd, "decoder.conv_in", dec["conv_in"])
    emit_mid("decoder.mid_block", dec["mid_block"])
    for i, blk in dec["up_blocks"].items():
        for j, r in blk["resnets"].items():
            emit_resnet(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsampler" in blk:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  blk["upsampler"])
    _gn(sd, "decoder.conv_norm_out", dec["conv_norm_out"])
    _conv(sd, "decoder.conv_out", dec["conv_out"])
    _conv(sd, "quant_conv", params["quant_conv"])
    _conv(sd, "post_quant_conv", params["post_quant_conv"])
    return sd


# ----------------------------------------------------------- pix2gestalt

def emit_pix2gestalt_ckpt_sd(unet_params, unet_cfg,
                             cc_projection=None) -> dict:
    """pix2gestalt ``epoch=000005.ckpt``-layout ``state_dict``: the SD
    UNet under ``model.diffusion_model.`` plus optionally the
    zero123-style ``cc_projection`` linear (CLIP image embed 768 +
    4-dim pose pad -> 768 context token; reference `app.py:53-57`).
    The conditioning layout (conv-in 12 = noisy 4 + image latent 4 +
    visible-mask latent 4 by default, or zero123-style 8) lives INSIDE
    the emitted input_blocks.0.0 weight; ``p2g_cfg_from_ckpt``
    re-detects it on load and the rehearsal round-trips it."""
    sd = {f"model.diffusion_model.{k}": v
          for k, v in emit_unet_sd(unet_params, unet_cfg).items()}
    if cc_projection is not None:
        _lin(sd, "cc_projection", cc_projection)
    return sd


def emit_clip_vision_sd(params, cfg) -> dict:
    """Inverse of heuristics_convert.convert_clip_vision (HF transformers
    CLIPVisionModelWithProjection layout)."""
    sd: dict = {}
    p = "vision_model."
    # patch embedding has no bias in CLIP
    sd[f"{p}embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        _np(params["patch_embed"]["w"]).transpose(3, 2, 0, 1))
    sd[f"{p}embeddings.class_embedding"] = _np(params["class_embedding"])
    sd[f"{p}embeddings.position_embedding.weight"] = _np(params["pos_embed"])
    _ln(sd, f"{p}pre_layrnorm", params["pre_ln"])
    _ln(sd, f"{p}post_layernorm", params["post_ln"])
    for i in range(cfg.depth):
        blk = _unstack(params["blocks"], i)
        b = f"{p}encoder.layers.{i}"
        _ln(sd, f"{b}.layer_norm1", blk["ln1"])
        _ln(sd, f"{b}.layer_norm2", blk["ln2"])
        qkv_w = _np(blk["attn"]["qkv"]["w"])  # [d, 3d]
        qkv_b = _np(blk["attn"]["qkv"]["b"])
        d = qkv_w.shape[0]
        for j, n in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{b}.self_attn.{n}.weight"] = np.ascontiguousarray(
                qkv_w[:, j * d:(j + 1) * d].T)
            sd[f"{b}.self_attn.{n}.bias"] = qkv_b[j * d:(j + 1) * d]
        _lin(sd, f"{b}.self_attn.out_proj", blk["attn"]["proj"])
        _lin(sd, f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        _lin(sd, f"{b}.mlp.fc2", blk["mlp"]["fc2"])
    sd["visual_projection.weight"] = np.ascontiguousarray(
        _np(params["proj"]["w"]).T)
    return sd
