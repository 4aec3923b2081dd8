"""AmodalDAv2 and the raw Depth-Anything-V2 base model, TPU-native.

Re-design of the reference primary model family:
  * `AmodalDAv2` (reference `src/models/amodalsynthdrive/dav2.py:21-90`):
    ImageNet-normalizes the input, concatenates guide channels according to
    `guide_type`, and runs the guided DepthAnythingV2 (DINOv2 + DPT head,
    sigmoid output unless an 'ssi' loss strategy selects a linear head).
  * Raw DAV2 (reference `depth_anything_v2_raw/dpt.py:146-183`): the frozen
    base-depth ("observation") predictor — no guidance branch, no
    input_projection convs, ReLU output head, squeezed channel.

Everything is NHWC and functional: `init_*` builds a param pytree,
`apply_*` is a pure function suitable for jit/pjit/grad.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .dinov2 import (INTERMEDIATE_LAYER_IDX, ViTConfig,
                     dinov2_intermediate_layers, init_dinov2)
from .dpt import DPTConfig, dpt_head, init_dpt_head

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Per-encoder decoder widths (reference `dav2.py:31-34`; raw base model
# uses the vitg-shaped head features=384 / out_channels=[1536]*4,
# reference `infer.py:60`).
DAV2_PRESETS = {
    "vitt": dict(features=16, out_channels=(8, 16, 32, 32)),
    "vitp": dict(features=32, out_channels=(16, 32, 64, 64)),
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
    "vitg": dict(features=384, out_channels=(1536, 1536, 1536, 1536)),
}


@dataclasses.dataclass(frozen=True)
class DAV2Config:
    encoder: str = "vitl"
    guide_type: str = "mask+observation"
    loss_strategy: str = "entire_target_object"
    raw: bool = False  # True -> base-depth predictor variant
    # Width/depth overrides: keep the encoder's preset otherwise but
    # shrink embed_dim/num_heads (golden tests exercise the released
    # architectures' depth+taps at CPU-affordable width) or depth (FSDP
    # sharding tests exercise REAL vitl/vitg leaf widths — above the
    # production FSDP_MIN_ELEMENTS threshold — at CPU-affordable depth;
    # taps remap proportionally). None = preset.
    embed_dim: int | None = None
    num_heads: int | None = None
    depth: int | None = None

    @property
    def vit(self) -> ViTConfig:
        cfg = ViTConfig.preset(self.encoder,
                               "none" if self.raw else self.guide_type)
        if self.embed_dim is not None:
            heads = self.num_heads or max(1, self.embed_dim // 32)
            cfg = dataclasses.replace(cfg, embed_dim=self.embed_dim,
                                      num_heads=heads)
        if self.depth is not None:
            cfg = dataclasses.replace(cfg, depth=self.depth)
        return cfg

    @property
    def dpt(self) -> DPTConfig:
        preset = DAV2_PRESETS[self.encoder]
        if self.raw:
            head_mode = "relu"
        elif "ssi" in self.loss_strategy:
            head_mode = "linear"
        else:
            head_mode = "sigmoid"
        return DPTConfig(
            in_channels=self.vit.embed_dim,
            features=preset["features"],
            out_channels=preset["out_channels"],
            head_mode=head_mode,
            use_input_projection=not self.raw,
        )

    @property
    def taps(self):
        taps = INTERMEDIATE_LAYER_IDX[self.encoder]
        if self.depth is not None:
            # proportional remap onto the shallow trunk, then repair to
            # strictly increasing within [0, depth-1] (shallow depths
            # collapse neighbors; the DPT head needs 4 distinct taps)
            if self.depth < len(taps):
                raise ValueError(f"depth override {self.depth} < "
                                 f"{len(taps)} DPT taps")
            d, pd = self.depth, ViTConfig.preset(self.encoder).depth
            m = [min(d - 1, round(t * (d - 1) / (pd - 1))) for t in taps]
            for i in range(1, len(m)):
                m[i] = max(m[i], m[i - 1] + 1)
            overflow = m[-1] - (d - 1)
            if overflow > 0:
                m = [v - overflow for v in m]
            for i in range(len(m) - 2, -1, -1):
                m[i] = min(m[i], m[i + 1] - 1)
            taps = tuple(m)
        return taps


def init_amodal_dav2(key, cfg: DAV2Config) -> dict:
    k1, k2 = jax.random.split(key)
    return {"backbone": init_dinov2(k1, cfg.vit),
            "depth_head": init_dpt_head(k2, cfg.dpt)}


def _normalize(x: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def build_guide(cfg: DAV2Config, guide_rgb=None, guide_mask=None,
                observation=None) -> jax.Array | None:
    """Concatenate guide channels per guide_type (reference dav2.py:67-82).

    Inputs are NHWC; mask/observation have 1 channel in [-1, 1]."""
    parts = {
        "image+mask+observation": (guide_rgb, guide_mask, observation),
        "image+mask": (guide_rgb, guide_mask),
        "image+observation": (guide_rgb, observation),
        "mask+observation": (guide_mask, observation),
        "observation": (observation,),
        "mask": (guide_mask,),
        "none": (),
    }[cfg.guide_type]
    if not parts:
        return None
    for i, part in enumerate(parts):
        if part is None:
            raise ValueError(
                f"guide_type={cfg.guide_type!r} requires component {i}")
    return jnp.concatenate(parts, axis=-1)


def apply_amodal_dav2(params: dict, cfg: DAV2Config, x: jax.Array, *,
                      guide_rgb=None, guide_mask=None, observation=None,
                      attn_impl: str | None = None,
                      remat: bool = False,
                      act_sharding=None,
                      pipeline_mesh=None,
                      pipeline_microbatches: int = 4,
                      token_merge: tuple[int, int] | None = None,
                      head_batch_tile: int | None = None) -> jax.Array:
    """x: [B, H, W, 3] RGB in [0,1]; returns depth [B, H', W', 1]
    (H' = 14 * (H // 14)), sigmoid-compressed unless ssi/raw head.

    `act_sharding`: optional NamedSharding for the trunk's token stream
    (sequence parallelism; see dinov2._run_blocks). `pipeline_mesh`:
    run the trunk as a GPipe pipeline over the mesh's 'pipe' axis."""
    x = _normalize(x)
    guide = None if cfg.raw else build_guide(cfg, guide_rgb, guide_mask,
                                             observation)
    ph, pw = x.shape[1] // 14, x.shape[2] // 14
    feats = dinov2_intermediate_layers(
        params["backbone"], cfg.vit, x, guide, cfg.taps,
        attn_impl=attn_impl, remat=remat, act_sharding=act_sharding,
        pipeline_mesh=pipeline_mesh,
        pipeline_microbatches=pipeline_microbatches,
        token_merge=token_merge)
    return dpt_head(params["depth_head"], cfg.dpt, feats, (ph, pw),
                    batch_tile=head_batch_tile)


def apply_raw_dav2(params: dict, cfg: DAV2Config, x: jax.Array, *,
                   attn_impl: str | None = None,
                   act_sharding=None,
                   token_merge: tuple[int, int] | None = None,
                   head_batch_tile: int | None = None) -> jax.Array:
    """Base-depth predictor: [B,H,W,3] in [0,1] -> [B,H',W'] relative depth.

    Note: unlike AmodalDAv2, the reference raw path normalizes on the host
    before the model (`infer.py:19`); we fold it here for one fused graph.
    """
    assert cfg.raw
    depth = apply_amodal_dav2(params, cfg, x, attn_impl=attn_impl,
                              act_sharding=act_sharding,
                              token_merge=token_merge,
                              head_batch_tile=head_batch_tile)
    return depth[..., 0]
