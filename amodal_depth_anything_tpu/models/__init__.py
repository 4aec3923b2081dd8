"""Model registry (reference `src/models/__init__.py:13-31` equivalent).

`get_model(name, **kwargs)` returns a `Model` bundle exposing the
functional `init` / `apply` pair plus its config, so entry points and
trainers stay model-agnostic.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax

from .amodal_dav2 import (DAV2Config, apply_amodal_dav2, apply_raw_dav2,
                          init_amodal_dav2)

__all__ = ["Model", "get_model", "MODEL_REGISTRY"]


@dataclasses.dataclass(frozen=True)
class Model:
    name: str
    config: Any
    init: Callable  # (key) -> params
    apply: Callable  # (params, x, **kwargs) -> prediction


def _build_amodal_dav2(*, encoder: str = "vitl",
                       guide_type: str = "mask+observation",
                       loss_stategy: str | None = None,
                       loss_strategy: str | None = None,
                       pretrained: bool = True,
                       embed_dim: int | None = None,
                       depth: int | None = None, **_ignored) -> Model:
    # Accept both the reference's (misspelled, load-bearing) config key
    # `loss_stategy` (dav2.py:22, yaml files) and the corrected spelling.
    # embed_dim/depth: test-scale overrides (DAV2Config docs) — e.g. the
    # FSDP test's real-vitl-width depth-4 trunk.
    strategy = loss_strategy or loss_stategy or "entire_target_object"
    cfg = DAV2Config(encoder=encoder, guide_type=guide_type,
                     loss_strategy=strategy, raw=False,
                     embed_dim=embed_dim, depth=depth)

    # init and apply are jitted: op-by-op eager dispatch pays a fixed
    # per-compile cost, while one fused program compiles once and lets XLA
    # fuse across the whole forward.
    @functools.partial(jax.jit, static_argnames=("attn_impl", "remat",
                                                 "act_sharding",
                                                 "head_batch_tile"))
    def _apply(params, x, guide_rgb=None, guide_mask=None, observation=None,
               attn_impl=None, remat=False, act_sharding=None,
               head_batch_tile=None):
        return apply_amodal_dav2(params, cfg, x, guide_rgb=guide_rgb,
                                 guide_mask=guide_mask, observation=observation,
                                 attn_impl=attn_impl, remat=remat,
                                 act_sharding=act_sharding,
                                 head_batch_tile=head_batch_tile)

    return Model(
        name="AmodalDAv2",
        config=cfg,
        init=jax.jit(lambda key: init_amodal_dav2(key, cfg)),
        apply=_apply,
    )


def _build_raw_dav2(*, encoder: str = "vitg", **_ignored) -> Model:
    cfg = DAV2Config(encoder=encoder, guide_type="none", raw=True)

    @functools.partial(jax.jit, static_argnames=("attn_impl",))
    def _apply(params, x, attn_impl=None):
        return apply_raw_dav2(params, cfg, x, attn_impl=attn_impl)

    return Model(
        name="DepthAnythingV2Raw",
        config=cfg,
        init=jax.jit(lambda key: init_amodal_dav2(key, cfg)),
        apply=_apply,
    )


def _build_depthfm(*, guide_type: str = "mask+observation",
                   ckpt_path: str | None = None, tiny: bool = False,
                   cfg_overrides: dict | None = None,
                   **_ignored) -> Model:
    """DepthFMAmodal (reference `dfm_amodal.py:34`). `ckpt_path` points at
    the depthfm-v1.ckpt torch checkpoint; weights load via the converter.
    `tiny=True` shrinks UNet/VAE for tests; `cfg_overrides` patches
    DepthFMConfig fields on top (the dryrun's compile-budget knob)."""
    from .depthfm import (DepthFMConfig, depthfm_generate, init_depthfm,
                          depthfm_train_outputs)

    if tiny:
        cfg = DepthFMConfig(guide_type=guide_type, model_channels=32,
                            channel_mult=(1, 2), num_heads=2, context_dim=32,
                            context_len=7, vae_channels=(16, 32), vae_layers=1)
    else:
        cfg = DepthFMConfig(guide_type=guide_type)
    if cfg_overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **cfg_overrides)

    @functools.partial(jax.jit,
                       static_argnames=("mode", "num_steps", "attn_impl",
                                        "tome", "remat", "deep_cache"))
    def _apply(params, x, rng=None, mode="eval", depth=None, guide_rgb=None,
               guide_mask=None, observation=None, num_steps=4, attn_impl=None,
               tome=None, remat=False, deep_cache=None):
        if mode == "train":
            return depthfm_train_outputs(
                params, cfg, rng, x, depth, guide_rgb=guide_rgb,
                guide_mask=guide_mask, observation=observation,
                attn_impl=attn_impl, remat=remat)
        return depthfm_generate(
            params, cfg, rng, x, num_steps=num_steps, guide_rgb=guide_rgb,
            guide_mask=guide_mask, observation=observation,
            attn_impl=attn_impl, tome=tome, deep_cache=deep_cache)

    return Model(
        name="DepthFMAmodal", config=cfg,
        init=jax.jit(lambda key: init_depthfm(key, cfg)),
        apply=_apply,
    )


def _build_addeeplab(*, encoder_name: str = "resnet50",
                     channels=(256, 512, 1024, 2048),
                     up_sample_channels=(128, 256, 512, 1024),
                     **_ignored) -> Model:
    """ADDeepLab baseline (reference `deeplab.py:203`). The combined tree is
    {"params", "bn"}: BatchNorm running stats ride outside the optimizer."""
    from .deeplab import ADDeepLabConfig, apply_addeeplab, init_addeeplab

    if encoder_name != "resnet50":
        raise ValueError("only resnet50 encoder is implemented "
                         f"(got {encoder_name!r})")
    cfg = ADDeepLabConfig(channels=tuple(channels),
                          up_sample_channels=tuple(up_sample_channels))

    def _init(key):
        params, bn = init_addeeplab(key, cfg)
        return {"params": params, "bn": bn}

    @functools.partial(jax.jit, static_argnames=("train", "attn_impl"))
    def _apply(tree, x, guide_mask=None, train=False, attn_impl=None,
               **_kw):
        (vis, invis), new_bn = apply_addeeplab(
            tree["params"], tree["bn"], cfg, x, guide_mask=guide_mask,
            train=train, attn_impl=attn_impl)
        return (vis, invis), new_bn

    return Model(name="ADDeepLab", config=cfg, init=jax.jit(_init),
                 apply=_apply)


def _build_jo_dpt(*, loss_stategy: str | None = None,
                  loss_strategy: str | None = None, tiny: bool = False,
                  **_ignored) -> Model:
    """PartialCompletionContentDPT baseline (reference
    `jo_amodal/PartialCompletionContentDPT.py:26`). Params tree is
    {"params", "bn"}; with train=True SPADE's param-free BN uses batch
    statistics (running stats are kept for eval; the trainer threads them
    like ADDeepLab's)."""
    from .jo_dpt import JoDPTConfig, apply_jo_dpt, init_jo_dpt

    del loss_stategy, loss_strategy  # head is always sigmoid in this baseline
    if tiny:
        cfg = JoDPTConfig(embed_dim=64, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                          tap_channels=(8, 16, 32, 32), features=16,
                          spade_hidden=8, img_size=64)
    else:
        cfg = JoDPTConfig()

    def _init(key):
        p, bn = init_jo_dpt(key, cfg)
        return {"params": p, "bn": bn}

    @functools.partial(jax.jit, static_argnames=("train", "attn_impl"))
    def _apply(tree, x, guide_rgb=None, guide_mask=None, observation=None,
               train=False, attn_impl=None, **_kw):
        pred, _new_bn = apply_jo_dpt(tree["params"], tree["bn"], cfg, x,
                                     guide_mask, train=train,
                                     attn_impl=attn_impl)
        return pred

    return Model(name="PartialCompletionContentDPT", config=cfg,
                 init=jax.jit(_init), apply=_apply)


def _build_invisible_stitch(*, loss_stategy: str | None = None,
                            loss_strategy: str | None = None,
                            tiny: bool = False, **_ignored) -> Model:
    """InvisibleStitch baseline (reference `invisible_stitch.py:77-110`):
    ZoeDepth-N (MiDaS DPT_BEiT_L_384) with depth-completion channels.
    Forward signature deviates from the other models by design:
    `apply(params, x, invisible_mask=, observation=)`."""
    from .beit import BEiTConfig
    from .zoedepth import (ZoeDepthConfig, apply_invisible_stitch,
                           init_invisible_stitch)

    del loss_stategy, loss_strategy
    if tiny:
        cfg = ZoeDepthConfig(
            backbone=BEiTConfig(embed_dim=64, depth=4, num_heads=2,
                                img_size=64, in_chans=5),
            hooks=(0, 1, 2, 3), tap_channels=(8, 16, 32, 32), features=16,
            n_bins=8, bin_embedding_dim=16, n_attractors=(4, 2, 2, 1),
            midas_out=8)
    else:
        cfg = ZoeDepthConfig()

    @functools.partial(jax.jit, static_argnames=("attn_impl",))
    def _apply(params, x, invisible_mask=None, observation=None,
               attn_impl=None, **_kw):
        del attn_impl  # BEiT rel-pos attention uses the XLA path
        return apply_invisible_stitch(params, cfg, x,
                                      invisible_mask=invisible_mask,
                                      observation=observation)

    return Model(name="InvisibleStitch", config=cfg,
                 init=jax.jit(lambda k: init_invisible_stitch(k, cfg)),
                 apply=_apply)


def _build_jo_unet(*, w: float = 4.0, depth: int = 4, in_channels: int = 3,
                   n_classes: int = 2, tiny: bool = False,
                   **_ignored) -> Model:
    """jo_amodal plain U-Net family (reference `jo_amodal/unet/unet_model.py`
    UNet/UNetD2/UNetD3 + the `unet025..unet4` width factories). Vestigial
    baseline; params tree is {"params", "bn"} like the other BN models."""
    from .jo_unet import JoUNetConfig, apply_jo_unet, init_jo_unet

    if tiny:
        w, depth = 0.25, 2
    cfg = JoUNetConfig(in_channels=in_channels, n_classes=n_classes, w=w,
                       depth=depth)

    def _init(key):
        p, bn = init_jo_unet(key, cfg)
        return {"params": p, "bn": bn}

    @functools.partial(jax.jit, static_argnames=("train",))
    def _apply(tree, x, train=False, **_kw):
        pred, _new_bn = apply_jo_unet(tree["params"], tree["bn"], cfg, x,
                                      train=train)
        return pred

    return Model(name="JoUNet", config=cfg, init=jax.jit(_init),
                 apply=_apply)


MODEL_REGISTRY: dict[str, Callable[..., Model]] = {
    "AmodalDAv2": _build_amodal_dav2,
    "PartialCompletionContentDPT": _build_jo_dpt,
    "InvisibleStitch": _build_invisible_stitch,
    "DepthAnythingV2Raw": _build_raw_dav2,
    "DepthFMAmodal": _build_depthfm,
    "DepthFM": lambda **kw: _build_depthfm(**{**kw, "guide_type":
                                              kw.get("guide_type", "none")}),
    "ADDeepLab": _build_addeeplab,
    "JoUNet": _build_jo_unet,
}


def get_model(name: str, **kwargs) -> Model:
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)
