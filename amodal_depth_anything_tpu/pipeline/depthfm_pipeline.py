"""Serving pipeline for the generative (DepthFM) family.

`AmodalDepthPipeline`'s counterpart for DepthFMAmodal / plain DepthFM
(reference `src/models/depthfm/dfm_amodal.py:246-265` eval path and
`src/scripts/amodel_depthfm_inference.py` preprocessing contract):
load the torch checkpoints once, then run preprocess -> VAE encode ->
guidance latents -> 4-step Euler ODE -> VAE decode as ONE jit program
per input shape. Input conventions match the reference trainers
(`depthfm_amodal_trainer.py:197-199`): rgb/guide_rgb scaled to [-1,1],
guide mask 0/1, observation in [0,1].

The serving-optimization ladder mirrors the discriminative pipeline's:
`quantize_int8()` = opt-in dynamic-scale W8A8 over UNet+VAE (measured
15.1 img/s/chip vs 13.1 bf16 at b8 @512 on v5e — throughput lever only,
b1 latency regresses), `tome=` = ToMe-SD merging in the UNet's spatial
transformers (measured 14.1 img/s with b1 p50 unharmed). Both are
parity-breaking and never default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.depthfm import (DepthFMConfig, depthfm_generate,
                              depthfm_predict_depth)
from ..ops.resize import resize2d, resize_nearest

__all__ = ["DepthFMPipeline"]


class DepthFMPipeline:
    """User-facing generative pipeline: load checkpoints once, infer many.

    `params`/`cfg` come from `models.get_model("DepthFMAmodal")` init or
    `from_checkpoints`. `size` must be divisible by the VAE factor (8).
    """

    def __init__(self, params, cfg: DepthFMConfig, *, size: int = 512,
                 num_steps: int = 4, dtype=jnp.float32,
                 attn_impl: str | None = None, seed: int = 2024,
                 tome: tuple[float, int] | None = None,
                 deep_cache: tuple[int, int] | int | str | None = None,
                 mesh=None,
                 cast: bool = True):
        """`mesh`: optional serving mesh — params are replicated and the
        batch sharded over its 'data' axis, so one jit program runs the
        whole generate graph data-parallel (throughput scale-out; batch
        must be divisible by the data-axis size).

        `cast=False` keeps every param leaf's dtype exactly as passed
        (used by `load_serving` — restored trees are already in serving
        dtype, possibly with int8 kernels and float scale leaves)."""
        if cast:
            self.params = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                                       if jnp.issubdtype(jnp.asarray(a).dtype,
                                                         jnp.floating)
                                       else jnp.asarray(a), params)
        else:
            self.params = jax.tree.map(jnp.asarray, params)
        self._batch_sharding = None
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(mesh, P())
            self.params = jax.tree.map(
                lambda a: jax.device_put(a, replicated), self.params)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self.cfg = cfg
        self.size = size
        self.num_steps = num_steps
        self.dtype = dtype
        self.attn_impl = attn_impl
        self.seed = seed
        # "ratio" or (ratio, min_tokens): ToMe-SD in the UNet transformers
        self.tome = (float(tome), 4096) if isinstance(tome, (int, float)) \
            else tome
        # (interval N, shallow groups G): DeepCache Euler-step caching —
        # every N-th step runs the full UNet, the rest run only the G
        # shallowest groups reusing the cached deep feature (opt-in,
        # parity-breaking; N must divide num_steps). An int or "N" means
        # (N, 3) — 3 groups = the whole highest-resolution level of the
        # SD topology (conv_in + 2 res/attn blocks); "N,G" strings (the
        # serving-menu incantation format) parse too.
        from ..ops.ddim import parse_deep_cache
        self.deep_cache = parse_deep_cache(deep_cache)

        cfg_ = cfg

        def _prep(image, mask, observation, guide_rgb):
            s = (size, size)
            rgb = resize2d(image / 255.0, size=s,
                           method="bilinear") * 2.0 - 1.0
            m = (resize_nearest(mask, size=s) > 0).astype(rgb.dtype) \
                if mask is not None else None
            obs = resize2d(observation, size=s, method="bilinear") \
                if observation is not None else None
            grgb = resize2d(guide_rgb / 255.0, size=s,
                            method="bilinear") * 2.0 - 1.0 \
                if guide_rgb is not None else None
            return rgb, m, obs, grgb

        self._prep = _prep

        @jax.jit
        def _amodal_graph(params, image, mask, observation, guide_rgb):
            rgb, m, obs, grgb = _prep(image, mask, observation, guide_rgb)
            return depthfm_generate(
                params, cfg_, jax.random.PRNGKey(seed), rgb,
                num_steps=num_steps, guide_rgb=grgb, guide_mask=m,
                observation=obs, attn_impl=attn_impl, tome=self.tome,
                deep_cache=self.deep_cache)

        self._amodal_graph = _amodal_graph

        @functools.partial(jax.jit, static_argnames=("ensemble_size",
                                                     "n_steps"))
        def _plain_graph(params, image, ensemble_size=1, n_steps=2):
            rgb = resize2d(image / 255.0, size=(size, size),
                           method="bilinear") * 2.0 - 1.0
            return depthfm_predict_depth(
                params, cfg_, jax.random.PRNGKey(seed), rgb,
                num_steps=n_steps, ensemble_size=ensemble_size,
                attn_impl=attn_impl, tome=self.tome,
                deep_cache=self.deep_cache)

        self._plain_graph = _plain_graph

    @classmethod
    def init_random(cls, key, *, size: int = 32, num_steps: int = 2,
                    attn_impl: str | None = "xla",
                    cfg_overrides: dict | None = None, **kw):
        """Seeded random-weight tiny-preset pipeline — the no-checkpoint
        demo/smoke constructor (see AmodalDepthPipeline.init_random).
        `cfg_overrides` patches the tiny DepthFMConfig (the dryrun's
        compile-budget knob)."""
        import jax

        from ..models import get_model
        model = get_model("DepthFMAmodal", tiny=True,
                          cfg_overrides=cfg_overrides)
        return cls(model.init(jax.random.PRNGKey(0) if key is None
                              else key),
                   model.config, size=size, num_steps=num_steps,
                   attn_impl=attn_impl, **kw)

    @classmethod
    def from_checkpoints(cls, depthfm_ckpt: str, vae_ckpt: str, *,
                         guide_type: str = "mask+observation",
                         cfg_overrides: dict | None = None, **kw):
        """depthfm_ckpt: the reference's `depthfm-v1.ckpt` (torch, UNet +
        empty-text embedding + hparams, `dfm_amodal.py:91-142`); vae_ckpt:
        diffusers SD-1.5 AutoencoderKL weights (.safetensors or .bin —
        the VAE ships separately, reference `dfm.py:20-22`). The VAE
        block topology is inferred from the state dict; `cfg_overrides`
        patches DepthFMConfig fields the ckpt hparams don't carry
        (e.g. vae_channels for non-SD VAEs)."""
        import dataclasses

        from ..convert.depthfm_convert import (convert_sd_vae,
                                               load_depthfm_ckpt)
        from ..convert.torch_to_jax import load_state_dict

        cfg, params = load_depthfm_ckpt(depthfm_ckpt, guide_type=guide_type)
        vae_sd = load_state_dict(vae_ckpt)
        n_down = 1 + max(int(k.split(".")[2]) for k in vae_sd
                         if k.startswith("encoder.down_blocks."))
        layers = 1 + max(int(k.split(".")[4]) for k in vae_sd
                         if k.startswith("encoder.down_blocks.0.resnets."))
        chans = tuple(
            int(vae_sd[f"encoder.down_blocks.{i}.resnets.0.conv1.weight"]
                .shape[0]) for i in range(n_down))
        overrides = {"vae_channels": chans, "vae_layers": layers,
                     "context_len":
                         int(params["empty_text_embed"].shape[-2])}
        overrides.update(cfg_overrides or {})
        cfg = dataclasses.replace(cfg, **overrides)
        params["vae"] = convert_sd_vae(vae_sd, n_down_blocks=n_down,
                                       layers_per_block=layers)
        return cls(params, cfg, **kw)

    def save_serving(self, path: str) -> None:
        """Persist the READY-TO-SERVE state (post bf16 cast / dynamic-int8
        quantization) — replicas restore bit-identically with zero
        re-quantization work (see pipeline/serving_ckpt.py)."""
        import dataclasses

        from .serving_ckpt import save_serving_state
        save_serving_state(path, {"params": self.params}, {
            "kind": "depthfm",
            "cfg": dataclasses.asdict(self.cfg),
            "size": self.size,
            "num_steps": self.num_steps,
            "attn_impl": self.attn_impl,
            "seed": self.seed,
            "tome": list(self.tome) if self.tome else None,
            "deep_cache": list(self.deep_cache) if self.deep_cache else None,
            "dtype": jnp.dtype(self.dtype).name,
        })

    @classmethod
    def load_serving(cls, path: str, *, mesh=None,
                     attn_impl: str | None = None):
        """Restore a pipeline saved by `save_serving` — param dtypes kept
        exactly (int8 kernels stay int8; no re-cast/re-quantization).
        `mesh` with a 'data' axis replicates for DP serving."""
        from .serving_ckpt import cfg_from_dict, restore_serving_state
        trees, meta = restore_serving_state(path, expect_kind="depthfm")
        tome = meta.get("tome")
        deep_cache = meta.get("deep_cache")
        return cls(trees["params"], cfg_from_dict(DepthFMConfig, meta["cfg"]),
                   size=int(meta["size"]), num_steps=int(meta["num_steps"]),
                   attn_impl=attn_impl or meta["attn_impl"],
                   seed=int(meta["seed"]),
                   tome=tuple(tome) if tome else None,
                   deep_cache=tuple(deep_cache) if deep_cache else None,
                   dtype=jnp.dtype(meta["dtype"]), mesh=mesh, cast=False)

    def quantize_int8(self, calibration=None, margin: float = 1.1,
                      **kw) -> None:
        """Opt-in W8A8 over the UNet + VAE
        (`ops/quant.py::quantize_diffusion_int8`; wide convs/linears only,
        output convs stay high precision — `kw` forwards the width
        thresholds / skip suffixes). Parity-breaking; measured +15%
        throughput at b8 @512 on v5e, but with DYNAMIC scales b1 latency
        regresses (the per-tensor run-time amax reductions serialize at
        small batch).

        `calibration=(image, mask, observation[, guide_rgb])` (same
        conventions as `__call__`) promotes every site to STATIC
        activation scales: one calibration trace — VAE encode, the Euler
        trajectory unrolled over `num_steps` UNet calls, VAE decode —
        records each site's dynamic scale and bakes in the observed max
        x `margin`, so serving forwards skip all amax reductions
        (`ops/quant.py::calibrate_diffusion_scales`)."""
        from ..ops.quant import (calibrate_diffusion_scales,
                                 quantize_diffusion_int8)
        self.params = jax.jit(
            functools.partial(quantize_diffusion_int8, **kw))(self.params)
        if calibration is None:
            return
        image, mask, observation, *rest = tuple(calibration) + (None,)
        guide_rgb = rest[0] if rest else None
        g = self.cfg.guide_type
        img, _ = self._batch(image, 3)
        msk, _ = self._batch(mask if "mask" in g else None, 1)
        obs, _ = self._batch(observation if "observation" in g else None, 1)
        grgb, _ = self._batch(guide_rgb if "image" in g else None, 3)
        rgb, m, o, gr = jax.jit(self._prep)(img, msk, obs, grgb)

        cfg, seed, num_steps = self.cfg, self.seed, self.num_steps
        attn_impl = self.attn_impl

        def run(qp, rgb, m, o, gr):
            # the Euler trajectory UNROLLED (calibrate_diffusion_scales
            # forbids lax.scan around the int8 sites) — mirrors
            # models.depthfm._euler_depth step for step
            from ..models.depthfm import (_conditioning, _guide_latents,
                                          q_sample)
            from ..models.unet_ldm import apply_unet
            from ..models.vae import vae_decode, vae_encode_mode
            lat = vae_encode_mode(qp["vae"], rgb, cfg.vae)
            cond = _guide_latents(qp, cfg, lat, gr, m, o)
            ca = _conditioning(qp, rgb.shape[0], rgb.dtype)
            noise = jax.random.normal(jax.random.PRNGKey(seed), lat.shape,
                                      lat.dtype)
            z = q_sample(lat, cfg.noising_step, noise,
                         cfg.n_diffusion_timesteps)
            dt = 1.0 / num_steps
            b = rgb.shape[0]
            for i in range(num_steps):
                t = jnp.full((b,), i * dt, rgb.dtype)
                v = apply_unet(qp["unet"], cfg.unet, z, t, context=cond,
                               context_ca=ca, attn_impl=attn_impl)
                z = z + dt * v
            vae_decode(qp["vae"], z, cfg.vae)

        self.params = calibrate_diffusion_scales(self.params, run,
                                                 rgb, m, o, gr,
                                                 margin=margin)

    def _batch(self, x, channels):
        """-> ([B,H,W,c] device array | None, was_unbatched)."""
        if x is None:
            return None, False
        arr = np.asarray(x, np.float32)
        if channels == 3:  # [H,W,3] or [B,H,W,3]
            squeeze = arr.ndim == 3
            if squeeze:
                arr = arr[None]
        else:  # [H,W] or [B,H,W] -> [B,H,W,1]
            squeeze = arr.ndim == 2
            arr = arr[None, :, :, None] if squeeze else arr[..., None]
        out = jnp.asarray(arr, self.dtype)
        if self._batch_sharding is not None:
            out = jax.device_put(out, self._batch_sharding)
        return out, squeeze

    def __call__(self, image: np.ndarray, mask: np.ndarray | None = None,
                 observation: np.ndarray | None = None,
                 guide_rgb: np.ndarray | None = None) -> np.ndarray:
        """image: [H,W,3] or [B,H,W,3] uint8/float in [0,255];
        mask: [H,W]/[B,H,W] (>0 = amodal object); observation: same
        shape in [0,1] (the normalized base depth); guide_rgb: un-occluded
        render in [0,255] for guide types including "image".

        Returns amodal depth [H,W] (or [B,H,W]) in [0,1], far = 0
        (the 1-x flip of `dfm_amodal.py:261-262`)."""
        g = self.cfg.guide_type
        if "mask" in g and mask is None:
            raise ValueError(f"guide_type {g!r} requires mask")
        if "observation" in g and observation is None:
            raise ValueError(f"guide_type {g!r} requires observation")
        if "image" in g and guide_rgb is None:
            raise ValueError(f"guide_type {g!r} requires guide_rgb")
        img, squeeze = self._batch(image, 3)
        msk, _ = self._batch(mask if "mask" in g else None, 1)
        obs, _ = self._batch(observation if "observation" in g else None, 1)
        grgb, _ = self._batch(guide_rgb if "image" in g else None, 3)
        out = self._amodal_graph(self.params, img, msk, obs, grgb)
        out = np.asarray(out[..., 0], np.float32)
        return out[0] if squeeze else out

    def predict_depth(self, image: np.ndarray, *, ensemble_size: int = 1,
                      num_steps: int = 2) -> np.ndarray:
        """Plain (unguided) DepthFM depth — the pseudo-label factory's
        labeler protocol (reference `dfm.py:59-94`, `sam_pl_gen.py:56-61`:
        2 steps x ensemble). Requires guide_type='none'. Returns
        [H,W]/[B,H,W] in [0,1] (no 1-x flip — factory convention)."""
        img, squeeze = self._batch(image, 3)
        out = self._plain_graph(self.params, img,
                                ensemble_size=ensemble_size,
                                n_steps=num_steps)
        out = np.asarray(out[..., 0], np.float32)
        return out[0] if squeeze else out
