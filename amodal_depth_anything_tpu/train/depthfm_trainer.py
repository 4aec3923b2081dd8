"""Generative-branch trainers: flow matching (amodal) + DDPM finetune.

Re-design of the reference `DepthFMAmodalTrainer` / `DepthFMTrainer`
(`src/trainer/depthfm_amodal_trainer.py:35-749`, `depthfm_trainer.py`):
the loss lives in LATENT space — `loss(model_pred[mask], target[mask])`
where the valid mask is conservatively downsampled to latent resolution
by max-pooling the *invalid* mask 8x8 (so any invalid pixel invalidates
its latent cell, reference :181-186) and strategy masks are
nearest-downsampled; the VAE (and empty-text embedding) stay frozen —
gradients flow through the UNet only (reference freezes the VAE and
optimizes the UNet, diff @65-71).

`DepthFMTrainer` is a DIFFERENT training path (reference
`src/trainer/depthfm_trainer.py:93-310`): a Marigold-style DDPM
finetune used as the pseudo-label factory — DDPM noise schedule with
per-sample integer timesteps, optional multi-resolution noise with
timestep annealing, VAE-encoded 3-channel-stacked depth, and
sample/epsilon/v-prediction targets.

Everything runs as one jitted step with an explicit PRNG key per step
(the reference threads a torch Generator seeded from the global seed
sequence, :170-176).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_nearest
from ..utils.alignment import fit_scale_shift
from .state import TrainState
from .trainer import DiscriminativeTrainer, TrainerConfig

__all__ = ["DepthFMAmodalTrainer", "DepthFMTrainer"]


def _unet_remat(cfg: TrainerConfig) -> bool:
    """UNet-level jax.checkpoint only when remat is explicitly boolean
    True: TrainerConfig.remat defaults to "attn" (a DISCRIMINATIVE-path
    policy naming Pallas attention residuals, trainer.py) which has no
    meaning for the LDM UNet — treating it as truthy would silently turn
    full per-level recompute on for every default-configured DepthFM run."""
    return cfg.remat is True


def _latent_masks(batch, cfg: TrainerConfig, latent_hw, vae_factor: int):
    valid = batch[cfg.gt_mask_type] > 0
    invalid = jnp.logical_not(valid).astype(jnp.float32)
    pooled = jax.lax.reduce_window(
        invalid, -jnp.inf, jax.lax.max,
        (1, vae_factor, vae_factor, 1), (1, vae_factor, vae_factor, 1),
        "VALID")
    valid_down = pooled <= 0  # no invalid pixel in the cell
    guide = resize_nearest(batch["guide"], size=latent_hw) > 0
    invisible = resize_nearest(batch["invisible_mask"], size=latent_hw) > 0
    return valid_down, guide, invisible


class DepthFMAmodalTrainer(DiscriminativeTrainer):
    """Trainer for DepthFMAmodal (and plain DepthFM with guide_type none)."""

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        dtype = jnp.dtype(cfg.compute_dtype)
        base_seed = cfg.init_seed or 0
        vae_factor = 2 ** (len(model.config.vae_channels) - 1)

        def loss_of(trainable, frozen, batch, rng):
            params = {**frozen, "unet": trainable}
            pred, target = model.apply(
                params, batch["rgb_norm"].astype(dtype), rng=rng,
                mode="train", depth=batch[cfg.gt_depth_type].astype(dtype),
                guide_rgb=batch["guide_rgb_norm"].astype(dtype),
                guide_mask=batch["guide"].astype(dtype),
                observation=batch["depth_observation"].astype(dtype),
                attn_impl=cfg.attn_impl, remat=_unet_remat(cfg))
            pred = pred.astype(jnp.float32)
            target = target.astype(jnp.float32)
            valid_down, guide, invisible = _latent_masks(
                batch, cfg, pred.shape[1:3], vae_factor)
            if cfg.loss_strategy == "invisible_part":
                mask = valid_down & invisible
            elif cfg.loss_strategy == "entire_target_object":
                mask = valid_down & guide
            elif cfg.loss_strategy == "entire_scene":
                mask = valid_down
            else:
                raise ValueError(
                    f"unsupported depthfm loss strategy: {cfg.loss_strategy}")
            mask4 = jnp.broadcast_to(mask, pred.shape)
            loss = loss_fn(pred, target, mask4)
            return jnp.where(jnp.isfinite(loss), loss, 0.0)

        def train_step(state: TrainState, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(base_seed),
                                     state.step)
            frozen = {k: v for k, v in state.params.items() if k != "unet"}
            loss, grads_unet = jax.value_and_grad(loss_of)(
                state.params["unet"], frozen, batch, rng)
            grads = {**jax.tree.map(jnp.zeros_like, frozen),
                     "unet": grads_unet}
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), loss

        return self._jit_train_step(train_step)

    def _build_eval_forward(self):
        cfg = self.cfg
        model = self.model
        dtype = jnp.dtype(cfg.compute_dtype)
        base_seed = cfg.val_init_seed

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def eval_forward(params, batch, num_steps=4):
            pred = model.apply(
                params, batch["rgb_norm"].astype(dtype),
                rng=jax.random.PRNGKey(base_seed), mode="eval",
                num_steps=num_steps,
                guide_rgb=batch["guide_rgb_norm"].astype(dtype),
                guide_mask=batch["guide"].astype(dtype),
                observation=batch["depth_observation"].astype(dtype),
                attn_impl=cfg.attn_impl)
            pred = pred.astype(jnp.float32)
            gt = batch[cfg.gt_depth_type]
            if pred.shape[1:3] != gt.shape[1:3]:
                pred = resize_nearest(pred, size=gt.shape[1:3])
            scale, shift = fit_scale_shift(
                pred[..., 0], batch["depth_observation"][..., 0],
                batch["visible_mask"][..., 0])
            aligned = pred * scale[:, None, None, None] + \
                shift[:, None, None, None]
            return pred, aligned

        return eval_forward


class DepthFMTrainer(DepthFMAmodalTrainer):
    """Marigold-style DDPM finetune — the pseudo-label factory path.

    The reference's `DepthFMTrainer` (`src/trainer/depthfm_trainer.py`)
    is NOT the flow-matching amodal trainer: it finetunes a depth
    diffusion UNet with a diffusers `DDPMScheduler`
    (scaled-linear betas from the stable-diffusion-2 config, :93-105),
    per-sample integer timesteps (:240-247), optional multi-resolution
    noise with timestep annealing (:249-261), stacked 3-channel depth
    encoded through the frozen VAE (:389-403), and
    sample/epsilon/v-prediction targets (:291-301) under the 8x8
    maxpool-downsampled latent valid mask (:216-227).

    Here that is one jitted step on a DepthFM model with
    `guide_type='none'` (conv-in 8 = rgb latent 4 + noisy depth latent
    4); gradients flow through the UNet only. Evaluation samples with
    the DDIM `lax.scan` (prediction-type-converted to epsilon) and
    min-max normalizes the decoded depth.
    """

    def __init__(self, cfg: TrainerConfig, model, *args,
                 prediction_type: str = "v_prediction",
                 num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 multi_res_noise: dict | None = None, **kwargs):
        if prediction_type not in ("sample", "epsilon", "v_prediction"):
            raise ValueError(f"unknown prediction type {prediction_type!r}")
        self.prediction_type = prediction_type
        self.num_train_timesteps = int(num_train_timesteps)
        self.beta_start = float(beta_start)
        self.beta_end = float(beta_end)
        self.multi_res_noise = dict(multi_res_noise) if multi_res_noise \
            else None
        super().__init__(cfg, model, *args, **kwargs)

    def _build_train_step(self):
        from ..models.unet_ldm import apply_unet
        from ..models.vae import vae_encode_mode
        from ..ops.ddim import (ddpm_add_noise, ddpm_velocity,
                                linear_alphas_cumprod)
        from ..utils.multi_res_noise import multi_res_noise_like

        cfg = self.cfg
        model = self.model
        mcfg = model.config
        loss_fn = self.loss_fn
        tx = self.tx
        dtype = jnp.dtype(cfg.compute_dtype)
        base_seed = cfg.init_seed or 0
        vae_factor = 2 ** (len(mcfg.vae_channels) - 1)
        T = self.num_train_timesteps
        pred_type = self.prediction_type
        mrn = self.multi_res_noise
        alphas = linear_alphas_cumprod(T, self.beta_start, self.beta_end)

        def loss_of(trainable, frozen, batch, rng):
            params = {**frozen, "unet": trainable}
            k_t, k_noise = jax.random.split(rng)
            rgb = batch["rgb_norm"].astype(dtype)
            b = rgb.shape[0]
            rgb_latent = vae_encode_mode(params["vae"], rgb, mcfg.vae)
            # stacked 3-channel depth through the frozen VAE (:389-403)
            depth3 = jnp.repeat(batch[cfg.gt_depth_type].astype(dtype), 3,
                                axis=-1)
            gt_latent = vae_encode_mode(params["vae"], depth3, mcfg.vae)
            t = jax.random.randint(k_t, (b,), 0, T)
            if mrn is not None:
                ann = None
                if mrn.get("annealed", True):
                    # strength annealed by t/T (reference :252-255)
                    ann = (t.astype(jnp.float32) / T).reshape(
                        b, 1, 1, 1).astype(gt_latent.dtype)
                noise = multi_res_noise_like(
                    k_noise, gt_latent,
                    strength=float(mrn.get("strength", 0.9)),
                    downscale_strategy=mrn.get("downscale_strategy",
                                               "original"),
                    annealed_t=ann)
            else:
                noise = jax.random.normal(k_noise, gt_latent.shape,
                                          gt_latent.dtype)
            noisy = ddpm_add_noise(alphas, gt_latent, noise, t)
            cond = jnp.broadcast_to(
                params["empty_text_embed"].astype(dtype),
                (b,) + params["empty_text_embed"].shape[1:])
            pred = apply_unet(params["unet"], mcfg.unet, noisy,
                              t.astype(dtype), context=rgb_latent,
                              context_ca=cond, attn_impl=cfg.attn_impl,
                              remat=_unet_remat(cfg))
            if pred_type == "sample":
                target = gt_latent
            elif pred_type == "epsilon":
                target = noise
            else:
                target = ddpm_velocity(alphas, gt_latent, noise, t)
            valid_down, _, _ = _latent_masks(batch, cfg, pred.shape[1:3],
                                             vae_factor)
            mask4 = jnp.broadcast_to(valid_down, pred.shape)
            loss = loss_fn(pred.astype(jnp.float32),
                           target.astype(jnp.float32), mask4)
            return jnp.where(jnp.isfinite(loss), loss, 0.0)

        def train_step(state: TrainState, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(base_seed),
                                     state.step)
            frozen = {k: v for k, v in state.params.items() if k != "unet"}
            loss, grads_unet = jax.value_and_grad(loss_of)(
                state.params["unet"], frozen, batch, rng)
            grads = {**jax.tree.map(jnp.zeros_like, frozen),
                     "unet": grads_unet}
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), loss

        return self._jit_train_step(train_step)

    def _build_eval_forward(self):
        from ..models.unet_ldm import apply_unet
        from ..models.vae import vae_decode, vae_encode_mode
        from ..ops.ddim import ddim_sample, linear_alphas_cumprod

        cfg = self.cfg
        model = self.model
        mcfg = model.config
        dtype = jnp.dtype(cfg.compute_dtype)
        base_seed = cfg.val_init_seed
        T = self.num_train_timesteps
        pred_type = self.prediction_type
        alphas = linear_alphas_cumprod(T, self.beta_start, self.beta_end)

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def eval_forward(params, batch, num_steps=4):
            rgb = batch["rgb_norm"].astype(dtype)
            b = rgb.shape[0]
            rgb_latent = vae_encode_mode(params["vae"], rgb, mcfg.vae)
            cond = jnp.broadcast_to(
                params["empty_text_embed"].astype(dtype),
                (b,) + params["empty_text_embed"].shape[1:])

            def eps_fn(x, tb):
                v = apply_unet(params["unet"], mcfg.unet, x,
                               tb.astype(dtype), context=rgb_latent,
                               context_ca=cond, attn_impl=cfg.attn_impl)
                if pred_type == "epsilon":
                    return v
                ab = alphas[tb].astype(x.dtype)[:, None, None, None]
                if pred_type == "v_prediction":
                    # eps = sqrt(ab)*v + sqrt(1-ab)*x_t
                    return jnp.sqrt(ab) * v + jnp.sqrt(1.0 - ab) * x
                # sample: eps = (x_t - sqrt(ab)*x0) / sqrt(1-ab)
                return (x - jnp.sqrt(ab) * v) / jnp.sqrt(1.0 - ab)

            z = ddim_sample(eps_fn, jax.random.PRNGKey(base_seed),
                            rgb_latent.shape, num_steps=num_steps,
                            n_train_timesteps=T, dtype=rgb_latent.dtype,
                            beta_start=self.beta_start,
                            beta_end=self.beta_end)
            decoded = vae_decode(params["vae"], z, mcfg.vae)
            depth = jnp.mean(decoded, axis=-1, keepdims=True)
            depth = depth.astype(jnp.float32)
            # per-sample min-max to [0,1] (pseudo-label convention,
            # reference dfm.py:59-94)
            lo = jnp.min(depth, axis=(1, 2), keepdims=True)
            hi = jnp.max(depth, axis=(1, 2), keepdims=True)
            pred = (depth - lo) / jnp.maximum(hi - lo, 1e-8)
            gt = batch[cfg.gt_depth_type]
            if pred.shape[1:3] != gt.shape[1:3]:
                pred = resize_nearest(pred, size=gt.shape[1:3])
            if "depth_observation" in batch:
                scale, shift = fit_scale_shift(
                    pred[..., 0], batch["depth_observation"][..., 0],
                    batch["visible_mask"][..., 0])
            else:
                # plain depth datasets (the factory's eval protocol,
                # reference :544-560): align to GT over the valid mask
                scale, shift = fit_scale_shift(
                    pred[..., 0], gt[..., 0].astype(jnp.float32),
                    batch[cfg.gt_mask_type][..., 0] > 0)
            aligned = pred * scale[:, None, None, None] + \
                shift[:, None, None, None]
            return pred, aligned

        return eval_forward
