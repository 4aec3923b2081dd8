"""Flow-matching trainers for the DepthFM generative branch.

Re-design of the reference `DepthFMAmodalTrainer` / `DepthFMTrainer`
(`src/trainer/depthfm_amodal_trainer.py:35-749`, `depthfm_trainer.py`):
the loss lives in LATENT space — `loss(model_pred[mask], target[mask])`
where the valid mask is conservatively downsampled to latent resolution
by max-pooling the *invalid* mask 8x8 (so any invalid pixel invalidates
its latent cell, reference :181-186) and strategy masks are
nearest-downsampled; the VAE (and empty-text embedding) stay frozen —
gradients flow through the UNet only (reference freezes the VAE and
optimizes the UNet, diff @65-71).

Everything runs as one jitted step with an explicit PRNG key per step
(the reference threads a torch Generator seeded from the global seed
sequence, :170-176).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.resize import resize_nearest
from ..utils.alignment import fit_scale_shift
from .state import TrainState
from .trainer import DiscriminativeTrainer, TrainerConfig

__all__ = ["DepthFMAmodalTrainer"]


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
                attn_impl=cfg.attn_impl)
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
