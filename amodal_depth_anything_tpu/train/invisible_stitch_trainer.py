"""InvisibleStitch trainer: the discriminative skeleton with the model's
deviating call signature `model(x, invisible_mask=, observation=)`
(reference `invisible_stitch_trainer.py` diff @195-196,538-539; no
`entire_scene` strategy)."""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.resize import resize_nearest
from ..utils.alignment import fit_scale_shift
from .state import TrainState
from .trainer import DiscriminativeTrainer, _strategy_loss

__all__ = ["InvisibleStitchTrainer"]


class InvisibleStitchTrainer(DiscriminativeTrainer):
    def _forward(self, params, batch, dtype):
        rgb = (batch["rgb_int"] / 255.0).astype(dtype)
        pred = self.model.apply(
            params, rgb,
            invisible_mask=batch["invisible_mask"].astype(dtype),
            observation=batch["depth_observation"].astype(dtype))
        return pred.astype(jnp.float32)

    def _build_train_step(self):
        cfg = self.cfg
        if cfg.loss_strategy == "entire_scene":
            raise ValueError(
                "InvisibleStitch does not support the entire_scene strategy")
        loss_fn = self.loss_fn
        tx = self.tx
        dtype = jnp.dtype(cfg.compute_dtype)
        forward = self._forward

        def loss_of(params, batch):
            pred = forward(params, batch, dtype)
            gt = batch[cfg.gt_depth_type]
            if pred.shape[1:3] != gt.shape[1:3]:
                pred = resize_nearest(pred, size=gt.shape[1:3])
            valid = batch[cfg.gt_mask_type] > 0
            loss = _strategy_loss(
                loss_fn, cfg.loss_strategy, pred, gt, valid,
                batch["guide"] > 0, batch["invisible_mask"] > 0,
                batch["visible_mask"] > 0)
            return jnp.where(jnp.isfinite(loss), loss, 0.0)

        def train_step(state: TrainState, batch):
            loss, grads = jax.value_and_grad(loss_of)(state.params, batch)
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
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        forward = self._forward

        @jax.jit
        def eval_forward(params, batch):
            pred = forward(params, batch, dtype)
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
