"""Trainer for the ADDeepLab two-head baseline.

Re-design of the reference `AmodalSynthDriveTrainer`
(`src/trainer/amodalsynthdrive_trainer.py:34-733`): the loss combines the
two sigmoid heads with the occlusion weight

    w_occ * loss(invisible_pred over amodal ∧ valid)
    + (1 - w_occ) * loss(visible_pred over ¬amodal ∧ valid)

(reference :216-234; w_occ from config, e.g. 0.7). BatchNorm running
stats are threaded through the jitted step (params tree = {params, bn});
evaluation uses the invisible head under the shared protocol.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.resize import resize_nearest
from ..utils.alignment import fit_scale_shift
from .state import TrainState
from .trainer import DiscriminativeTrainer, TrainerConfig

__all__ = ["AmodalSynthDriveTrainer"]


class AmodalSynthDriveTrainer(DiscriminativeTrainer):
    def __init__(self, cfg: TrainerConfig, model, *args, w_occ: float = 0.7,
                 **kwargs):
        self.w_occ = w_occ
        super().__init__(cfg, model, *args, **kwargs)

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        dtype = jnp.dtype(cfg.compute_dtype)
        w_occ = self.w_occ

        def loss_of(params, tree, batch):
            full = {"params": params, "bn": tree["bn"]}
            rgb = (batch["rgb_int"] / 255.0).astype(dtype)
            (vis, invis), new_bn = model.apply(
                full, rgb, guide_mask=batch["guide"].astype(dtype),
                train=True, attn_impl=cfg.attn_impl)
            gt = batch[cfg.gt_depth_type]
            vis = resize_nearest(vis.astype(jnp.float32), size=gt.shape[1:3])
            invis = resize_nearest(invis.astype(jnp.float32),
                                   size=gt.shape[1:3])
            valid = batch[cfg.gt_mask_type] > 0
            amodal = batch["guide"] > 0
            l_inv = loss_fn(invis, gt, valid & amodal)
            l_vis = loss_fn(vis, gt, valid & ~amodal)
            loss = w_occ * l_inv + (1.0 - w_occ) * l_vis
            return jnp.where(jnp.isfinite(loss), loss, 0.0), new_bn

        def train_step(state: TrainState, batch):
            tree = state.params
            (loss, new_bn), grads = jax.value_and_grad(
                loss_of, has_aux=True)(tree["params"], tree, batch)
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            grads_tree = {"params": grads,
                          "bn": jax.tree.map(jnp.zeros_like, tree["bn"])}
            updates, opt_state = tx.update(grads_tree, state.opt_state, tree)
            new_tree = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                    tree, updates)
            new_tree = {"params": new_tree["params"], "bn": new_bn}
            return state.replace(params=new_tree, opt_state=opt_state,
                                 step=state.step + 1), loss

        return self._jit_train_step(train_step)

    def _build_eval_forward(self):
        cfg = self.cfg
        model = self.model
        dtype = jnp.dtype(cfg.compute_dtype)

        @jax.jit
        def eval_forward(tree, batch):
            rgb = (batch["rgb_int"] / 255.0).astype(dtype)
            (_vis, invis), _ = model.apply(
                tree, rgb, guide_mask=batch["guide"].astype(dtype),
                train=False, attn_impl=cfg.attn_impl)
            pred = invis.astype(jnp.float32)
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
