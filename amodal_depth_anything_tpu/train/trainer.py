"""Discriminative trainer: jit train step, DP sharding, Orbax checkpoints.

TPU-native re-design of the reference trainer
(`src/trainer/discriminative_trainer.py:36-770`):

  * The whole train step — forward, loss-strategy masking, SSI alignment,
    backward, grad clip, Adam update — is ONE jitted program with donated
    state. The reference's ssi strategies round-trip predictions to CPU
    numpy inside the step (:235-241); here the least-squares fit is a
    closed-form on-device solve (`utils.alignment.fit_scale_shift`).
  * Data parallelism is a `Mesh` + NamedSharding batch sharding: XLA
    all-reduces gradients over ICI; there is no DDP wrapper, no NCCL
    glue, no `gather_for_metrics` — eval metrics are scalars computed
    under the same sharding.
  * Gradient accumulation uses `optax.MultiSteps` (reference computes
    eff_bs/(max_bs*n_dev) micro-steps, `train.py:104-107`).
  * Checkpoint/resume via Orbax: params, optimizer state, step, epoch,
    batch-in-epoch, best metric, in_evaluation flag — the reference
    saves the same set (:709-727) but its `--resume_run` is stubbed
    (`train.py:94-95`); ours actually restores.
  * Loss strategies (reference :216-276): invisible_part,
    entire_target_object, entire_scene, ssi invisible_part,
    ssi entire_target_object. NaN-guard: non-finite loss contributes 0
    gradient (reference :246-251 zero-loss fallback).

Validation protocol (reference :470-670): per-sample prediction, least-
squares alignment of pred to the *observation* over the visible mask,
difficulty binning by visibility ratio (>0.75 easy / >0.5 mid / else
hard), the 10-metric suite on the invisible region, raw + aligned
tracker banks, best-model selection on the aligned-overall main metric.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import Model
from ..ops.resize import resize_nearest
from ..parallel import make_mesh, shard_batch, shard_params
from ..utils.alignment import align_depth_least_square_np, fit_scale_shift
from ..utils.loss import get_loss, l1_loss
from ..utils.metrics import METRIC_FNS, MetricTracker
from .state import TrainState, create_train_state, make_optimizer

__all__ = ["DiscriminativeTrainer", "TrainerConfig"]

LOGGER = logging.getLogger(__name__)

LOSS_STRATEGIES = ("invisible_part", "entire_target_object", "entire_scene",
                   "ssi invisible_part", "ssi entire_target_object")

DIFFICULTY_BUCKETS = ("easy", "mid", "diff")


@dataclasses.dataclass
class TrainerConfig:
    loss_strategy: str = "entire_target_object"
    loss_name: str = "silog_loss"
    loss_kwargs: dict = dataclasses.field(default_factory=lambda: {"beta": 0.15})
    lr: float = 3e-5
    lr_total_iter: int = 50000
    lr_final_ratio: float = 0.01
    lr_warmup_steps: int = 100
    max_grad_norm: float = 0.01
    max_iter: int = 60000
    max_epoch: int = 10000
    accumulation_steps: int = 1
    gt_depth_type: str = "depth_gt"
    gt_mask_type: str = "valid_mask_raw"
    init_seed: int | None = 2024
    val_init_seed: int = 2024
    eval_metrics: Sequence[str] = tuple(METRIC_FNS)
    main_val_metric: str = "abs_relative_difference"
    main_val_metric_goal: str = "minimize"
    save_period: int = 20000
    backup_period: int = 20000
    validation_period: int = 10000
    visualization_period: int = 10000
    log_interval: int = 200
    compute_dtype: str = "float32"  # 'bfloat16' for TPU speed
    # update rule: "adam" (reference recipe) | "adam-bf16mu" | "adafactor"
    # (factored second moment — the single-chip escape hatch for vitg,
    # whose f32 Adam state alone is 8.8 GB; see train/state.py)
    optimizer: str = "adam"
    # False | True (full per-block recompute) | "attn" (save the Pallas
    # attention out/LSE so backward never re-runs the forward kernel —
    # measured 508.5 -> 490.9 ms/step at vitl@518 b8 bf16, +~560 MB HBM;
    # remat=False outright OOMs: 23.2 GB needed on a 16 GB chip)
    remat: "bool | str" = "attn"
    attn_impl: str | None = None
    # ZeRO-3-style parameter/optimizer sharding over the mesh's data axis
    # (parallel/sharding.py::_fsdp_extend); composes with the model axis.
    fsdp: bool = False
    # Megatron-SP: trunk token stream sharded over the model axis between
    # matmuls (models/dinov2.py::_run_blocks act_sharding). No-op unless
    # the mesh's model axis is >1.
    sequence_parallel: bool = False
    # jax.profiler trace capture: write a TensorBoard profile of micro
    # steps [profile_start, profile_start + profile_steps) to this dir
    profile_dir: str | None = None
    profile_start: int = 50
    profile_steps: int = 5
    # DPT-head batch tiling UNDER GRAD (the serving AMODAL_HEAD_TILE
    # trick applied to training): run head fwd+bwd in lax.map chunks of
    # this batch size — exact, caps the full-grid fusion pyramid's
    # activation peak. The single-chip HBM lever for vitg@518 b8, which
    # otherwise OOMs by 595 MB even with adafactor (RESULTS_r03_tpu.md).
    head_tile: int | None = None


def _strategy_loss(loss_fn, strategy: str, pred, gt, valid, guide, invisible,
                   visible):
    """pred/gt [B,H,W,1]; masks [B,H,W,1] bool. Returns scalar loss."""
    if strategy == "invisible_part":
        return loss_fn(pred, gt, valid & invisible)
    if strategy == "entire_target_object":
        return loss_fn(pred, gt, valid & guide)
    if strategy == "entire_scene":
        return loss_fn(pred, gt)
    if strategy in ("ssi invisible_part", "ssi entire_target_object"):
        # On-device closed-form scale/shift fit over the visible region
        # (replaces the reference's host lstsq round-trip, :235-241), then
        # masked L1 on the target region.
        scale, shift = fit_scale_shift(pred[..., 0], gt[..., 0],
                                       visible[..., 0])
        aligned = pred * scale[:, None, None, None] + shift[:, None, None, None]
        region = valid & (invisible if "invisible" in strategy else guide)
        m = region.astype(pred.dtype)
        n = jnp.maximum(jnp.sum(m), 1.0)
        return jnp.sum(jnp.abs(aligned - gt) * m) / n
    raise ValueError(f"unknown loss strategy: {strategy}")


class DiscriminativeTrainer:
    """Trainer for AmodalDAv2-style pixel-space models."""

    def __init__(self, cfg: TrainerConfig, model: Model, train_loader,
                 val_loaders=None, vis_loaders=None, *, mesh=None,
                 out_dir_ckpt=None, out_dir_eval=None, out_dir_vis=None,
                 params=None, seed: int = 0):
        self.cfg = cfg
        self.model = model
        self.train_loader = train_loader
        self.val_loaders = val_loaders or []
        self.vis_loaders = vis_loaders or []
        self.out_dir_ckpt = out_dir_ckpt
        self.out_dir_eval = out_dir_eval
        self.out_dir_vis = out_dir_vis

        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = make_optimizer(
            lr=cfg.lr, total_iter=cfg.lr_total_iter,
            final_ratio=cfg.lr_final_ratio, warmup_steps=cfg.lr_warmup_steps,
            max_grad_norm=cfg.max_grad_norm,
            accumulation_steps=cfg.accumulation_steps,
            optimizer=cfg.optimizer)
        if params is None:
            params = model.init(jax.random.PRNGKey(seed))
        params = shard_params(self.mesh, params, fsdp=cfg.fsdp)
        self.state = create_train_state(params, self.tx, mesh=self.mesh)
        self.loss_fn = get_loss(cfg.loss_name, **(cfg.loss_kwargs or {}))

        # metric trackers: {bucket or overall} x {raw, aligned}
        names = list(cfg.eval_metrics)
        self.metric_banks = {
            key: MetricTracker(*names)
            for key in ("overall", "easy", "mid", "diff",
                        "align_overall", "align_easy", "align_mid",
                        "align_diff")
        }
        self.train_metrics = MetricTracker("loss")
        goal_min = cfg.main_val_metric_goal == "minimize"
        self.best_metric = float("inf") if goal_min else -float("inf")
        self._goal_min = goal_min

        self.epoch = 0
        self.n_batch_in_epoch = 0
        self.effective_iter = 0
        self.in_evaluation = False

        from ..utils.profiling import StepTimer
        self.step_timer = StepTimer()
        self._micro_step_count = 0
        self._tracing = False

        self._train_step = self._build_train_step()
        self._eval_forward = self._build_eval_forward()
        self._batch_metrics = self._build_batch_metrics()

    # ------------------------------------------------------------ jit builds

    def _act_sharding(self):
        """Sequence-parallel token sharding when enabled and meaningful."""
        if not self.cfg.sequence_parallel:
            return None
        if self.mesh.shape.get("model", 1) <= 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P("data", "model", None))

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        dtype = jnp.dtype(cfg.compute_dtype)
        # only ViT-trunk models accept act_sharding; omit it otherwise
        sp_kw = ({} if self._act_sharding() is None
                 else {"act_sharding": self._act_sharding()})
        if cfg.head_tile:
            # capability check like act_sharding above: only the DPT-head
            # model families accept head_batch_tile; a loud error beats a
            # TypeError at the first train step for other registries
            import inspect
            try:
                ok = "head_batch_tile" in inspect.signature(
                    model.apply).parameters
            except (TypeError, ValueError):
                ok = False
            if not ok:
                raise ValueError(
                    f"TrainerConfig.head_tile is not supported by model "
                    f"{model.name!r} (apply() has no head_batch_tile)")
            sp_kw = dict(sp_kw, head_batch_tile=cfg.head_tile)

        def loss_of(params, batch):
            rgb = (batch["rgb_int"] / 255.0).astype(dtype)
            pred = model.apply(
                params, rgb,
                guide_rgb=batch["guide_rgb_norm"].astype(dtype),
                guide_mask=(batch["guide"] * 2.0 - 1.0).astype(dtype),
                observation=(batch["depth_observation"] * 2.0 - 1.0).astype(dtype),
                attn_impl=cfg.attn_impl, remat=cfg.remat, **sp_kw)
            pred = pred.astype(jnp.float32)
            gt = batch[cfg.gt_depth_type]
            if pred.shape[1:3] != gt.shape[1:3]:
                pred = resize_nearest(pred, size=gt.shape[1:3])
            valid = batch[cfg.gt_mask_type] > 0
            loss = _strategy_loss(
                loss_fn, cfg.loss_strategy, pred, gt, valid,
                batch["guide"] > 0, batch["invisible_mask"] > 0,
                batch["visible_mask"] > 0)
            # NaN guard (reference zero-loss fallback, :246-251)
            return jnp.where(jnp.isfinite(loss), loss, 0.0)

        def train_step(state: TrainState, batch):
            loss, grads = jax.value_and_grad(loss_of)(state.params, batch)
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1), loss

        return self._jit_train_step(train_step)

    def _jit_train_step(self, fn):
        """jit a `(state, batch) -> (state, loss)` step with donated state
        and output shardings pinned to the init-time state placement:
        without the pin, XLA's sharding propagation may pick different
        output layouts on a TP mesh than `create_train_state` chose, so
        step 2 sees new input shardings and the whole graph compiles
        twice."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        state_shardings = jax.tree.map(lambda x: x.sharding, self.state)
        return jax.jit(fn, donate_argnums=(0,),
                       out_shardings=(state_shardings,
                                      NamedSharding(self.mesh, P())))

    def _build_eval_forward(self):
        cfg = self.cfg
        model = self.model
        dtype = jnp.dtype(cfg.compute_dtype)

        @jax.jit
        def eval_forward(params, batch):
            rgb = (batch["rgb_int"] / 255.0).astype(dtype)
            pred = model.apply(
                params, rgb,
                guide_rgb=batch["guide_rgb_norm"].astype(dtype),
                guide_mask=(batch["guide"] * 2.0 - 1.0).astype(dtype),
                observation=(batch["depth_observation"] * 2.0 - 1.0).astype(dtype),
                attn_impl=cfg.attn_impl)
            pred = pred.astype(jnp.float32)
            gt = batch[cfg.gt_depth_type]
            if pred.shape[1:3] != gt.shape[1:3]:
                pred = resize_nearest(pred, size=gt.shape[1:3])
            # on-device alignment of pred to observation over visible mask
            scale, shift = fit_scale_shift(
                pred[..., 0], batch["depth_observation"][..., 0],
                batch["visible_mask"][..., 0])
            aligned = pred * scale[:, None, None, None] + \
                shift[:, None, None, None]
            return pred, aligned

        return eval_forward

    def _build_batch_metrics(self):
        """One jitted program computing the whole metric suite for BOTH
        banks of a batch: [B, n_metrics] raw + aligned. Replaces the
        per-sample per-metric dispatch loop (~20 device round-trips per
        sample — hours of pure dispatch on a tunneled TPU for the
        3,999-sample protocol split); now it is one dispatch per batch."""
        from ..utils.metrics import compute_metrics_per_sample
        names = tuple(self.cfg.eval_metrics)

        @jax.jit
        def batch_metrics(pred, aligned, gt, mask):
            # +1e-5 shift matches the reference's epsilon on both operands
            m_raw = compute_metrics_per_sample(pred + 1e-5, gt + 1e-5,
                                               mask, names)
            m_al = compute_metrics_per_sample(aligned + 1e-5, gt + 1e-5,
                                              mask, names)
            return m_raw, m_al

        return batch_metrics

    # ---------------------------------------------------------------- train

    def _device_batch(self, batch: dict) -> dict:
        tensors = {k: v for k, v in batch.items()
                   if isinstance(v, np.ndarray) and v.dtype != object}
        return shard_batch(self.mesh, tensors)

    def train(self, t_end: float | None = None) -> None:
        """Run until max_iter effective iters (or wall-clock t_end, epoch
        semantics as in reference :143-407)."""
        cfg = self.cfg
        if self.in_evaluation:
            LOGGER.info("finishing interrupted evaluation before training")
            self.validate()
            self.in_evaluation = False
            self.save_checkpoint("latest")
        self.train_metrics.reset()
        micro_per_eff = cfg.accumulation_steps
        micro_count = 0

        try:
            self._train_loop(cfg, micro_per_eff, micro_count, t_end)
        finally:
            self._stop_profile()

    def _train_loop(self, cfg, micro_per_eff, micro_count, t_end):
        for epoch in range(self.epoch, cfg.max_epoch + 1):
            self.epoch = epoch
            self.train_loader.set_epoch(epoch)
            if self.n_batch_in_epoch:
                self.train_loader.skip_first_batches(self.n_batch_in_epoch)
            for batch in self.train_loader:
                dev_batch = self._device_batch(batch)
                self._profile_tick()
                with self.step_timer.step():
                    self.state, loss = self._train_step(self.state, dev_batch)
                    loss = float(loss)  # device sync: time the real step
                self._micro_step_count += 1
                self.n_batch_in_epoch += 1
                micro_count += 1
                self.train_metrics.update("loss", loss)

                if micro_count >= micro_per_eff:
                    micro_count = 0
                    self.effective_iter += 1
                    if self.effective_iter % cfg.log_interval == 0:
                        LOGGER.info("iter %d loss %.5f", self.effective_iter,
                                    self.train_metrics.avg("loss"))
                        from ..utils.logging_util import tb_logger
                        scalars = {"train/loss":
                                   self.train_metrics.avg("loss")}
                        timing = self.step_timer.summary()
                        if timing:
                            scalars["perf/step_p50_s"] = timing["p50_s"]
                            scalars["perf/steps_per_sec"] = \
                                timing["steps_per_sec"]
                        tb_logger.log_dic(scalars, self.effective_iter)
                        self.train_metrics.reset()
                    self._periodic_callbacks()
                    if self.effective_iter >= cfg.max_iter:
                        self.save_checkpoint("latest")
                        return
                if t_end is not None and time.time() >= t_end:
                    LOGGER.info("time limit reached; saving latest checkpoint")
                    self.save_checkpoint("latest")
                    return
            self.n_batch_in_epoch = 0
        self.save_checkpoint("latest")

    def _profile_tick(self) -> None:
        """Start/stop the jax.profiler trace window (SURVEY.md §5.1 —
        the reference ships no profiler at all)."""
        cfg = self.cfg
        if not cfg.profile_dir:
            return
        import jax
        if self._micro_step_count == cfg.profile_start and not self._tracing:
            jax.profiler.start_trace(cfg.profile_dir)
            self._tracing = True
        elif self._tracing and self._micro_step_count >= \
                cfg.profile_start + cfg.profile_steps:
            jax.profiler.stop_trace()
            self._tracing = False

    def _stop_profile(self) -> None:
        if self._tracing:
            import jax
            jax.profiler.stop_trace()
            self._tracing = False

    def _periodic_callbacks(self) -> None:
        cfg = self.cfg
        it = self.effective_iter
        if cfg.validation_period and it % cfg.validation_period == 0 \
                and self.val_loaders:
            self.in_evaluation = True
            self.save_checkpoint("latest")
            self.validate()
            self.in_evaluation = False
            self.save_checkpoint("latest")
        if cfg.save_period and it % cfg.save_period == 0:
            self.save_checkpoint(f"iter_{it:06d}")
        if cfg.visualization_period and it % cfg.visualization_period == 0 \
                and self.vis_loaders:
            self.visualize()

    # ------------------------------------------------------------- validate

    def validate(self) -> dict:
        results = {}
        for loader in self.val_loaders:
            name = getattr(loader.dataset, "disp_name", "val")
            results[name] = self.validate_single_dataset(loader, eval=True)
            main = self.metric_banks["align_overall"].avg(
                self.cfg.main_val_metric)
            if np.isfinite(main):
                better = main < self.best_metric if self._goal_min \
                    else main > self.best_metric
                if better:
                    self.best_metric = main
                    LOGGER.info("new best %s = %.6f",
                                self.cfg.main_val_metric, main)
                    if self.out_dir_ckpt:
                        self.save_checkpoint("best")
        return results

    def validate_single_dataset(self, data_loader, save_to_dir=None,
                                eval: bool = True) -> dict:
        for bank in self.metric_banks.values():
            bank.reset()
        # The reference re-seeds torch's global RNG per validation batch
        # (:489-491) because its augmentations draw from global state. All
        # our randomness is index-seeded in the datasets/loader
        # ((seed, epoch, index), data/base_depth_dataset.py), so replay is
        # deterministic by construction — pinned by
        # tests/test_trainer.py::test_exact_resume_bitwise.

        names = list(self.cfg.eval_metrics)
        for batch in data_loader:
            dev_batch = self._device_batch(batch)
            pred_d, aligned_d = self._eval_forward(self.state.params,
                                                   dev_batch)
            if eval:
                # whole metric suite for the batch in ONE device program
                # (pred/aligned stay on device; [B, n_metrics] comes back).
                # Amodal batches score the invisible region; plain depth
                # batches (no amodal keys — e.g. the DepthFMTrainer
                # factory protocol) score the whole valid mask.
                valid = batch[self.cfg.gt_mask_type] > 0
                invisible = batch.get("invisible_mask")
                mask = (invisible > 0) & valid if invisible is not None \
                    else valid
                m_raw, m_al = self._batch_metrics(
                    pred_d[..., 0], aligned_d[..., 0],
                    jnp.asarray(batch[self.cfg.gt_depth_type][..., 0]),
                    jnp.asarray(mask[..., 0]))
                m_raw, m_al = np.asarray(m_raw), np.asarray(m_al)
            pred = np.asarray(pred_d)

            has_buckets = "guide" in batch and "visible_mask" in batch
            for b in range(pred.shape[0]):
                mask_ok = batch.get("__sample_mask__")
                if mask_ok is not None and not mask_ok[b]:
                    continue
                if has_buckets:
                    guide = batch["guide"][b] > 0
                    visible = batch["visible_mask"][b] > 0
                    obj_px = float(guide.sum())
                    vis_ratio = float(visible.sum()) / max(obj_px, 1.0)
                    bucket = "easy" if vis_ratio > 0.75 else \
                        "mid" if vis_ratio > 0.5 else "diff"
                    raw_keys = ("overall", bucket)
                    al_keys = ("align_overall", f"align_{bucket}")
                else:
                    raw_keys = ("overall",)
                    al_keys = ("align_overall",)

                if eval:
                    self._track_sample(m_raw[b], names, raw_keys)
                    self._track_sample(m_al[b], names, al_keys)

                if save_to_dir is not None:
                    self._save_prediction(save_to_dir, batch, b, pred[b])

        out = {k: bank.result() for k, bank in self.metric_banks.items()}
        return out

    def _track_sample(self, values, names, bank_keys) -> None:
        for name, val in zip(names, values):
            if not np.isfinite(val):
                continue  # skip-nan (reference :600-603)
            for key in bank_keys:
                self.metric_banks[key].update(name, float(val))

    def _save_prediction(self, save_to_dir, batch, b, pred) -> None:
        os.makedirs(save_to_dir, exist_ok=True)
        rel = batch["rgb_relative_path"][b].replace("/", "_")
        out = (np.clip(pred[..., 0], 0, 1) * 65535).astype(np.uint16)
        from PIL import Image
        Image.fromarray(out).save(os.path.join(save_to_dir, f"{rel}.png"))

    # ------------------------------------------------------------ visualize

    def visualize(self) -> None:
        if not (self.out_dir_vis and self.vis_loaders):
            return
        out_dir = os.path.join(self.out_dir_vis,
                               f"iter_{self.effective_iter:06d}")
        os.makedirs(out_dir, exist_ok=True)
        from ..utils.image import colorize_depth
        from PIL import Image
        for loader in self.vis_loaders:
            for batch in loader:
                dev_batch = self._device_batch(batch)
                pred, _ = self._eval_forward(self.state.params, dev_batch)
                pred = np.asarray(pred)
                for b in range(pred.shape[0]):
                    gt = batch[self.cfg.gt_depth_type][b][..., 0]
                    rgb = (batch["rgb_int"][b] / 255.0)
                    masked_rgb = rgb * batch["guide"][b]
                    panel = np.concatenate([
                        np.concatenate([colorize_depth(pred[b][..., 0]),
                                        colorize_depth(gt)], axis=1),
                        np.concatenate([rgb, masked_rgb], axis=1),
                    ], axis=0)
                    rel = batch["rgb_relative_path"][b].replace("/", "_")
                    Image.fromarray((panel * 255).astype(np.uint8)).save(
                        os.path.join(out_dir, f"{rel}.png"))

    # ----------------------------------------------------------- checkpoint

    def _ckpt_manager(self):
        import orbax.checkpoint as ocp
        return ocp.PyTreeCheckpointer()

    def save_checkpoint(self, tag: str) -> None:
        if not self.out_dir_ckpt:
            return
        from ..parallel import is_main_process, sync_processes
        # multi-host: orbax save is a COLLECTIVE — every process must
        # call it (each writes its addressable shards, internal barriers
        # included); gating it on rank 0 would deadlock the fleet. Only
        # the log line is rank-0.
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.out_dir_ckpt, tag))
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "meta": {
                "epoch": self.epoch,
                "n_batch_in_epoch": self.n_batch_in_epoch,
                "effective_iter": self.effective_iter,
                "best_metric": self.best_metric,
                "in_evaluation": self.in_evaluation,
            },
        }
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
        if is_main_process():
            LOGGER.info("saved checkpoint %s", path)
        sync_processes(f"ckpt_{tag}")

    def load_checkpoint(self, path: str, *, resume_training: bool = True) -> None:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        abstract = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "meta": {
                "epoch": 0, "n_batch_in_epoch": 0, "effective_iter": 0,
                "best_metric": 0.0, "in_evaluation": False,
            },
        }
        try:
            tree = ckptr.restore(os.path.abspath(path), item=abstract)
        except ValueError:
            # round-1 checkpoints carry a now-removed meta leaf (the dead
            # seed-sequence counter); retry with the legacy template
            abstract["meta"]["seed_sequence_remaining"] = 0
            tree = ckptr.restore(os.path.abspath(path), item=abstract)
        self.state = TrainState(params=tree["params"],
                                opt_state=tree["opt_state"],
                                step=jnp.asarray(tree["step"]))
        if resume_training:
            meta = tree["meta"]
            self.epoch = int(meta["epoch"])
            self.n_batch_in_epoch = int(meta["n_batch_in_epoch"])
            self.effective_iter = int(meta["effective_iter"])
            self.best_metric = float(meta["best_metric"])
            self.in_evaluation = bool(meta["in_evaluation"])
        LOGGER.info("restored checkpoint %s (iter %d)", path,
                    self.effective_iter)
