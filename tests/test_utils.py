"""Tests for losses, metrics, alignment, schedules, config merge."""

import os
import textwrap

import numpy as np
import torch

import jax.numpy as jnp

from amodal_depth_anything_tpu.utils import (alignment, config, loss,
                                             lr_schedule, metrics, seeding)


def test_silog_loss_matches_torch_formula(rng):
    pred = rng.random((2, 16, 16), dtype=np.float32) + 0.1
    gt = rng.random((2, 16, 16), dtype=np.float32) + 0.1
    ours = float(loss.silog_loss(jnp.asarray(pred), jnp.asarray(gt), beta=0.15))
    g = torch.log(torch.from_numpy(pred) + 1e-7) - torch.log(torch.from_numpy(gt) + 1e-7)
    ref = float(10 * torch.sqrt(torch.var(g, unbiased=False) + 0.15 * g.mean() ** 2))
    # NB torch.var default is unbiased; the reference uses torch.var(g) which
    # IS unbiased — check against that too and pick the matching one.
    ref_unbiased = float(10 * torch.sqrt(torch.var(g) + 0.15 * g.mean() ** 2))
    assert abs(ours - ref) < 2e-4 or abs(ours - ref_unbiased) < 2e-4


def test_silog_masked_matches_indexed():
    rng = np.random.default_rng(0)
    pred = rng.random((1, 20, 20)).astype(np.float32) + 0.1
    gt = rng.random((1, 20, 20)).astype(np.float32) + 0.1
    mask = rng.random((1, 20, 20)) > 0.4
    ours = float(loss.silog_loss(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(mask), beta=0.15))
    # reference path: boolean-index first, then unmasked loss
    ref = float(loss.silog_loss(jnp.asarray(pred[mask]).reshape(1, 1, -1),
                                jnp.asarray(gt[mask]).reshape(1, 1, -1),
                                beta=0.15))
    assert abs(ours - ref) < 1e-4


def test_metrics_match_torch_reference_semantics(rng):
    pred = rng.random((3, 24, 24), dtype=np.float32) + 0.2
    gt = rng.random((3, 24, 24), dtype=np.float32) + 0.2
    mask = rng.random((3, 24, 24)) > 0.3

    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    tm = torch.from_numpy(mask)

    def t_absrel():
        d = torch.abs(tp - tg) / tg
        d = d.clone()
        d[~tm] = 0
        return float((d.sum((-1, -2)) / tm.sum((-1, -2))).mean())

    ours = float(metrics.abs_relative_difference(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert abs(ours - t_absrel()) < 1e-5

    def t_delta(th):
        ratio = torch.max(tp / tg, tg / tp)
        bit = (ratio < th).float()
        bit[~tm] = 0
        return float((bit.sum((-1, -2)) / tm.sum((-1, -2))).mean())

    for fn, th in [(metrics.delta1_acc, 1.25), (metrics.delta2_acc, 1.25 ** 2),
                   (metrics.delta3_acc, 1.25 ** 3)]:
        ours = float(fn(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
        assert abs(ours - t_delta(th)) < 1e-5

    def t_silog_rmse():
        d = torch.log(tp) - torch.log(tg)
        d[~tm] = 0
        n = tm.sum((-1, -2))
        first = d.pow(2).sum((-1, -2)) / n
        second = d.sum((-1, -2)).pow(2) / n ** 2
        return float(torch.sqrt((first - second).mean()) * 100)

    ours = float(metrics.silog_rmse(jnp.asarray(pred), jnp.asarray(gt),
                                    jnp.asarray(mask)))
    assert abs(ours - t_silog_rmse()) < 1e-3


def test_per_sample_metrics_match_singleton_calls(rng):
    """compute_metrics_per_sample's [B, n] rows must be bit-identical to
    calling each metric on that sample alone (what the round-1 eval loop
    did with ~20 dispatches per sample)."""
    pred = rng.random((4, 18, 18), dtype=np.float32) + 0.2
    gt = rng.random((4, 18, 18), dtype=np.float32) + 0.2
    mask = rng.random((4, 18, 18)) > 0.3
    mask[3] = False  # empty-mask sample exercises the n>=1 clamps

    names = list(metrics.METRIC_FNS)
    got = np.asarray(metrics.compute_metrics_per_sample(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask), names))
    assert got.shape == (4, len(names))
    for b in range(4):
        for j, n in enumerate(names):
            want = float(metrics.METRIC_FNS[n](
                jnp.asarray(pred[b][None]), jnp.asarray(gt[b][None]),
                jnp.asarray(mask[b][None])))
            np.testing.assert_allclose(got[b, j], want, rtol=1e-6,
                                       err_msg=f"{n} sample {b}")

    # maskless variant
    got2 = np.asarray(metrics.compute_metrics_per_sample(
        jnp.asarray(pred), jnp.asarray(gt), None, names))
    want2 = float(metrics.METRIC_FNS["rmse_linear"](
        jnp.asarray(pred[1][None]), jnp.asarray(gt[1][None])))
    np.testing.assert_allclose(got2[1, names.index("rmse_linear")], want2,
                               rtol=1e-6)


def test_alignment_closed_form_matches_lstsq(rng):
    pred = rng.random((1, 32, 32)).astype(np.float32)
    gt = (pred * 2.5 + 0.7 + rng.normal(0, 0.05, pred.shape)).astype(np.float32)
    mask = rng.random(pred.shape) > 0.5
    aligned, s, t = alignment.align_depth_least_square(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask))
    _, s_np, t_np = alignment.align_depth_least_square_np(gt, pred, mask)
    assert abs(float(s[0]) - s_np) < 1e-3
    assert abs(float(t[0]) - t_np) < 1e-3
    np.testing.assert_allclose(
        np.asarray(aligned), np.asarray(pred) * s_np + t_np,
        rtol=1e-3, atol=1e-3)


def test_iter_exponential_schedule():
    sched = lr_schedule.iter_exponential(3e-5, 50000, 0.01, warmup_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(100)) - 3e-5) < 1e-10
    assert abs(float(sched(50000)) - 3e-7) < 1e-10
    assert abs(float(sched(80000)) - 3e-7) < 1e-10
    # exponential midpoint
    mid = float(sched(100 + (50000 - 100) // 2))
    assert abs(mid - 3e-5 * 10 ** -1) / mid < 0.01


def test_seed_sequence_reproducible():
    a = seeding.generate_seed_sequence(2024, 10)
    b = seeding.generate_seed_sequence(2024, 10)
    assert a == b and len(set(a)) > 1


def test_config_merge(tmp_path):
    (tmp_path / "base.yaml").write_text(textwrap.dedent("""
        trainer:
          name: DiscriminativeTrainer
          max_iter: 10
        lr: 1.0
    """))
    (tmp_path / "child.yaml").write_text(textwrap.dedent("""
        base_config:
        - base.yaml
        trainer:
          max_iter: 60000
        model:
          name: AmodalDAv2
          kwargs:
            loss_stategy: entire_target_object
    """))
    cfg = config.recursive_load_config(str(tmp_path / "child.yaml"))
    assert cfg.trainer.name == "DiscriminativeTrainer"
    assert cfg.trainer.max_iter == 60000
    assert cfg.lr == 1.0
    assert cfg.model.kwargs.loss_stategy == "entire_target_object"
    assert config.find_value(cfg, "max_iter") == 60000


def test_edge_metrics_run(rng):
    gt = np.zeros((64, 64), np.float32) + 1.0
    gt[20:40, 20:40] = 2.0
    pred = gt + rng.normal(0, 0.01, gt.shape).astype(np.float32)
    mask = np.ones_like(gt, bool)
    acc = metrics.edge_acc(pred, gt, mask)
    comp = metrics.edge_comp(pred, gt, mask)
    see = metrics.soft_edge_error(pred, gt, mask)
    assert 0 <= acc <= 10 and 0 <= comp <= 10 and see >= 0
    # near-perfect prediction should have small edge-accuracy distance
    assert acc < 2.0
