"""Headless app flow, profiling utils, convert_ckp script."""

import os

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.cli.app import AmodalDepthApp
from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          init_amodal_dav2)
from amodal_depth_anything_tpu.pipeline import AmodalDepthPipeline
from amodal_depth_anything_tpu.utils.profiling import StepTimer, \
    device_memory_stats


def test_app_amodal_mask_mode(rng):
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    pipe = AmodalDepthPipeline(
        init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg), raw_cfg,
        init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg), amodal_cfg,
        size=56, attn_impl="xla")
    app = AmodalDepthApp(pipe)
    img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
    mask = np.zeros((60, 70), np.float32)
    mask[10:40, 20:50] = 1
    base, amodal, depth = app.predict_amodal_depth(img, mask, "amodal_mask")
    assert base.shape == (60, 70, 3) and amodal.shape == (60, 70, 3)
    assert depth.shape == (56, 56) and np.isfinite(depth).all()
    with pytest.raises(RuntimeError, match="prompt_points"):
        app.predict_amodal_depth(img, mask, "prompt_points")


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(5):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 4 and s["p50_s"] >= 0


def test_device_memory_stats_no_crash():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_convert_ckp_strip(tmp_path):
    import torch
    from amodal_depth_anything_tpu.scripts.convert_ckp import main
    sd = {"pretrained.cls_token": torch.zeros(1, 1, 8),
          "depth_head.projects.0.weight": torch.zeros(4, 8, 1, 1)}
    inp = str(tmp_path / "in.pth")
    out = str(tmp_path / "out.pth")
    torch.save(sd, inp)
    main(["strip", "--input", inp, "--output", out])
    stripped = torch.load(out, weights_only=True)
    assert list(stripped) == ["cls_token"]
