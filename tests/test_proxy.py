"""Structured-weight quality proxy: scenes fixtures are geometrically
consistent and learnable, the vitp preset builds end-to-end, the
train/save/load/gate plumbing round-trips (round-3 VERDICT item 2)."""

import json
import os

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree


@pytest.fixture(scope="module")
def scenes_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    list_path = make_synthetic_sam_tree(str(root), n=6, hw=56,
                                        style="scenes")
    return str(root), list_path


def test_scenes_geometric_consistency(scenes_tree):
    from PIL import Image

    root, list_path = scenes_tree
    with open(list_path) as f:
        stems = [line.split()[0].split("/")[-1] for line in f]
    assert len(stems) == 6
    for stem in stems:
        whole = np.asarray(Image.open(
            os.path.join(root, "whole_mask", stem))) > 127
        visible = np.asarray(Image.open(
            os.path.join(root, "visible_object_mask", stem))) > 127
        sdep = np.asarray(Image.open(
            os.path.join(root, "depth_da_update_occ", stem))) / 65535.0
        adep = np.asarray(Image.open(
            os.path.join(root, "depth_da_update_combine", stem))) / 65535.0
        # visible subset of whole, and genuinely occluded
        assert (visible & ~whole).sum() == 0
        assert visible.sum() < whole.sum()
        assert visible.sum() > 0
        # amodal depth constant over the target object, and equal to the
        # scene depth on its VISIBLE part (depth recoverable from pixels)
        tgt = adep[whole]
        assert tgt.std() < 1e-3
        np.testing.assert_allclose(sdep[visible], adep[visible], atol=2e-4)
        # outside the object both depths agree
        np.testing.assert_allclose(sdep[~whole], adep[~whole], atol=2e-4)


def test_scenes_images_structured_not_noise(scenes_tree):
    """Piecewise-smooth scenes: neighboring-pixel correlation is high
    (noise fixtures sit near zero) — the property that makes trained
    token similarity meaningful for the ToMe proxy."""
    from PIL import Image

    root, list_path = scenes_tree
    with open(list_path) as f:
        stem = f.readline().split()[0].split("/")[-1]
    img = np.asarray(Image.open(
        os.path.join(root, "occlusion", stem)), np.float32)
    a = img[:, :-1].ravel()
    b = img[:, 1:].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.8, corr


def test_vitp_preset_builds_and_taps():
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.models.dinov2 import INTERMEDIATE_LAYER_IDX

    assert INTERMEDIATE_LAYER_IDX["vitp"] == (2, 5, 8, 11)
    model = get_model("AmodalDAv2", encoder="vitp")
    params = model.init(jax.random.PRNGKey(0))
    assert params["backbone"]["blocks"]["attn"]["qkv"]["w"].shape[0] == 12
    x = jax.numpy.zeros((1, 56, 56, 3))
    out = model.apply(
        params, x,
        guide_mask=jax.numpy.zeros((1, 56, 56, 1)),
        observation=jax.numpy.zeros((1, 56, 56, 1)), attn_impl="xla")
    assert out.shape == (1, 56, 56, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_params_npz_roundtrip(tmp_path):
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.scripts.train_proxy import (
        load_params_npz, save_params_npz)

    model = get_model("DepthAnythingV2Raw", encoder="vitt")
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_allclose(va, vb, rtol=1e-3, atol=1e-4)


def test_train_proxy_and_gate_smoke(tmp_path):
    """2-step end-to-end: train both models at vitt/56, save, then run a
    2-point gate ladder on the trained checkpoint."""
    from amodal_depth_anything_tpu.scripts import proxy_gate_v2, train_proxy

    out = str(tmp_path / "proxy")
    train_proxy.main(["--out", out, "--encoder", "vitt", "--size", "56",
                      "--steps", "2", "--data-n", "6", "--batch", "2",
                      "--data-dir", str(tmp_path / "scenes")])
    assert os.path.exists(os.path.join(out, "raw_base.npz"))
    assert os.path.exists(os.path.join(out, "amodal.npz"))
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["encoder"] == "vitt"

    rows = proxy_gate_v2.main(["--ckpt", out, "--size", "56", "--eval-n",
                               "2", "--points", "0,1"])
    assert rows[0]["point"].startswith("exact")
    assert rows[0]["blended_max_abs"] == 0.0 and rows[0]["pass"]
    assert np.isfinite(rows[1]["blended_max_abs"])
