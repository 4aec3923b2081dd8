"""BEiT / ZoeDepth / InvisibleStitch tests (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.models.beit import (BEiTConfig, _rel_pos_index,
                                                   apply_beit, init_beit)
from amodal_depth_anything_tpu.models.zoedepth import _log_binomial


def test_rel_pos_index_structure():
    idx = _rel_pos_index(3)
    assert idx.shape == (10, 10)
    # diagonal of patch-patch block = zero offset entry (center of table)
    center = (2 * 3 - 1) ** 2 // 2
    assert (np.diag(idx)[1:] == center).all()
    assert idx[0, 0] == 25 and idx[0, 1] == 27 and idx[1, 0] == 26
    assert idx.max() == 27  # (2g-1)^2 + 2


def test_beit_forward_and_resolution_change(rng):
    cfg = BEiTConfig(embed_dim=32, depth=2, num_heads=2, img_size=64,
                     in_chans=5)
    params = jax.jit(lambda k: init_beit(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 5), dtype=np.float32))
    outs = jax.jit(lambda p, x: apply_beit(p, cfg, x, (0, 1)))(params, x)
    assert len(outs) == 2 and outs[0].shape == (1, 17, 32)
    # different input size -> rel-pos table resampled, still runs
    x2 = jnp.asarray(rng.standard_normal((1, 96, 96, 5), dtype=np.float32))
    outs2 = jax.jit(lambda p, x: apply_beit(p, cfg, x, (1,)))(params, x2)
    assert outs2[0].shape == (1, 37, 32)
    assert np.isfinite(np.asarray(outs2[0])).all()


def test_log_binomial_normalized():
    p = jnp.full((1, 2, 2, 1), 0.3)
    t = jnp.full((1, 2, 2, 1), 10.0)
    probs = _log_binomial(p, t, 16)
    assert probs.shape == (1, 2, 2, 16)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    # low p -> mass on low bins
    assert float(jnp.argmax(probs[0, 0, 0])) < 8


def test_invisible_stitch_forward(rng):
    model = get_model("InvisibleStitch", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    # widened channels zero-initialized
    w = np.asarray(params["backbone"]["patch_embed"]["proj"]["w"])
    assert np.all(w[:, :, 3:, :] == 0) and np.any(w[:, :, :3, :] != 0)

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    inv = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.7).astype(np.float32))
    obs = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    depth = model.apply(params, x, invisible_mask=inv, observation=obs)
    # midas head upsamples back to full input resolution
    assert depth.shape == (1, 64, 64, 1)
    d = np.asarray(depth)
    cfg = model.config
    assert np.isfinite(d).all()
    # bin centers are UNBOUNDED with the shipped inverse attractors
    # (attractor.py:139 "Bin centers are unbounded"), so random-weight
    # metric depth may dip slightly negative — bound it loosely instead
    assert d.min() > -cfg.max_depth and d.max() < 10 * cfg.max_depth


def test_invisible_stitch_trainer(tmp_path):
    import os
    from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                                SAMAmodalDataset)
    from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
    from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
    from amodal_depth_anything_tpu.train import (InvisibleStitchTrainer,
                                                 TrainerConfig)

    root = str(tmp_path / "d")
    os.makedirs(root)
    list_path = make_synthetic_sam_tree(root, n=4, hw=64)
    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(64, 64))
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    model = get_model("InvisibleStitch", tiny=True)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(loss_strategy="invisible_part", max_iter=1,
                        lr_warmup_steps=0, validation_period=0,
                        visualization_period=0, save_period=0,
                        compute_dtype="float32", remat=False,
                        eval_metrics=("abs_relative_difference",))
    trainer = InvisibleStitchTrainer(cfg, model, loader, mesh=mesh)
    trainer.train()
    assert trainer.effective_iter == 1
