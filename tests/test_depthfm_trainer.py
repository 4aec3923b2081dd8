"""DepthFM flow-matching trainer smoke test (tiny model, synthetic data)."""

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                            SAMAmodalDataset)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
from amodal_depth_anything_tpu.train import DepthFMAmodalTrainer, TrainerConfig


def test_depthfm_trainer_steps_and_validates(tmp_path):
    root = str(tmp_path / "data")
    import os
    os.makedirs(root)
    list_path = make_synthetic_sam_tree(root, n=4, hw=32)
    train_ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                                filename_ls_path=list_path, dataset_dir=root,
                                resize_to_hw=(32, 32))
    val_ds = SAMAmodalDataset(mode=DatasetMode.EVAL,
                              filename_ls_path=list_path, dataset_dir=root,
                              resize_to_hw=(32, 32))
    train_loader = DataLoader(train_ds, batch_size=2, shuffle=True,
                              drop_last=True)
    val_loader = DataLoader(val_ds, batch_size=2, pad_last=True)

    model = get_model("DepthFMAmodal", tiny=True)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(loss_strategy="entire_target_object",
                        loss_name="l1_loss", loss_kwargs={}, max_iter=2,
                        lr_warmup_steps=0,  # nonzero lr from step 0
                        validation_period=0, visualization_period=0,
                        save_period=0, compute_dtype="float32", remat=False,
                        attn_impl="xla",
                        eval_metrics=("abs_relative_difference",))
    trainer = DepthFMAmodalTrainer(cfg, model, train_loader,
                                   val_loaders=[val_loader], mesh=mesh)
    vae_before = np.asarray(
        trainer.state.params["vae"]["encoder"]["conv_in"]["w"]).copy()
    trainer.train()
    assert trainer.effective_iter == 2
    # VAE frozen, UNet updated (the zero-init output conv picks up gradient
    # from step 0; its norm stays at exactly 1.0 until the conv is nonzero)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["vae"]["encoder"]["conv_in"]["w"]),
        vae_before)
    out_conv = np.asarray(trainer.state.params["unet"]["out"]["conv"]["w"])
    assert np.any(out_conv != 0)

    results = trainer.validate()
    bank = list(results.values())[0]
    assert np.isfinite(bank["align_overall"]["abs_relative_difference"])
