"""DepthFM trainers: flow-matching smoke test + DDPM finetune path
(tiny models, synthetic data) and goldens for the DDPM noising math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                            SAMAmodalDataset)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
from amodal_depth_anything_tpu.train import (DepthFMAmodalTrainer,
                                             DepthFMTrainer, TrainerConfig)


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


def test_ddpm_noising_matches_diffusers_formulas(rng):
    """ddpm_add_noise / ddpm_velocity vs the diffusers DDPMScheduler math
    the reference calls (`depthfm_trainer.py:268-270,296-298`): scaled-
    linear betas (torch.linspace in sqrt space, squared, cumprod), then
    sqrt(ab_t)*x0 + sqrt(1-ab_t)*eps and sqrt(ab_t)*eps - sqrt(1-ab_t)*x0
    with per-sample timestep gathers."""
    import torch

    from amodal_depth_anything_tpu.ops.ddim import (ddpm_add_noise,
                                                    ddpm_velocity,
                                                    linear_alphas_cumprod)

    T = 1000
    x0 = rng.random((3, 4, 4, 2), dtype=np.float32) * 2 - 1
    noise = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
    t = np.array([0, 499, 999], np.int32)

    # torch replica of diffusers DDPMScheduler(beta_schedule='scaled_linear')
    betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, T,
                           dtype=torch.float32) ** 2
    ab = torch.cumprod(1.0 - betas, dim=0)
    ab_t = ab[torch.from_numpy(t).long()].reshape(-1, 1, 1, 1)
    tx0, tn = torch.from_numpy(x0), torch.from_numpy(noise)
    ref_noisy = ab_t.sqrt() * tx0 + (1 - ab_t).sqrt() * tn
    ref_vel = ab_t.sqrt() * tn - (1 - ab_t).sqrt() * tx0

    alphas = linear_alphas_cumprod(T)
    got_noisy = np.asarray(ddpm_add_noise(alphas, jnp.asarray(x0),
                                          jnp.asarray(noise),
                                          jnp.asarray(t)))
    got_vel = np.asarray(ddpm_velocity(alphas, jnp.asarray(x0),
                                       jnp.asarray(noise), jnp.asarray(t)))
    np.testing.assert_allclose(got_noisy, ref_noisy.numpy(), atol=2e-6)
    np.testing.assert_allclose(got_vel, ref_vel.numpy(), atol=2e-6)


def test_ddpm_trainer_steps_and_validates(tmp_path):
    """The real DepthFMTrainer (DDPM finetune, reference
    depthfm_trainer.py:93-310): distinct registry entry, multi-res noise
    consumed, VAE frozen, UNet updated, v-prediction target."""
    import os

    from amodal_depth_anything_tpu.train import (TRAINER_REGISTRY,
                                                 get_trainer_cls)

    assert get_trainer_cls("DepthFMTrainer") is DepthFMTrainer
    assert TRAINER_REGISTRY["DepthFMTrainer"] is not \
        TRAINER_REGISTRY["DepthFMAmodalTrainer"]

    root = str(tmp_path / "data")
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

    model = get_model("DepthFM", tiny=True)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(loss_strategy="entire_scene", loss_name="mse_loss",
                        loss_kwargs={}, max_iter=2, lr_warmup_steps=0,
                        validation_period=0, visualization_period=0,
                        save_period=0, compute_dtype="float32", remat=False,
                        attn_impl="xla",
                        eval_metrics=("abs_relative_difference",))
    trainer = DepthFMTrainer(
        cfg, model, train_loader, val_loaders=[val_loader], mesh=mesh,
        prediction_type="v_prediction",
        multi_res_noise={"strength": 0.9, "annealed": True,
                         "downscale_strategy": "original"})
    vae_before = np.asarray(
        trainer.state.params["vae"]["encoder"]["conv_in"]["w"]).copy()
    trainer.train()
    assert trainer.effective_iter == 2
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["vae"]["encoder"]["conv_in"]["w"]),
        vae_before)
    out_conv = np.asarray(trainer.state.params["unet"]["out"]["conv"]["w"])
    assert np.any(out_conv != 0)

    results = trainer.validate()
    bank = list(results.values())[0]
    assert np.isfinite(bank["align_overall"]["abs_relative_difference"])


def test_ddpm_trainer_cli_kwargs_wiring(tmp_path):
    """configs/train_depthfm_ddpm_finetune.yaml selects the DDPM trainer
    and its scheduler/multi-res settings through trainer_kwargs_from_cfg."""
    from amodal_depth_anything_tpu.cli.train import trainer_kwargs_from_cfg
    from amodal_depth_anything_tpu.utils.config import recursive_load_config

    cfg = recursive_load_config("configs/train_depthfm_ddpm_finetune.yaml")
    assert cfg.trainer.name == "DepthFMTrainer"
    kw = trainer_kwargs_from_cfg(cfg)
    assert kw["prediction_type"] == "v_prediction"
    assert kw["num_train_timesteps"] == 1000
    assert kw["multi_res_noise"]["annealed"] is True
    assert abs(kw["beta_start"] - 0.00085) < 1e-12


def test_ddpm_trainer_plain_depth_validation(tmp_path):
    """The factory's eval protocol (reference depthfm_trainer.py:544-560):
    plain depth batches — no amodal keys — must validate through the
    shared loop, aligning to GT over the valid mask, overall bank only."""
    import os

    import numpy as np
    from PIL import Image

    from amodal_depth_anything_tpu.data import DataLoader
    from amodal_depth_anything_tpu.data.base_depth_dataset import (
        BaseDepthDataset, DatasetMode, DepthFileNameMode)

    root = tmp_path / "plain"
    root.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        rgb = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        d16 = (rng.random((32, 32)) * 60000 + 1000).astype(np.uint16)
        Image.fromarray(rgb).save(root / f"img{i}.png")
        Image.fromarray(d16).save(root / f"img{i}_depth.png")
        lines.append(f"img{i}.png img{i}_depth.png")
    (root / "list.txt").write_text("\n".join(lines) + "\n")

    ds = BaseDepthDataset(mode=DatasetMode.EVAL,
                          filename_ls_path=str(root / "list.txt"),
                          dataset_dir=str(root),
                          name_mode=DepthFileNameMode.id,
                          min_depth=1.0, max_depth=70000.0,
                          has_filled_depth=False)
    loader = DataLoader(ds, batch_size=2, pad_last=True)

    model = get_model("DepthFM", tiny=True)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(loss_strategy="entire_scene", loss_name="mse_loss",
                        loss_kwargs={}, max_iter=1,
                        gt_depth_type="depth_raw_linear",
                        gt_mask_type="valid_mask_raw",
                        validation_period=0, visualization_period=0,
                        save_period=0, compute_dtype="float32", remat=False,
                        attn_impl="xla",
                        eval_metrics=("abs_relative_difference",))
    trainer = DepthFMTrainer(cfg, model, train_loader=[],
                             val_loaders=[loader], mesh=mesh)
    res = trainer.validate_single_dataset(loader, eval=True)
    val = res["align_overall"]["abs_relative_difference"]
    assert np.isfinite(val)
    # no amodal keys -> no difficulty buckets populated
    assert np.isnan(res["align_easy"]["abs_relative_difference"])


def test_depthfm_trainer_remat_true_steps(tmp_path):
    """remat=True threads per-level UNet checkpointing through the jitted
    train step (the wiring, not just the math — see
    test_unet_remat_grads_match for value equality)."""
    import os
    root = str(tmp_path / "data")
    os.makedirs(root)
    list_path = make_synthetic_sam_tree(root, n=2, hw=32)
    train_ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                                filename_ls_path=list_path, dataset_dir=root,
                                resize_to_hw=(32, 32))
    loader = DataLoader(train_ds, batch_size=2, drop_last=True)

    model = get_model("DepthFMAmodal", tiny=True)
    cfg = TrainerConfig(loss_strategy="entire_target_object",
                        loss_name="l1_loss", loss_kwargs={}, max_iter=1,
                        lr_warmup_steps=0, validation_period=0,
                        visualization_period=0, save_period=0,
                        compute_dtype="float32", remat=True,
                        attn_impl="xla")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    trainer = DepthFMAmodalTrainer(cfg, model, loader, mesh=mesh)
    trainer.train()
    assert trainer.effective_iter == 1
