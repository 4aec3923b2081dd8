"""PartialCompletionContentDPT baseline tests."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import get_model


def test_jo_dpt_forward(rng):
    model = get_model("PartialCompletionContentDPT", tiny=True)
    tree = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.5).astype(np.float32))
    out = model.apply(tree, x, guide_mask=m * 2 - 1, attn_impl="xla")
    assert out.shape == (1, 64, 64, 1)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1


def test_jo_dpt_trains_under_discriminative_trainer(tmp_path):
    import os
    from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                                SAMAmodalDataset)
    from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
    from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
    from amodal_depth_anything_tpu.train import (DiscriminativeTrainer,
                                                 TrainerConfig)

    root = str(tmp_path / "d")
    os.makedirs(root)
    list_path = make_synthetic_sam_tree(root, n=4, hw=64)
    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(64, 64))
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    model = get_model("PartialCompletionContentDPT", tiny=True)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(max_iter=1, lr_warmup_steps=0, validation_period=0,
                        visualization_period=0, save_period=0,
                        compute_dtype="float32", remat=False, attn_impl="xla",
                        eval_metrics=("abs_relative_difference",))
    trainer = DiscriminativeTrainer(cfg, model, loader, mesh=mesh)
    trainer.train()
    assert trainer.effective_iter == 1
