"""ADDeepLab baseline tests: forward shapes, BN state updates, trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                            SAMAmodalDataset)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.models.deeplab import ADDeepLabConfig
from amodal_depth_anything_tpu.models.resnet import ResNetConfig
from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
from amodal_depth_anything_tpu.train import (AmodalSynthDriveTrainer,
                                             TrainerConfig)

# A miniature resnet for tests (stage channels 32..256 with width 8)
TINY = dict(channels=(32, 64, 128, 256), up_sample_channels=(16, 32, 64, 128))


def tiny_model():
    from amodal_depth_anything_tpu.models import Model
    from amodal_depth_anything_tpu.models.deeplab import (apply_addeeplab,
                                                          init_addeeplab)
    import functools
    cfg = ADDeepLabConfig(
        channels=TINY["channels"], up_sample_channels=TINY["up_sample_channels"],
        aspp_channels=32, mvit_heads=2, mvit_layers=1, mvit_ff=32,
        resnet=ResNetConfig(in_channels=4, width=8, layers=(1, 1, 1, 1)))

    def _init(key):
        p, bn = init_addeeplab(key, cfg)
        return {"params": p, "bn": bn}

    @functools.partial(jax.jit, static_argnames=("train", "attn_impl"))
    def _apply(tree, x, guide_mask=None, train=False, attn_impl=None, **_kw):
        return apply_addeeplab(tree["params"], tree["bn"], cfg, x,
                               guide_mask=guide_mask, train=train,
                               attn_impl=attn_impl)

    return Model(name="ADDeepLab", config=cfg, init=jax.jit(_init),
                 apply=_apply)


def test_forward_shapes_and_bn(rng):
    model = tiny_model()
    tree = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.5).astype(np.float32))
    (vis, invis), new_bn = model.apply(tree, x, guide_mask=m, train=True,
                                       attn_impl="xla")
    assert vis.shape == invis.shape == (1, 32, 32, 1)
    v = np.asarray(vis)
    assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1
    # train=True updates running stats
    assert not np.array_equal(np.asarray(new_bn["bn1"]["mean"]),
                              np.asarray(tree["bn"]["bn1"]["mean"]))
    # eval mode leaves them unchanged
    (_, _), bn_eval = model.apply(tree, x, guide_mask=m, train=False,
                                  attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(bn_eval["bn1"]["mean"]),
                                  np.asarray(tree["bn"]["bn1"]["mean"]))


def test_amodalsynthdrive_trainer(tmp_path):
    import os
    root = str(tmp_path / "d")
    os.makedirs(root)
    list_path = make_synthetic_sam_tree(root, n=4, hw=64)
    train_ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                                filename_ls_path=list_path, dataset_dir=root,
                                resize_to_hw=(64, 64))
    loader = DataLoader(train_ds, batch_size=2, shuffle=True, drop_last=True)
    model = tiny_model()
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    cfg = TrainerConfig(max_iter=2, lr_warmup_steps=0, validation_period=0,
                        visualization_period=0, save_period=0,
                        compute_dtype="float32", remat=False, attn_impl="xla",
                        eval_metrics=("abs_relative_difference",))
    trainer = AmodalSynthDriveTrainer(cfg, model, loader, mesh=mesh,
                                      w_occ=0.7)
    before = np.asarray(
        trainer.state.params["params"]["visible_depth_head"]["pred"]["w"]).copy()
    trainer.train()
    assert trainer.effective_iter == 2
    after = np.asarray(
        trainer.state.params["params"]["visible_depth_head"]["pred"]["w"])
    assert not np.array_equal(before, after)


def test_amodalsynthdrive_trainer_dp4_subprocess(tmp_path):
    """ADDeepLab training on a dp=4 CPU mesh. XLA:CPU's thunk-runtime
    concurrent executor deadlocks this program's ~213 collectives at >=4
    virtual devices (upstream bug, root-caused in ROADMAP 'Known
    issues'); the documented workaround --xla_cpu_use_thunk_runtime=false
    must be set at process start, so the run happens in a subprocess.
    Real TPUs use a different collective runtime — this pins that the
    dp>2 program itself is sound."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                                    SAMAmodalDataset)
        from amodal_depth_anything_tpu.data.synthetic import \\
            make_synthetic_sam_tree
        from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
        from amodal_depth_anything_tpu.train import (AmodalSynthDriveTrainer,
                                                     TrainerConfig)
        from tests.test_deeplab import tiny_model

        root = "%s"
        list_path = make_synthetic_sam_tree(root, n=8, hw=64)
        ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                              filename_ls_path=list_path, dataset_dir=root,
                              resize_to_hw=(64, 64))
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        mesh = make_mesh(MeshConfig(data=4, model=1),
                         devices=jax.devices()[:4])
        cfg = TrainerConfig(max_iter=2, lr_warmup_steps=0,
                            validation_period=0, visualization_period=0,
                            save_period=0, compute_dtype="float32",
                            remat=False, attn_impl="xla",
                            eval_metrics=("abs_relative_difference",))
        trainer = AmodalSynthDriveTrainer(cfg, tiny_model(), loader,
                                          mesh=mesh, w_occ=0.7)
        trainer.train()
        assert trainer.effective_iter == 2
        print("DP4_OK")
    """ % str(tmp_path / "d"))
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_cpu_use_thunk_runtime=false "
                        "--xla_force_host_platform_device_count=8 "
                        "--xla_cpu_parallel_codegen_split_count=1")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    (tmp_path / "d").mkdir()
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "DP4_OK" in res.stdout
