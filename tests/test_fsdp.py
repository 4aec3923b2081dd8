"""FSDP (ZeRO-3-style) parameter/optimizer sharding over the data axis.

The reference trains DDP-only (every rank holds a full parameter replica
plus full Adam moments, train.py:38-40); `fsdp=True` shards both over the
mesh's data axis and lets XLA's SPMD partitioner insert the per-use
all-gathers and gradient reduce-scatters. These tests check the sharding
rules, numerical equivalence with the replicated path, and composition
with tensor parallelism on the 8-device virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.parallel import (MeshConfig, make_mesh,
                                                param_sharding, shard_params)
from amodal_depth_anything_tpu.parallel.sharding import FSDP_MIN_ELEMENTS
from amodal_depth_anything_tpu.train.trainer import (DiscriminativeTrainer,
                                                     TrainerConfig)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
from amodal_depth_anything_tpu.data.base_depth_dataset import DatasetMode
from amodal_depth_anything_tpu.data.sam_amodal_dataset import SAMAmodalDataset
from amodal_depth_anything_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def sam_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fsdp_sam")
    list_path = make_synthetic_sam_tree(str(root), n=16, hw=56)
    return str(root), list_path


def _loader(root, list_path, batch=4):
    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(56, 56))
    return DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True)


def _cfg(**kw):
    # log_interval > max_iter: the train loop RESETS train_metrics after
    # every log, so with log_interval=1 `avg("loss")` after train() is
    # nan and every loss-equivalence assertion in this file compared
    # nan==nan (assert_allclose's equal_nan default) — vacuous. Keep the
    # tracker un-reset so the comparisons are real.
    base = dict(loss_strategy="entire_target_object", max_iter=2,
                validation_period=0, visualization_period=0, save_period=0,
                log_interval=100, compute_dtype="float32", remat=False,
                attn_impl="xla",
                eval_metrics=("abs_relative_difference",))
    base.update(kw)
    return TrainerConfig(**base)


def test_fsdp_sharding_rules():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    big2d = jnp.zeros((512, 512))          # plain leaf, shardable
    stacked = jnp.zeros((4, 256, 1024))    # scan-stacked qkv-like kernel
    tiny = jnp.zeros((64,))                # below FSDP_MIN_ELEMENTS
    assert big2d.size >= FSDP_MIN_ELEMENTS
    tree = {"embed": {"w": big2d},
            "blocks": {"attn": {"qkv": {"w": stacked}},
                       "norm1": {"scale": tiny}}}
    sh = param_sharding(mesh, tree, fsdp=True)
    # plain leaf: largest divisible axis sharded on data
    assert sh["embed"]["w"].spec == P("data", None)
    # stacked TP leaf: model on the TP dim, data added on a FREE dim,
    # never on the scan (layer) axis 0
    assert sh["blocks"]["attn"]["qkv"]["w"].spec == P(None, "data", "model")
    # tiny leaf replicates
    assert sh["blocks"]["norm1"]["scale"].spec == P()


def test_fsdp_never_shards_scan_axis():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    # stacked leaf whose ONLY divisible-by-8 axis is the layer axis
    stacked = jnp.zeros((8, 257, 129))
    sh = param_sharding(mesh, {"blocks": {"mlp": {"fc1": {"w": stacked}}}},
                        fsdp=True)
    assert sh["blocks"]["mlp"]["fc1"]["w"].spec == P()


def test_fsdp_matches_replicated_training(sam_tree, monkeypatch):
    # vitt's largest leaf (49k elements) sits under the production
    # threshold; lower it so the tiny model actually shards
    from amodal_depth_anything_tpu.parallel import sharding as sharding_mod
    monkeypatch.setattr(sharding_mod, "FSDP_MIN_ELEMENTS", 1024)
    root, list_path = sam_tree
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=4, model=2))

    losses = {}
    for fsdp in (False, True):
        trainer = DiscriminativeTrainer(
            _cfg(fsdp=fsdp), model, _loader(root, list_path), mesh=mesh)
        trainer.train()
        assert trainer.effective_iter == 2
        losses[fsdp] = trainer.train_metrics.avg("loss")
        if fsdp:
            qkv = trainer.state.params["backbone"]["blocks"]["attn"]["qkv"]["w"]
            assert "data" in str(qkv.sharding.spec), qkv.sharding
            # optimizer moments inherit the param sharding (ZeRO: no rank
            # holds full Adam state)
            mu_qkv = jax.tree_util.tree_leaves(
                trainer.state.opt_state, is_leaf=lambda x: hasattr(x, "sharding"))
            assert any("data" in str(m.sharding.spec) for m in mu_qkv
                       if hasattr(m, "sharding") and m.ndim == 3)
            # no recompile between steps despite the sharded state
            assert trainer._train_step._cache_size() == 1
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-4, atol=2e-5)


def test_sequence_parallel_matches_baseline(sam_tree):
    """Megatron-SP activation sharding changes layout, not math: training
    losses must match the plain TP run on the same 4x2 mesh."""
    root, list_path = sam_tree
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=4, model=2))

    losses = {}
    for sp in (False, True):
        trainer = DiscriminativeTrainer(
            _cfg(sequence_parallel=sp), model, _loader(root, list_path),
            mesh=mesh)
        trainer.train()
        assert trainer.effective_iter == 2
        losses[sp] = trainer.train_metrics.avg("loss")
        if sp:
            assert trainer._train_step._cache_size() == 1
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-4, atol=2e-5)


def test_shard_params_fsdp_places_leaves(sam_tree, monkeypatch):
    from amodal_depth_anything_tpu.parallel import sharding as sharding_mod
    monkeypatch.setattr(sharding_mod, "FSDP_MIN_ELEMENTS", 1024)
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=8, model=1))
    params = model.init(jax.random.PRNGKey(0))
    placed = shard_params(mesh, params, fsdp=True)
    qkv = placed["backbone"]["blocks"]["attn"]["qkv"]["w"]
    # the stacked [L, D, 3D] kernel shards its largest free dim over data
    assert "data" in str(qkv.sharding.spec)
    # per-device bytes shrink accordingly
    shard_bytes = qkv.addressable_shards[0].data.nbytes
    assert shard_bytes * mesh.shape["data"] == qkv.nbytes


def test_fsdp_realistic_vitl_width_one_step(sam_tree):
    """ZeRO-3's actual value claim at REAL width (round-4 VERDICT item
    7): a vitl-wide trunk (embed 1024 — qkv leaves are 12.6M elements,
    far above the PRODUCTION FSDP_MIN_ELEMENTS threshold, no monkeypatch)
    at depth 4 runs one sharded train step. Per-device param and Adam
    shards must measurably differ from the replicated footprint: each
    rank holds 1/data of every big leaf, which is what lets vitg Adam
    state that OOMs one chip fit a pod slice."""
    root, list_path = sam_tree
    model = get_model("AmodalDAv2", encoder="vitl", depth=4)
    assert model.config.vit.embed_dim == 1024
    assert model.config.taps == (0, 1, 2, 3)
    mesh = make_mesh(MeshConfig(data=8, model=1))

    trainer = DiscriminativeTrainer(
        _cfg(fsdp=True, max_iter=1), model,
        _loader(root, list_path, batch=8), mesh=mesh)
    qkv = trainer.state.params["backbone"]["blocks"]["attn"]["qkv"]["w"]
    assert qkv.size >= FSDP_MIN_ELEMENTS  # production threshold applies
    assert "data" in str(qkv.sharding.spec), qkv.sharding
    # the realistic-width claim: per-rank bytes are 1/8 of the leaf
    assert qkv.addressable_shards[0].data.nbytes * 8 == qkv.nbytes
    # Adam moments shard identically (ZeRO: no rank holds full state)
    mus = [m for m in jax.tree_util.tree_leaves(trainer.state.opt_state)
           if hasattr(m, "sharding") and m.size == qkv.size]
    assert mus and all(
        m.addressable_shards[0].data.nbytes * 8 == m.nbytes for m in mus)

    trainer.train()
    assert trainer.effective_iter == 1
    loss = trainer.train_metrics.avg("loss")
    assert np.isfinite(loss), loss
