"""End-to-end training tests on the synthetic SAM fixture: loss goes
finite, checkpoints save/restore, validation fills metric banks, the
train CLI runs a 3-iter smoke, and mesh sharding works on 8 virtual
devices."""

import os

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.data import (DataLoader, DatasetMode,
                                            SAMAmodalDataset)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree
from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.parallel import MeshConfig, make_mesh
from amodal_depth_anything_tpu.train import DiscriminativeTrainer, TrainerConfig


@pytest.fixture(scope="module")
def sam_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("sam_train")
    list_path = make_synthetic_sam_tree(str(root), n=16, hw=56)
    return str(root), list_path


def _loaders(root, list_path, batch=2):
    train_ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                                filename_ls_path=list_path, dataset_dir=root,
                                resize_to_hw=(56, 56))
    val_ds = SAMAmodalDataset(mode=DatasetMode.EVAL,
                              filename_ls_path=list_path, dataset_dir=root,
                              resize_to_hw=(56, 56))
    return (DataLoader(train_ds, batch_size=batch, shuffle=True,
                       drop_last=True),
            DataLoader(val_ds, batch_size=batch, pad_last=True))


def _cfg(**kw):
    base = dict(loss_strategy="entire_target_object", max_iter=2,
                validation_period=0, visualization_period=0, save_period=0,
                log_interval=1, compute_dtype="float32", remat=False,
                attn_impl="xla", eval_metrics=("abs_relative_difference",
                                               "delta1_acc"))
    base.update(kw)
    return TrainerConfig(**base)


@pytest.mark.parametrize("strategy", ["entire_target_object",
                                      "ssi invisible_part"])
def test_train_steps_reduce_finite_loss(sam_tree, strategy):
    root, list_path = sam_tree
    train_loader, _ = _loaders(root, list_path)
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    trainer = DiscriminativeTrainer(_cfg(loss_strategy=strategy), model,
                                    train_loader, mesh=mesh)
    trainer.train()
    assert trainer.effective_iter == 2
    assert np.isfinite(trainer.state.params["backbone"]["cls_token"]).all()


def test_validation_and_checkpoint_roundtrip(sam_tree, tmp_path):
    root, list_path = sam_tree
    train_loader, val_loader = _loaders(root, list_path)
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    trainer = DiscriminativeTrainer(
        _cfg(max_iter=1), model, train_loader, val_loaders=[val_loader],
        mesh=mesh, out_dir_ckpt=str(tmp_path / "ckpt"))
    trainer.train()
    results = trainer.validate()
    bank = results["sam_synth" if "sam_synth" in results else
                   list(results)[0]]
    assert np.isfinite(bank["align_overall"]["abs_relative_difference"])
    assert 0.0 <= bank["overall"]["delta1_acc"] <= 1.0

    trainer.save_checkpoint("latest")
    # fresh trainer restores step + params exactly
    trainer2 = DiscriminativeTrainer(
        _cfg(max_iter=1), model, train_loader, mesh=mesh,
        out_dir_ckpt=str(tmp_path / "ckpt"))
    trainer2.load_checkpoint(str(tmp_path / "ckpt" / "latest"))
    assert trainer2.effective_iter == trainer.effective_iter
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.params["backbone"]["cls_token"]),
        np.asarray(trainer.state.params["backbone"]["cls_token"]))


def test_eval_metrics_one_dispatch_per_batch(sam_tree, monkeypatch):
    """Validation must issue O(batches) device programs, not
    O(samples x metrics): the python metric fns may run only while
    TRACING the batched kernel (once per compile), never per sample."""
    from amodal_depth_anything_tpu.utils import metrics as M

    calls = {"n": 0}

    def wrap(fn):
        def counted(*a, **k):
            calls["n"] += 1
            return fn(*a, **k)
        return counted

    for name, fn in list(M.METRIC_FNS.items()):
        monkeypatch.setitem(M.METRIC_FNS, name, wrap(fn))

    root, list_path = sam_tree
    train_loader, val_loader = _loaders(root, list_path)  # 16 samples, b=2
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    trainer = DiscriminativeTrainer(
        _cfg(eval_metrics=tuple(M.METRIC_FNS)), model, train_loader,
        val_loaders=[val_loader], mesh=mesh)
    calls["n"] = 0
    res = trainer.validate_single_dataset(val_loader, eval=True)
    assert np.isfinite(res["align_overall"]["abs_relative_difference"])
    n_names = len(M.METRIC_FNS)
    # old path: 8 batches x 2 samples x 2 banks x 10 metrics = 320 calls.
    # batched path: tracing only — 2 banks x 10 metrics x (<=2 trace
    # passes for jit+vmap). Anything per-sample would blow this bound.
    assert calls["n"] <= 6 * n_names, calls["n"]


def test_exact_resume_bitwise(sam_tree, tmp_path):
    """A restored run must reproduce the interrupted run's losses
    BIT-FOR-BIT: all randomness is index-seeded ((seed, epoch, index)) in
    the data layer, the checkpoint restores params/opt-state exactly, and
    the jitted step is deterministic. (The reference re-seeds global RNG
    per step for the same guarantee but its --resume_run is stubbed.)"""
    root, list_path = sam_tree
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])

    def run(n_iter, resume_from=None):
        train_loader, _ = _loaders(root, list_path)
        trainer = DiscriminativeTrainer(
            _cfg(max_iter=n_iter, save_period=2), model, train_loader,
            mesh=mesh, out_dir_ckpt=str(tmp_path / "ckpt"))
        if resume_from:
            trainer.load_checkpoint(resume_from)
        losses = []
        orig = trainer._train_step

        def recording_step(state, batch):
            state, loss = orig(state, batch)
            losses.append(float(loss))
            return state, loss

        trainer._train_step = recording_step
        trainer.train()
        return losses, trainer

    losses_full, t1 = run(5)
    assert len(losses_full) == 5
    losses_resumed, t2 = run(5, resume_from=str(tmp_path / "ckpt" /
                                                "iter_000002"))
    assert t2.effective_iter == 5
    np.testing.assert_array_equal(np.float64(losses_resumed),
                                  np.float64(losses_full[2:]))
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["backbone"]["cls_token"]),
        np.asarray(t1.state.params["backbone"]["cls_token"]))


def test_train_on_8_device_mesh(sam_tree):
    root, list_path = sam_tree
    train_loader, _ = _loaders(root, list_path, batch=4)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    model = get_model("AmodalDAv2", encoder="vitt")
    trainer = DiscriminativeTrainer(_cfg(max_iter=2), model, train_loader,
                                    mesh=mesh)
    trainer.train()
    assert trainer.effective_iter == 2
    # qkv kernels actually sharded over the model axis
    qkv = trainer.state.params["backbone"]["blocks"]["attn"]["qkv"]["w"]
    assert "model" in str(qkv.sharding.spec)
    # pinned out_shardings: step 2 must reuse step 1's compilation
    assert trainer._train_step._cache_size() == 1


def test_train_cli_smoke(sam_tree, tmp_path, monkeypatch):
    root, list_path = sam_tree
    from amodal_depth_anything_tpu.cli import train as train_cli

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "smoke_synthetic_vitt.yaml")
    # smoke config references filenames 'train.txt' relative to data dir
    train_cli.main([
        "--config", cfg_path,
        "--base_data_dir", root,
        "--output_dir", str(tmp_path / "out"),
        "--no_wandb",
    ])
    runs = list((tmp_path / "out" / "smoke_synthetic_vitt").iterdir())
    assert runs, "run dir created"
    assert (runs[0] / "config.yaml").exists()
    assert (runs[0] / "checkpoint" / "latest").exists()


def test_train_cli_tp_mesh(sam_tree, tmp_path):
    """--mesh_model wires a tensor-parallel axis through the CLI (the
    mesh was previously hardwired to all-data)."""
    root, _ = sam_tree
    from amodal_depth_anything_tpu.cli import train as train_cli

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "smoke_synthetic_vitt.yaml")
    train_cli.main([
        "--config", cfg_path,
        "--base_data_dir", root,
        "--output_dir", str(tmp_path / "out_tp"),
        "--no_wandb", "--mesh_model", "2", "--max_iter", "1",
    ])
    runs = list((tmp_path / "out_tp" / "smoke_synthetic_vitt").iterdir())
    assert runs and (runs[0] / "checkpoint" / "latest").exists()


def test_step_timer_and_profiler_wiring(sam_tree, tmp_path):
    """The trainer times every step and captures a jax.profiler trace for
    the configured window (reference has no profiler at all, SURVEY §5.1)."""
    root, list_path = sam_tree
    train_loader, _ = _loaders(root, list_path)
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    prof_dir = str(tmp_path / "profile")
    trainer = DiscriminativeTrainer(
        _cfg(max_iter=2, profile_dir=prof_dir, profile_start=1,
             profile_steps=1),
        model, train_loader, mesh=mesh)
    trainer.train()
    assert not trainer._tracing
    timing = trainer.step_timer.summary()
    # warmup=2 absorbs the compile steps; 2 iters may leave 0 samples,
    # but the counter must have seen every step
    assert trainer._micro_step_count == 2
    assert os.path.isdir(prof_dir) and os.listdir(prof_dir), \
        "profiler trace not written"


def test_train_cli_wandb_exercised(sam_tree, tmp_path, monkeypatch):
    """init_wandb's ENABLED path executed for real (logging_util.py:67-75;
    reference src/util/logging_util.py:68-73): a wandb module in
    sys.modules receives init(sync_tensorboard=True, ...) with the run
    config, driven through the train CLI with a wandb: config section."""
    import sys
    import types

    calls = {}
    fake = types.ModuleType("wandb")

    def _init(**kw):
        calls.update(kw)
        run = types.SimpleNamespace(id="fake-run", finish=lambda: None)
        return run

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    root, _ = sam_tree
    from amodal_depth_anything_tpu.cli import train as train_cli

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "smoke_synthetic_vitt.yaml")
    wandb_cfg = tmp_path / "smoke_wandb.yaml"
    wandb_cfg.write_text(f"base_config:\n- {os.path.abspath(cfg_path)}\n"
                         "wandb:\n  project: rehearse\n")
    train_cli.main([
        "--config", str(wandb_cfg),
        "--base_data_dir", root,
        "--output_dir", str(tmp_path / "out_wandb"),
        "--max_iter", "1",
    ])
    assert calls.get("sync_tensorboard") is True
    assert calls.get("project") == "rehearse"
    assert isinstance(calls.get("config"), dict)


@pytest.mark.parametrize("opt", ["adafactor", "adam-bf16mu"])
def test_memory_efficient_optimizers(sam_tree, opt):
    """The single-chip vitg escape hatch (train/state.py): Adam's f32
    state alone is 8.8 GB at 1.1B params (measured OOM at every
    remat/batch combo on a 16 GB chip) — adafactor / bf16-mu adam must
    run the same train step and actually move the params."""
    root, list_path = sam_tree
    train_loader, _ = _loaders(root, list_path)
    model = get_model("AmodalDAv2", encoder="vitt")
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    trainer = DiscriminativeTrainer(_cfg(optimizer=opt), model, train_loader,
                                    mesh=mesh)
    before = np.asarray(trainer.state.params["backbone"]["cls_token"])
    trainer.train()
    after = np.asarray(trainer.state.params["backbone"]["cls_token"])
    assert trainer.effective_iter == 2
    assert np.isfinite(after).all()
    assert np.abs(after - before).max() > 0

    if opt == "adafactor":
        # factored second moment: for a matrix above the factoring
        # threshold the optimizer state stores [r]+[c] vectors, never the
        # [r,c] moment (the memory win that lets vitg fit a 16 GB chip;
        # vitt's matrices are all below the 128 threshold, so assert on a
        # qualifying dummy matrix).
        from amodal_depth_anything_tpu.train import make_optimizer
        import jax.numpy as jnp
        tx = make_optimizer(lr=1e-4, total_iter=10, optimizer="adafactor")
        big = {"w": jnp.zeros((256, 512))}
        st = tx.init(big)
        sizes = sorted(l.size for l in jax.tree.leaves(st)
                       if hasattr(l, "size") and l.size > 1)
        assert sizes and sizes[-1] <= 512, sizes  # no [256,512] moment


def test_head_tile_train_step_exact(sam_tree):
    """TrainerConfig.head_tile (DPT-head fwd+bwd in rematted lax.map
    chunks — the vitg@518 b8 HBM lever) is EXACT: one train step from
    identical init must land on the same params as the untiled step."""
    root, list_path = sam_tree
    mesh = make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])

    def one_step(head_tile):
        train_loader, _ = _loaders(root, list_path, batch=4)
        model = get_model("AmodalDAv2", encoder="vitt")
        trainer = DiscriminativeTrainer(
            _cfg(max_iter=1, head_tile=head_tile), model, train_loader,
            mesh=mesh)
        trainer.train()
        return trainer.state.params

    p_full = one_step(None)
    p_tiled = one_step(2)
    a = np.asarray(p_full["depth_head"]["scratch"]["output_conv2"]
                   ["conv2"]["w"])
    b = np.asarray(p_tiled["depth_head"]["scratch"]["output_conv2"]
                   ["conv2"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    c = np.asarray(p_full["backbone"]["cls_token"])
    d = np.asarray(p_tiled["backbone"]["cls_token"])
    np.testing.assert_allclose(c, d, rtol=1e-5, atol=1e-6)


def test_train_cli_wandb_resume_reattaches(sam_tree, tmp_path, monkeypatch):
    """Resumed training re-attaches to the ORIGINAL wandb run: run 1
    persists WANDB_ID at the run-dir level; run 2 with --resume_run
    passes id=<that id>, resume='must' to wandb.init. (The reference
    persists the id, logging_util.py:85-93, but its resume path raises
    NotImplementedError, train.py:163-164 — here the round-trip is
    live.)"""
    import glob
    import sys
    import types

    calls = []
    fake = types.ModuleType("wandb")

    def _init(**kw):
        calls.append(kw)
        return types.SimpleNamespace(id="original-run",
                                     finish=lambda: None)

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    root, _ = sam_tree
    from amodal_depth_anything_tpu.cli import train as train_cli

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "smoke_synthetic_vitt.yaml")
    wandb_cfg = tmp_path / "smoke_wandb.yaml"
    wandb_cfg.write_text(f"base_config:\n- {os.path.abspath(cfg_path)}\n"
                         "wandb:\n  project: rehearse\nsave_period: 1\n")
    out = tmp_path / "out_resume"
    train_cli.main(["--config", str(wandb_cfg), "--base_data_dir", root,
                    "--output_dir", str(out), "--max_iter", "1"])
    id_files = glob.glob(str(out / "*" / "*" / "WANDB_ID"))
    assert id_files, "WANDB_ID not persisted at the run-dir level"
    with open(id_files[0]) as f:
        assert f.read().strip() == "original-run"

    ckpts = glob.glob(str(out / "*" / "*" / "checkpoint" / "*"))
    assert ckpts, "no checkpoint saved for the resume leg"
    train_cli.main(["--config", str(wandb_cfg), "--base_data_dir", root,
                    "--output_dir", str(out), "--max_iter", "2",
                    "--resume_run", ckpts[0]])
    assert calls[-1].get("id") == "original-run"
    assert calls[-1].get("resume") == "must"
