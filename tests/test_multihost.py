"""Multi-host runtime helpers: single-process no-op semantics + env
detection (the multi-process path needs a real pod; here we pin the
contract every entry point relies on)."""

import numpy as np

from amodal_depth_anything_tpu.parallel import (gather_metrics, initialize,
                                                is_main_process,
                                                process_count, process_index,
                                                sync_processes)


def test_single_process_contract():
    assert process_index() == 0
    assert process_count() == 1
    assert is_main_process()
    sync_processes("test")  # must not raise / block
    x = np.arange(6).reshape(2, 3)
    assert gather_metrics(x) is x


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False  # no env -> never touches jax.distributed


def test_initialize_reads_slurm_env(monkeypatch):
    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    import jax

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "2")
    from amodal_depth_anything_tpu.parallel import multihost
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    assert multihost.initialize() is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}
    # second call is a no-op
    assert multihost.initialize() is False


def test_derive_slurm_coordinator(monkeypatch):
    """Multi-task SLURM launches derive the coordinator from the first
    nodelist host via scontrol (no JAX_COORDINATOR_ADDRESS needed)."""
    import subprocess

    from amodal_depth_anything_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_JOB_NODELIST", "tpu[01-04]")

    def fake_run(cmd, **kw):
        assert cmd == ["scontrol", "show", "hostnames", "tpu[01-04]"]
        class R:
            stdout = "tpu01\ntpu02\ntpu03\ntpu04\n"
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert multihost._derive_slurm_coordinator() == "tpu01:56207"
    monkeypatch.setenv("JAX_COORDINATOR_PORT", "777")
    assert multihost._derive_slurm_coordinator() == "tpu01:777"
    # single-task jobs never derive (dev runs stay local)
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert multihost._derive_slurm_coordinator() is None
    # scontrol failure degrades to None (warning), not an exception
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("no scontrol")))
    assert multihost._derive_slurm_coordinator() is None


def test_train_cli_wires_sharding_yaml_knobs(tmp_path):
    """fsdp/sequence_parallel/remat YAML keys reach TrainerConfig (they
    were silently dropped before)."""
    import os

    from amodal_depth_anything_tpu.cli.train import trainer_config_from_cfg
    from amodal_depth_anything_tpu.utils.config import recursive_load_config

    base = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        "smoke_synthetic_vitt.yaml"))
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"base_config:\n- {base}\n"
                "fsdp: true\nsequence_parallel: true\nremat: false\n")
    cfg = recursive_load_config(cfg_path)
    tcfg = trainer_config_from_cfg(cfg, accumulation_steps=1)
    assert tcfg.fsdp is True
    assert tcfg.sequence_parallel is True
    assert tcfg.remat is False
