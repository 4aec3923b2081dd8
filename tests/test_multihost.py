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
