"""Multi-host (multi-process) runtime helpers.

TPU-native mapping of the reference's distributed backend (SURVEY.md
§5.8): HF Accelerate's NCCL process group + its four collectives —
all-reduce (DDP grads), all-gather (`gather_for_metrics`,
discriminative_trainer.py:591), broadcast (train.py:120) and barrier
(`wait_for_everyone`, train.py:152) — become:

  * `initialize()`            -> `jax.distributed.initialize()` (GRPC
    coordinator; on TPU pods the runtime autodetects everything, on
    SLURM/GPU-style launches the env triple is read explicitly).
  * gradient all-reduce       -> implicit: jit over a mesh whose 'data'
    axis spans all processes (no code here — sharding does it).
  * `gather_metrics()`        -> `multihost_utils.process_allgather`.
  * `sync_processes()`        -> `multihost_utils.sync_global_devices`.
  * rank-0 side effects       -> `is_main_process()` guards (checkpoint
    writes, TensorBoard, tqdm), mirroring Accelerate's
    `is_main_process` (reference train.py:152-202).

Everything degrades to a no-op in single-process runs, so the same
entry points work from a laptop CPU to a multi-host pod slice.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize", "is_main_process", "process_index", "process_count",
           "sync_processes", "gather_metrics"]

_INITIALIZED = False


def _derive_slurm_coordinator() -> str | None:
    """Multi-task SLURM launch without an explicit coordinator: use the
    first node of the job's nodelist (the conventional torch/JAX SLURM
    pattern; `scontrol` ships with every SLURM cluster). Port from
    JAX_COORDINATOR_PORT (default 56207). Returns None off-SLURM, on
    single-task jobs, or when the nodelist can't be expanded."""
    import subprocess

    if int(os.environ.get("SLURM_NTASKS", "1")) < 2:
        return None
    nodelist = (os.environ.get("SLURM_JOB_NODELIST")
                or os.environ.get("SLURM_NODELIST"))
    if not nodelist:
        return None
    try:
        first = subprocess.run(
            ["scontrol", "show", "hostnames", nodelist],
            capture_output=True, text=True, timeout=10,
            check=True).stdout.splitlines()[0].strip()
    except Exception:  # noqa: BLE001 — fall back to requiring the env var
        import logging
        logging.warning(
            "SLURM multi-task launch detected but the coordinator could "
            "not be derived from %r; set JAX_COORDINATOR_ADDRESS "
            "explicitly or each host will train independently", nodelist)
        return None
    port = os.environ.get("JAX_COORDINATOR_PORT", "56207")
    return f"{first}:{port}"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Bring up the multi-process runtime if this looks like a multi-host
    launch; returns True iff `jax.distributed.initialize` ran.

    Detection order: explicit args > JAX_COORDINATOR_ADDRESS env >
    SLURM nodelist derivation (`_derive_slurm_coordinator`, with
    SLURM_{NTASKS,PROCID} — the reference's SLURM pattern,
    slurm_util.py:6-14) > TPU-pod autodetection is left to JAX itself
    (calling initialize() with no args on a pod also works, but we only
    do it when the caller opts in via env, so single-chip/dev runs never
    pay the coordinator timeout)."""
    global _INITIALIZED
    if _INITIALIZED:
        return False
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        coordinator_address = _derive_slurm_coordinator()
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get(
            "JAX_NUM_PROCESSES", os.environ.get("SLURM_NTASKS", "1")))
    if process_id is None:
        process_id = int(os.environ.get(
            "JAX_PROCESS_ID", os.environ.get("SLURM_PROCID", "0")))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Accelerate `is_main_process` equivalent — gate file writes on it."""
    return jax.process_index() == 0


def sync_processes(name: str = "barrier") -> None:
    """`wait_for_everyone` equivalent (reference train.py:152). No-op in
    single-process runs."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def gather_metrics(x):
    """`gather_for_metrics` equivalent: every process receives the
    concatenation of all processes' `x` (host numpy in, host numpy out).
    Identity in single-process runs."""
    if jax.process_count() <= 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
