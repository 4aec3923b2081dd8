"""Device mesh construction for data/tensor parallel execution.

TPU-native replacement for the reference's distributed runtime (HF
Accelerate + torch DDP over NCCL — SURVEY.md §2.10, reference
`train.py:38-40,110-116`). There is no hand-written communication layer:
we build one `jax.sharding.Mesh` over the slice and annotate shardings;
XLA inserts the all-reduces (gradients), all-gathers (metrics) and
broadcasts over ICI/DCN.

Axes:
  * ``data``  — batch sharding (DDP equivalent).
  * ``model`` — optional tensor parallelism for the ViT-G trunk
    (attention heads / FFN hidden sharded Megatron-style).
  * ``pipe``  — optional pipeline stages for the trunk (GPipe schedule,
    `parallel/pipeline.py`); size 1 (no-op) unless requested.

The reference's model sizes (<=1.1B params) fit one chip, so the default
mesh is (n_devices, 1) — pure DP — but the `model` axis is wired through
so `dryrun_multichip` and larger deployments exercise real tp+dp.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1 = all remaining devices
    model: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        model = max(1, self.model)
        pipe = max(1, self.pipe)
        data = self.data if self.data > 0 else n_devices // (model * pipe)
        if data * model * pipe != n_devices:
            raise ValueError(
                f"mesh {data}x{model}x{pipe} != {n_devices} available devices")
        return data, model, pipe


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    data, model, pipe = cfg.resolve(len(devices))
    if pipe == 1:
        # keep the 2-axis layout for the common dp(+tp) case: existing
        # sharding rules and tests address mesh.shape['data'/'model']
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, axis_names=("data", "model"))
    arr = np.asarray(devices).reshape(pipe, data, model)
    return Mesh(arr, axis_names=("pipe", "data", "model"))
