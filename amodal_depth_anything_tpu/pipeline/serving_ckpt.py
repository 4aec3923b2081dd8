"""Serving-state checkpoints: persist a READY-TO-SERVE pipeline.

The serving-optimization ladder mutates the param pytrees in place
(bf16 cast, W8A8 int8 weights + scale leaves from `quantize_int8`). The
calibrated int8 path in particular costs ~2 extra large jit programs
(~65 min of compiles through a tunneled TPU) plus a calibration forward —
per process. `save_serving` writes the EXACT post-optimization pytree
(mixed dtypes preserved: int8 kernels, f32/bf16 scales) plus the pipeline
construction metadata; `load_serving` restores a bit-identical serving
instance with zero re-quantization/calibration work. The reference has no
equivalent (its serving state is just the torch checkpoint; it has no
post-load optimization to persist).

Layout on disk:
  <path>/params/         Orbax PyTree checkpoint (dtypes preserved)
  <path>/serving_meta.json   pipeline kind + configs + runtime knobs
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

__all__ = ["save_serving_state", "restore_serving_state", "cfg_from_dict"]

_META = "serving_meta.json"


def cfg_from_dict(cls, d: dict):
    """Rebuild a flat config dataclass from its JSON dict (tuples come
    back as lists — coerce; ignore unknown keys so configs can grow)."""
    names = {f.name for f in dataclasses.fields(cls)}
    kw = {k: (tuple(v) if isinstance(v, list) else v)
          for k, v in d.items() if k in names}
    return cls(**kw)


def save_serving_state(path: str, trees: dict, meta: dict) -> None:
    """trees: {name: param pytree}; meta: JSON-able construction info."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ocp.PyTreeCheckpointer().save(os.path.join(path, "params"), trees,
                                  force=True)
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def restore_serving_state(path: str, *, expect_kind: str):
    """-> (trees, meta). Leaves come back as device arrays with their
    saved dtypes (int8 kernels stay int8 — no cast)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    kind = meta.get("kind")
    if kind != expect_kind:
        raise ValueError(f"{path} holds a {kind!r} serving state, "
                         f"expected {expect_kind!r}")
    trees = ocp.PyTreeCheckpointer().restore(os.path.join(path, "params"))
    trees = jax.tree.map(jnp.asarray, trees)
    return trees, meta
