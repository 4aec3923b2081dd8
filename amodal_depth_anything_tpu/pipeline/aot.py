"""AOT serving artifacts: serialize the fused serving program itself.

The reference deploys by shipping the whole Python model zoo to every
replica and re-tracing at startup (its `infer.py` builds the torch
modules from source on each run). TPU-native serving wants the opposite:
trace + lower ONCE, then ship a portable artifact. This module
`jax.export`s the one-program amodal pipeline (`amodal_depth_graph`) to
StableHLO — Pallas attention included: the Mosaic kernel payload rides
inside the `tpu_custom_call` backend_config, and TPU-target export works
from a CPU-only host (verified: cross-platform lowering embeds the
kernel without a device) — so a serving replica needs only:

* the param pytree (``serving_ckpt.save_serving`` / Orbax), and
* this artifact directory (``meta.json`` + one serialized program per
  compiled batch bucket).

No model Python, no tracing, no shape surprises at startup; with a
persistent compilation cache the XLA compile is skipped too. Buckets are
static-shape by design — pair with ``pipeline.server.MicroBatcher``,
which pads every request stream to the compiled batch.

Versioning: `jax.export` guarantees StableHLO forward compatibility
(artifacts load on jax >= the exporting version for its compatibility
window); `meta.json` records the exporting jax version and platforms so
a replica can refuse mismatched artifacts early.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["export_amodal_program", "save_amodal_artifact",
           "ExportedAmodalServing", "export_depthfm_program",
           "save_depthfm_artifact", "ExportedDepthFMServing",
           "ARTIFACT_VERSION"]

ARTIFACT_VERSION = 1


def _param_specs(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        tree)


def _resolve_platforms(platforms):
    if platforms is not None:
        return tuple(platforms)
    try:
        return (jax.devices()[0].platform,)
    except RuntimeError:  # pragma: no cover
        return ("cpu",)


def export_amodal_program(pipe, *, batch: int, hw: tuple[int, int],
                          platforms=None):
    """`jax.export` the pipeline's fused program at one static shape.

    Returns the `jax.export.Exported`. The exported callable's signature
    is ``(params_raw, params_amodal, image[B,H,W,3], mask[B,H,W,1]) ->
    (base[B,S,S], blended[B,S,S])`` with dtypes taken from the live
    pipeline (so an int8-quantized pipe exports the int8 program).

    ``attn_impl`` is pinned by the export TARGET, not the exporting
    host: a ``platforms=("tpu",)`` export from a CPU box gets the Pallas
    kernel (`ops/attention.py::default_attn_impl` would otherwise pick
    by local device)."""
    from .amodal_pipeline import amodal_depth_graph

    platforms = _resolve_platforms(platforms)
    attn_impl = pipe.attn_impl
    if attn_impl is None:
        attn_impl = "pallas" if platforms == ("tpu",) else "xla"

    def fn(params_raw, params_amodal, image, mask):
        return amodal_depth_graph(
            params_raw, params_amodal, image, mask,
            raw_cfg=pipe.raw_cfg, amodal_cfg=pipe.amodal_cfg,
            size=pipe.size, attn_impl=attn_impl,
            base_token_merge=pipe.base_token_merge,
            amodal_token_merge=pipe.amodal_token_merge,
            head_batch_tile=pipe.head_batch_tile)

    h, w = hw
    img = jax.ShapeDtypeStruct((batch, h, w, 3), pipe.dtype)
    msk = jax.ShapeDtypeStruct((batch, h, w, 1), pipe.dtype)
    return jax.export.export(jax.jit(fn), platforms=platforms)(
        _param_specs(pipe.params_raw), _param_specs(pipe.params_amodal),
        img, msk)


def save_amodal_artifact(pipe, path: str, *, batches=(1, 8),
                         hw: tuple[int, int] = (1022, 1022),
                         platforms=None) -> dict:
    """Write the serving artifact directory: ``meta.json`` plus one
    ``batch_{N}.jaxexport`` per bucket. Returns the meta dict."""
    platforms = _resolve_platforms(platforms)
    os.makedirs(path, exist_ok=True)
    for b in batches:
        exp = export_amodal_program(pipe, batch=int(b), hw=hw,
                                    platforms=platforms)
        with open(os.path.join(path, f"batch_{int(b)}.jaxexport"),
                  "wb") as f:
            f.write(exp.serialize())
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "kind": "amodal_serving_program",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batches": [int(b) for b in batches],
        "hw": [int(hw[0]), int(hw[1])],
        "size": int(pipe.size),
        "dtype": jnp.dtype(pipe.dtype).name,
        "raw_cfg": dataclasses.asdict(pipe.raw_cfg),
        "amodal_cfg": dataclasses.asdict(pipe.amodal_cfg),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return meta


def _depthfm_inputs(cfg) -> list:
    """Which optional graph inputs this guide_type consumes, in the
    fixed exported-argument order."""
    g = cfg.guide_type
    names = ["image"]
    if "mask" in g:
        names.append("mask")
    if "observation" in g:
        names.append("observation")
    if "image" in g:
        names.append("guide_rgb")
    return names


def export_depthfm_program(pipe, *, batch: int, hw: tuple[int, int],
                           platforms=None):
    """`jax.export` the DepthFM amodal-generate program (preprocess ->
    VAE encode -> Euler ODE -> decode, one program) at one static shape.

    Exported signature: ``(params, image[B,H,W,3], <guide inputs per
    cfg.guide_type: mask/observation [B,H,W,1], guide_rgb [B,H,W,3]>)
    -> depth [B,S,S,1]`` — the in-graph PRNG seed, num_steps, ToMe and
    DeepCache settings are baked in from the live pipeline."""
    from ..models.depthfm import depthfm_generate

    platforms = _resolve_platforms(platforms)
    attn_impl = pipe.attn_impl
    if attn_impl is None:
        attn_impl = "pallas" if platforms == ("tpu",) else "xla"
    names = _depthfm_inputs(pipe.cfg)
    seed = pipe.seed

    def fn(params, *inputs):
        kw = dict(zip(names, inputs))
        rgb, m, obs, grgb = pipe._prep(kw["image"], kw.get("mask"),
                                       kw.get("observation"),
                                       kw.get("guide_rgb"))
        return depthfm_generate(
            params, pipe.cfg, jax.random.PRNGKey(seed), rgb,
            num_steps=pipe.num_steps, guide_rgb=grgb, guide_mask=m,
            observation=obs, attn_impl=attn_impl, tome=pipe.tome,
            deep_cache=pipe.deep_cache)

    h, w = hw
    specs = [_param_specs(pipe.params)]
    for n in names:
        c = 3 if n in ("image", "guide_rgb") else 1
        specs.append(jax.ShapeDtypeStruct((batch, h, w, c), pipe.dtype))
    return jax.export.export(jax.jit(fn), platforms=platforms)(*specs)


def save_depthfm_artifact(pipe, path: str, *, batches=(1, 8),
                          hw: tuple[int, int] = (512, 512),
                          platforms=None) -> dict:
    """DepthFM counterpart of `save_amodal_artifact`."""
    platforms = _resolve_platforms(platforms)
    os.makedirs(path, exist_ok=True)
    for b in batches:
        exp = export_depthfm_program(pipe, batch=int(b), hw=hw,
                                     platforms=platforms)
        with open(os.path.join(path, f"batch_{int(b)}.jaxexport"),
                  "wb") as f:
            f.write(exp.serialize())
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "kind": "depthfm_serving_program",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batches": [int(b) for b in batches],
        "hw": [int(hw[0]), int(hw[1])],
        "size": int(pipe.size),
        "dtype": jnp.dtype(pipe.dtype).name,
        "inputs": _depthfm_inputs(pipe.cfg),
        "num_steps": int(pipe.num_steps),
        "cfg": dataclasses.asdict(pipe.cfg),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return meta


class _ExportedServing:
    """Shared replica-side machinery: load meta + per-bucket programs,
    platform guard, bucket lookup. Subclasses set `_KIND` and implement
    ``bind``/``__call__``."""

    _KIND = None

    def __init__(self, meta: dict, programs: dict):
        self.meta = meta
        self.programs = programs  # {batch: jax.export.Exported}
        self._params = None

    @classmethod
    def load(cls, path: str, *, check_platform: bool = True):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("kind") != cls._KIND:
            raise ValueError(f"{path} holds {meta.get('kind')!r}, "
                             f"expected {cls._KIND!r}")
        if check_platform:
            here = _resolve_platforms(None)[0]
            if here not in meta["platforms"]:
                raise ValueError(
                    f"artifact exported for {meta['platforms']}, but this "
                    f"host runs '{here}' (check_platform=False to force)")
        programs = {}
        for b in meta["batches"]:
            with open(os.path.join(path, f"batch_{b}.jaxexport"),
                      "rb") as f:
                programs[int(b)] = jax.export.deserialize(f.read())
        return cls(meta, programs)

    def _program(self, batch: int):
        if self._params is None:
            raise RuntimeError("call .bind(...) before serving")
        if batch not in self.programs:
            raise ValueError(f"batch {batch} not in compiled buckets "
                             f"{self.batches} (front with MicroBatcher)")
        return self.programs[batch]

    @property
    def batches(self):
        return sorted(self.programs)

    @property
    def size(self) -> int:
        """Output square size — lets the handle drop into surfaces that
        expect a live pipeline (e.g. `cli.serve.build_server`)."""
        return int(self.meta["size"])

    @property
    def hw(self) -> tuple[int, int]:
        return tuple(int(x) for x in self.meta["hw"])


class ExportedAmodalServing(_ExportedServing):
    """A replica-side handle: deserialized programs + bound params.

    ``load(dir)`` -> handle; ``bind(params_raw, params_amodal)`` attaches
    the weight pytrees (e.g. from ``serving_ckpt.restore_serving_state``
    or ``AmodalDepthPipeline.load_serving(...)``'s trees); calling the
    bound handle dispatches the exact-batch program (no padding here —
    front with `MicroBatcher` for request coalescing)."""

    _KIND = "amodal_serving_program"

    def bind(self, params_raw, params_amodal):
        self._params = (params_raw, params_amodal)
        return self

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        """image [B,H,W,3], mask [B,H,W] or [B,H,W,1]; B must be a
        compiled bucket. Returns (base, blended) np arrays, like
        ``AmodalDepthPipeline.__call__``."""
        dt = jnp.dtype(self.meta["dtype"])
        img = jnp.asarray(np.asarray(image, np.float32), dt)
        msk = np.asarray(mask, np.float32)
        if msk.ndim == 3:
            msk = msk[..., None]
        msk = jnp.asarray(msk, dt)
        prog = self._program(img.shape[0])
        base, blended = prog.call(*self._params, img, msk)
        return np.asarray(base, np.float32), np.asarray(blended,
                                                        np.float32)


class ExportedDepthFMServing(_ExportedServing):
    """Replica handle for the generative family: ``load(dir)`` then
    ``bind(params)`` (from ``DepthFMPipeline.load_serving`` trees or
    `serving_ckpt.restore_serving_state(..., expect_kind='depthfm')`).
    Call signature mirrors ``DepthFMPipeline.__call__`` for the guide
    inputs recorded at export (``meta['inputs']``); returns batched
    amodal depth [B,S,S] in [0,1]."""

    _KIND = "depthfm_serving_program"

    def bind(self, params):
        self._params = (params,)
        return self

    def __call__(self, image: np.ndarray, mask: np.ndarray | None = None,
                 observation: np.ndarray | None = None,
                 guide_rgb: np.ndarray | None = None):
        dt = jnp.dtype(self.meta["dtype"])
        provided = {"image": image, "mask": mask,
                    "observation": observation, "guide_rgb": guide_rgb}
        args = []
        for n in self.meta["inputs"]:
            a = provided.get(n)
            if a is None:
                raise ValueError(f"artifact requires input {n!r} "
                                 f"(exported guide inputs: "
                                 f"{self.meta['inputs']})")
            a = np.asarray(a, np.float32)
            if n not in ("image", "guide_rgb") and a.ndim == 3:
                a = a[..., None]
            args.append(jnp.asarray(a, dt))
        prog = self._program(args[0].shape[0])
        out = prog.call(*self._params, *args)
        return np.asarray(out[..., 0], np.float32)
