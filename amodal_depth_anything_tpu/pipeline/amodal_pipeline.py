"""End-to-end amodal-depth inference as ONE jit-fused XLA graph.

The reference `infer.py` round-trips host<->GPU four times (base depth
in/out, amodal in/out) and blends partially on CPU (SURVEY.md §3.1). Here
preprocessing (resize / normalize / mask binarize / [-1,1] scaling), the
frozen base DAV2 forward, the guided AmodalDAv2 forward, and the
median-filter blend are a single compiled program: the image goes to the
device once, two float maps come back.

Behavior parity notes vs reference `infer.py:16-121`:
  * Channel order: the reference feeds cv2's BGR directly into both
    models (`infer.py:75-76,83`) — we reproduce that faithfully in the
    CLI (the HF checkpoint was trained accordingly for this entry point).
  * Base input: cv2.resize INTER_LINEAR on uint8 == bilinear
    align_corners=False (we compute in f32; sub-lsb deltas only).
  * Guided inputs: NEAREST resize at 518 (`infer.py:84-86`).
  * Base depth is min-max normalized to [0,1] (`infer.py:22`); guided
    model gets `mask*2-1` and `depth*2-1` (`infer.py:88-93`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.amodal_dav2 import (DAV2Config, apply_amodal_dav2,
                                  apply_raw_dav2, init_amodal_dav2)
from ..ops.blend import median_filter_blend
from ..ops.resize import resize2d, resize_nearest

__all__ = ["amodal_depth_graph", "AmodalDepthPipeline"]


@functools.partial(jax.jit, static_argnames=("raw_cfg", "amodal_cfg", "size",
                                             "attn_impl", "act_sharding",
                                             "base_token_merge",
                                             "amodal_token_merge",
                                             "head_batch_tile"))
def amodal_depth_graph(params_raw, params_amodal, image, mask, *,
                       raw_cfg: DAV2Config, amodal_cfg: DAV2Config,
                       size: int = 518, attn_impl: str | None = None,
                       act_sharding=None,
                       base_token_merge: tuple[int, int] | None = None,
                       amodal_token_merge: tuple[int, int] | None = None,
                       base_image=None,
                       head_batch_tile: int | None = None):
    """image: [B,h,w,3] float in [0,255]; mask: [B,h,w,1] float (>0 = on).

    Returns (base_depth [B,S,S], blended_depth [B,S,S]) in [0,1].

    `base_image`: optional [B,S,S,3] float in [0,255] — a host-resized
    input for the base branch. The reference resizes with cv2 on uint8
    (fixed-point bilinear + rounding, `infer.py:17`); the in-graph f32
    resize differs by quantization, which a random-weight trunk amplifies
    past 1e-3. `infer_single_image` passes the cv2-resized image for
    exact parity; direct batch callers keep the fused in-graph resize.

    `act_sharding`: NamedSharding for the trunks' token streams — serving
    scale-out: with TP-sharded params (parallel.param_sharding) the whole
    graph runs tensor-parallel over the mesh, cutting single-image
    latency by the tp degree (the reference can only replicate)."""
    img01 = image / 255.0
    # --- base-depth branch (bilinear resize, reference infer.py:17)
    if base_image is not None:
        base_in = base_image / 255.0
    else:
        base_in = resize2d(img01, size=(size, size), method="bilinear")
    base_depth = apply_raw_dav2(params_raw, raw_cfg, base_in,
                                attn_impl=attn_impl,
                                act_sharding=act_sharding,
                                token_merge=base_token_merge,
                                head_batch_tile=head_batch_tile)  # [B,S,S]
    lo = jnp.min(base_depth, axis=(-1, -2), keepdims=True)
    hi = jnp.max(base_depth, axis=(-1, -2), keepdims=True)
    base_depth = (base_depth - lo) / jnp.maximum(hi - lo, 1e-8)

    # --- guided branch (nearest resize, reference infer.py:84-87)
    rgb = resize_nearest(img01, size=(size, size))
    m = (resize_nearest(mask, size=(size, size)) > 0).astype(image.dtype)
    obs = base_depth[..., None]
    pred = apply_amodal_dav2(
        params_amodal, amodal_cfg, rgb,
        guide_mask=m * 2.0 - 1.0,
        observation=obs * 2.0 - 1.0,
        attn_impl=attn_impl, act_sharding=act_sharding,
        token_merge=amodal_token_merge,
        head_batch_tile=head_batch_tile)  # [B,S,S,1]

    blended = median_filter_blend(pred, obs, m)
    return base_depth, blended[..., 0]


class AmodalDepthPipeline:
    """User-facing pipeline: load checkpoints once, infer many images.

    Mirrors the reference CLI contract (`infer.py:59-121`): inputs are an
    image path and an amodal-mask path; outputs are colorized base/amodal
    depth renders plus the raw float maps.
    """

    def __init__(self, params_raw, raw_cfg: DAV2Config, params_amodal,
                 amodal_cfg: DAV2Config, *, size: int = 518,
                 attn_impl: str | None = None, dtype=jnp.float32,
                 mesh=None, cast: bool = True,
                 base_token_merge: tuple[int, int] | None = None,
                 amodal_token_merge: tuple[int, int] | None = None,
                 head_batch_tile: int | None = None):
        """`mesh`: optional multi-chip serving mesh — both trunks' params
        are Megatron-TP sharded over its 'model' axis and the token
        streams constrained to it; one jit program then runs the whole
        pipeline tensor-parallel (latency scale-out).

        `cast=False` keeps every param leaf's dtype exactly as passed
        (used by `load_serving`, whose trees are already in serving dtype
        — possibly a mix of bf16 weights, int8 kernels, and f32 scales).

        `base_token_merge` / `amodal_token_merge`: opt-in ToMe serving
        configs `(after_layer, r)` per trunk (ops/token_merge.py) —
        parity-breaking throughput knobs, same semantics as the bench's
        AMODAL_TOME_* flags. `head_batch_tile`: process the DPT heads in
        lax.map chunks of this batch size (exact; lifts the HBM ceiling
        at batch > 8)."""
        if cast:
            to_dev = lambda t: jax.tree.map(
                lambda a: jnp.asarray(a, dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                else jnp.asarray(a), t)
        else:
            to_dev = lambda t: jax.tree.map(jnp.asarray, t)
        self.params_raw = to_dev(params_raw)
        self.params_amodal = to_dev(params_amodal)
        self.act_sharding = None
        self._batch_sharding = None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import shard_params
            self.params_raw = shard_params(mesh, self.params_raw,
                                           tensor_parallel=True)
            self.params_amodal = shard_params(mesh, self.params_amodal,
                                              tensor_parallel=True)
            self.act_sharding = NamedSharding(
                mesh, P("data", "model", None))
        elif mesh is not None and mesh.shape.get("data", 1) > 1:
            # data-only mesh: pure DP serving — params replicated, the
            # batch sharded over 'data' (throughput scale-out; batch must
            # divide the data-axis size)
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(mesh, P())
            self.params_raw = jax.tree.map(
                lambda a: jax.device_put(a, replicated), self.params_raw)
            self.params_amodal = jax.tree.map(
                lambda a: jax.device_put(a, replicated), self.params_amodal)
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self.raw_cfg, self.amodal_cfg = raw_cfg, amodal_cfg
        self.size = size
        self.attn_impl = attn_impl
        self.dtype = dtype
        self.base_token_merge = base_token_merge
        self.amodal_token_merge = amodal_token_merge
        self.head_batch_tile = head_batch_tile

    def quantize_int8(self, *, base: bool = True, amodal: bool = False,
                      head: bool = False, calibration=None,
                      margin: float = 1.25, dynamic: bool = False,
                      smooth_alpha: float | None = None,
                      families: tuple | None = None,
                      mixed: bool = False,
                      base_layer_mask=None,
                      amodal_layer_mask=None) -> None:
        """Opt-in W8A8 int8 serving for the frozen models (ops/quant.py).

        Without `calibration`: calibration-free LN-bound scales on the
        LN-fed matmuls only. With `calibration=(image, mask)` (same
        conventions as __call__: [H,W(,3)] or batched, image in [0,255]):
        one instrumented forward records per-layer activation maxima and
        ALL FOUR trunk matmul families quantize; `head=True` additionally
        quantizes the DPT-head convs (requires calibration). v5e @1022
        b8 vs 3.11 img/s bf16: trunks 3.505 (p50 318 ms), + heads 3.662
        (p50 301 ms). Trades the <1e-3 reference-parity gate for speed —
        never default.

        `dynamic=True`: full four-family (+head) coverage with RUN-time
        per-tensor activation scales instead of calibration — measured
        3.463 img/s (p50 311 ms) on v5e @1022 b8, ~5% below the
        calibrated path but with ZERO calibration programs (the
        calibrated path costs ~2 extra large compiles, ~65 min through a
        tunneled TPU).

        `smooth_alpha` (calibrated mode only): SmoothQuant outlier
        migration on the data-fed matmuls before quantizing (the knob
        that attacks the calib chain's quality-gate failure).
        `families` restricts which trunk matmul families quantize —
        see ops.quant.FAMILIES (the gate-walk degradation knob).
        `base_layer_mask` / `amodal_layer_mask` ([depth] bool) restrict
        quantization to the selected trunk LAYERS (per-layer lax.cond
        dispatch — the finer gate-walk axis; scripts/int8_layer_walk.py
        finds the best gate-passing subset greedily)."""
        from ..ops.quant import (FAMILIES, calibrate_amodal_dav2,
                                 calibrate_dav2_head,
                                 quantize_diffusion_int8,
                                 quantize_dpt_head_int8,
                                 quantize_vit_trunk_int8)
        if families is None:
            families = FAMILIES
        if smooth_alpha is not None and calibration is None:
            raise ValueError("smooth_alpha requires calibration=(image, "
                             "mask) — it needs per-channel act stats")

        if dynamic:
            if calibration is not None:
                raise ValueError("dynamic=True needs no calibration")
            if mixed or smooth_alpha is not None or \
                    families != FAMILIES:
                # dynamic always covers all four families with run-time
                # scales; silently ignoring these would record gate
                # verdicts for a config that never ran
                raise ValueError("dynamic=True is incompatible with "
                                 "families/smooth_alpha/mixed")

            def q(p, lm):
                p = quantize_vit_trunk_int8(p, dynamic=True, layer_mask=lm)
                if head:
                    p = dict(p)
                    p["depth_head"] = jax.jit(functools.partial(
                        quantize_diffusion_int8,
                        skip_suffixes=("output_conv2/conv2",)))(
                            p["depth_head"])
                return p

            if base:
                self.params_raw = q(self.params_raw, base_layer_mask)
            if amodal:
                self.params_amodal = q(self.params_amodal,
                                       amodal_layer_mask)
            return

        if head and calibration is None:
            raise ValueError("head=True requires calibration=(image, mask)")
        if head and not (base or amodal):
            raise ValueError("head=True quantizes the heads of the models "
                             "selected by base=/amodal= — enable at least one")

        stats_raw = stats_amodal = None
        base_in = amodal_guides = None
        if calibration is not None:
            image, mask = calibration
            img = np.asarray(image, np.float32)
            msk = np.asarray(mask, np.float32)
            if img.ndim == 3:
                img, msk = img[None], msk[None]
            img01 = jnp.asarray(img, self.dtype) / 255.0
            size = (self.size, self.size)
            # jit every calibration forward: eager dispatch through the
            # TPU tunnel costs ~0.8 s/op and these run hundreds of ops
            if base:
                base_in = resize2d(img01, size=size, method="bilinear")
                stats_raw = jax.jit(functools.partial(
                    calibrate_amodal_dav2, cfg=self.raw_cfg,
                    attn_impl=self.attn_impl))(self.params_raw, x=base_in)
            if amodal:
                m = (resize_nearest(jnp.asarray(msk[..., None], self.dtype),
                                    size=size) > 0).astype(self.dtype)
                base_d, _ = amodal_depth_graph(
                    self.params_raw, self.params_amodal,
                    jnp.asarray(img, self.dtype),
                    jnp.asarray(msk[..., None], self.dtype),
                    raw_cfg=self.raw_cfg, amodal_cfg=self.amodal_cfg,
                    size=self.size, attn_impl=self.attn_impl,
                    act_sharding=self.act_sharding)
                amodal_guides = {
                    "guide_mask": m * 2.0 - 1.0,
                    "observation": base_d[..., None] * 2.0 - 1.0,
                }
                stats_amodal = jax.jit(functools.partial(
                    calibrate_amodal_dav2, cfg=self.amodal_cfg,
                    attn_impl=self.attn_impl, **amodal_guides))(
                        self.params_amodal, x=resize_nearest(img01, size=size))
        def _quantize_trunk(p, stats, lm):
            if mixed:
                # LN-bound (outlier-clipping, gate-passing) scales on the
                # LN-fed families; calibrated(+smooth) scales only where
                # no LN bound exists (proj/ffn2)
                if stats is None:
                    raise ValueError("mixed=True requires calibration")
                p = quantize_vit_trunk_int8(
                    p, act_stats=stats, margin=margin,
                    smooth_alpha=smooth_alpha, layer_mask=lm,
                    families=tuple(f for f in ("proj", "ffn2")
                                   if f in families))
                return quantize_vit_trunk_int8(
                    p, layer_mask=lm,
                    families=tuple(f for f in ("qkv", "ffn1")
                                      if f in families))
            return quantize_vit_trunk_int8(
                p, act_stats=stats, margin=margin,
                families=families, smooth_alpha=smooth_alpha,
                layer_mask=lm)

        if base:
            self.params_raw = _quantize_trunk(self.params_raw, stats_raw,
                                              base_layer_mask)
        if amodal:
            self.params_amodal = _quantize_trunk(self.params_amodal,
                                                 stats_amodal,
                                                 amodal_layer_mask)
        if head:
            # head calibration runs on the already-quantized trunks so the
            # recorded ranges match serving conditions (jitted, same reason
            # as above)
            if base:
                hs = jax.jit(functools.partial(
                    calibrate_dav2_head, cfg=self.raw_cfg,
                    attn_impl=self.attn_impl))(self.params_raw, x=base_in)
                pr = dict(self.params_raw)
                pr["depth_head"] = quantize_dpt_head_int8(
                    pr["depth_head"], hs, margin=margin)
                self.params_raw = pr
            if amodal:
                hs = jax.jit(functools.partial(
                    calibrate_dav2_head, cfg=self.amodal_cfg,
                    attn_impl=self.attn_impl, **amodal_guides))(
                        self.params_amodal,
                        x=resize_nearest(img01, size=size))
                pa = dict(self.params_amodal)
                pa["depth_head"] = quantize_dpt_head_int8(
                    pa["depth_head"], hs, margin=margin)
                self.params_amodal = pa

    def save_serving(self, path: str) -> None:
        """Persist the READY-TO-SERVE state (post bf16 cast / int8
        quantization+calibration) so replicas restore bit-identically
        without re-running any optimization (see pipeline/serving_ckpt.py;
        the calibrated int8 path alone costs ~65 min of compiles through
        a tunneled TPU)."""
        import dataclasses

        from .serving_ckpt import save_serving_state
        save_serving_state(path, {
            "raw": self.params_raw, "amodal": self.params_amodal,
        }, {
            "kind": "amodal_dav2",
            "raw_cfg": dataclasses.asdict(self.raw_cfg),
            "amodal_cfg": dataclasses.asdict(self.amodal_cfg),
            "size": self.size,
            "attn_impl": self.attn_impl,
            "dtype": jnp.dtype(self.dtype).name,
            "base_token_merge": list(self.base_token_merge)
            if self.base_token_merge else None,
            "amodal_token_merge": list(self.amodal_token_merge)
            if self.amodal_token_merge else None,
            "head_batch_tile": self.head_batch_tile,
        })

    @classmethod
    def load_serving(cls, path: str, *, mesh=None,
                     attn_impl: str | None = None):
        """Restore a pipeline saved by `save_serving` — param dtypes are
        kept exactly (int8 kernels stay int8; no re-cast, no
        re-calibration). `mesh` with a 'data' axis replicates the restored
        params for DP serving; a 'model' (TP) axis is only supported for
        unquantized saves (the TP sharding rules cover the float trunk
        layout, not the int8 scale leaves)."""
        from .serving_ckpt import cfg_from_dict, restore_serving_state
        trees, meta = restore_serving_state(path, expect_kind="amodal_dav2")
        def _tm(key):
            v = meta.get(key)
            return tuple(int(x) for x in v) if v else None

        tile = meta.get("head_batch_tile")
        return cls(trees["raw"], cfg_from_dict(DAV2Config, meta["raw_cfg"]),
                   trees["amodal"],
                   cfg_from_dict(DAV2Config, meta["amodal_cfg"]),
                   size=int(meta["size"]),
                   attn_impl=attn_impl or meta["attn_impl"],
                   dtype=jnp.dtype(meta["dtype"]), mesh=mesh, cast=False,
                   base_token_merge=_tm("base_token_merge"),
                   amodal_token_merge=_tm("amodal_token_merge"),
                   head_batch_tile=int(tile) if tile else None)

    @classmethod
    def init_random(cls, key, *, encoder: str = "vitt", size: int = 56,
                    attn_impl: str | None = "xla", **kw):
        """Seeded random-weight pipeline (tiny preset by default) — the
        no-checkpoint demo/smoke constructor shared by `cli.serve
        --random`, `examples/quickstart_random.py` and the driver
        dryrun. Outputs are meaningless; every seam is real."""
        import jax

        raw_cfg = DAV2Config(encoder=encoder, guide_type="none", raw=True)
        am_cfg = DAV2Config(encoder=encoder, guide_type="mask+observation")
        k1, k2 = jax.random.split(jax.random.PRNGKey(0) if key is None
                                  else key)
        return cls(
            jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(k1), raw_cfg,
            jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(k2), am_cfg,
            size=size, attn_impl=attn_impl, **kw)

    @classmethod
    def from_checkpoints(cls, base_ckpt: str, amodal_ckpt: str, **kw):
        """base_ckpt: raw DAV2 .pth / .safetensors; amodal_ckpt: HF-style
        model.safetensors (or directory containing it)."""
        from ..convert.torch_to_jax import (convert_dav2, infer_dav2_config,
                                            load_state_dict)
        if os.path.isdir(amodal_ckpt):
            amodal_ckpt = os.path.join(amodal_ckpt, "model.safetensors")
        sd_raw = load_state_dict(base_ckpt)
        cfg_raw = infer_dav2_config(sd_raw, raw=True)
        sd_amodal = load_state_dict(amodal_ckpt)
        cfg_amodal = infer_dav2_config(sd_amodal)
        return cls(convert_dav2(sd_raw, cfg_raw), cfg_raw,
                   convert_dav2(sd_amodal, cfg_amodal), cfg_amodal, **kw)

    def __call__(self, image: np.ndarray, mask: np.ndarray,
                 base_image: np.ndarray | None = None):
        """image: [H,W,3] or [B,H,W,3] uint8/float; mask: [H,W] / [B,H,W].

        `base_image`: optional pre-resized [.,S,S,3] input for the base
        branch (see `amodal_depth_graph`; `infer_single_image` passes the
        cv2-resized uint8 image for reference-exact parity).

        Returns (base_depth, blended_depth) as np arrays in [0,1]."""
        img = np.asarray(image, np.float32)
        msk = np.asarray(mask, np.float32)
        squeeze = img.ndim == 3
        if squeeze:
            img, msk = img[None], msk[None]
            if base_image is not None and base_image.ndim == 3:
                base_image = base_image[None]
        def dev(a):
            a = jnp.asarray(a, self.dtype)
            if self._batch_sharding is not None:
                a = jax.device_put(a, self._batch_sharding)
            return a

        base, blended = amodal_depth_graph(
            self.params_raw, self.params_amodal,
            dev(img), dev(msk[..., None]),
            raw_cfg=self.raw_cfg, amodal_cfg=self.amodal_cfg,
            size=self.size, attn_impl=self.attn_impl,
            act_sharding=self.act_sharding,
            base_token_merge=self.base_token_merge,
            amodal_token_merge=self.amodal_token_merge,
            head_batch_tile=self.head_batch_tile,
            base_image=None if base_image is None else
            dev(np.asarray(base_image, np.float32)))
        base, blended = np.asarray(base, np.float32), np.asarray(blended, np.float32)
        if squeeze:
            base, blended = base[0], blended[0]
        return base, blended

    def infer_raw_depth(self, image_bgr: np.ndarray,
                        input_size: int | None = None) -> np.ndarray:
        """Arbitrary-aspect raw base-depth inference through the
        keep-aspect multiple-of-14 path (reference raw `dpt.py:186-222`):
        returns [h, w] relative depth at the input's own resolution."""
        from .raw_infer import infer_image
        return infer_image(self.params_raw, self.raw_cfg, image_bgr,
                           input_size or self.size,
                           attn_impl=self.attn_impl, dtype=self.dtype)

    def infer_single_image(self, input_image_path: str, input_mask_path: str,
                           output_path: str):
        """Reference-compatible file-in/file-out inference (infer.py:71-121)."""
        import cv2
        from PIL import Image

        from ..utils.image import colorize_depth, highlight_target

        os.makedirs(output_path, exist_ok=True)
        name = os.path.basename(input_image_path).split(".")[0]
        image = cv2.imread(input_image_path)  # BGR, as the reference feeds it
        mask = (np.asarray(Image.open(input_mask_path)) > 0).astype(np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]

        # cv2 uint8 resize on host for the base branch — exact parity with
        # the reference's predict_base_depth (infer.py:17 fixed-point
        # bilinear + uint8 rounding; the in-graph f32 resize differs by
        # quantization the trunk can amplify past the 1e-3 gate)
        base_image = cv2.resize(image, (self.size, self.size))
        base, blended = self(image, mask, base_image=base_image)

        mask518 = np.asarray(
            resize_nearest(jnp.asarray(mask[None, :, :, None]),
                           size=(self.size, self.size)))[0, :, :, 0]
        mask_u8 = (mask518 > 0).astype(np.uint8) * 255
        h, w = image.shape[:2]

        def render(depth, highlight):
            colored = (colorize_depth(depth) * 255).astype(np.uint8)
            if highlight:
                colored = highlight_target(colored, mask_u8)
            colored = cv2.resize(colored, (w, h), interpolation=cv2.INTER_NEAREST)
            return colored[:, :, ::-1]  # match reference BGR->RGB flip

        raw_render = render(base, highlight=False)
        amodal_render = render(blended, highlight=True)
        cv2.imwrite(os.path.join(output_path, f"{name}_raw_depth_rendered.png"),
                    raw_render)
        cv2.imwrite(os.path.join(output_path, f"{name}_amodal_depth_rendered.png"),
                    amodal_render)
        return raw_render, amodal_render
