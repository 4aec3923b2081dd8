"""Torch-parity image resizing as separable matmuls (TPU/MXU-friendly).

The reference pipeline leans on `torch.nn.functional.interpolate` in many
places (DPT upsampling with ``align_corners=True`` — reference
``depth_anything_v2/dpt.py:194``, ``util/blocks.py:144``; bicubic positional
embedding interpolation with a ``scale_factor`` and 0.1 offset —
``dinov2.py:199-230``; nearest resizes in the trainers and ``infer.py:21``).
There is no stock JAX op with torch's exact semantics, and weight-transplanted
checkpoints only reproduce reference outputs if interpolation matches bit-for-
bit at the index/weight level.

TPU-native design: interpolation along one axis is a linear map, so a 2-D
resize is ``W_h @ img @ W_w^T`` — two dense matmuls that XLA tiles onto the
MXU. Weight matrices are built in numpy at trace time (all shapes static under
jit) and become constants in the compiled program. Nearest-neighbor resizes
use gathers instead (no arithmetic needed).

Everything here operates on NHWC (or ...HWC) arrays, the native TPU layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize2d", "resize_nearest", "interpolate"]


def _output_size(in_size: int, size, scale_factor) -> int:
    if size is not None:
        return int(size)
    # torch: output size = floor(input * scale_factor)
    return int(np.floor(in_size * scale_factor))


def _axis_scale(in_size: int, out_size: int, scale_factor) -> float:
    """The `scale` used by torch's source-index computation.

    When the user passed an explicit scale_factor, torch uses 1/scale_factor;
    otherwise in/out. (aten `area_pixel_compute_scale`.)
    """
    if scale_factor is not None:
        return 1.0 / float(scale_factor)
    return in_size / out_size


def _source_index(out_size: int, in_size: int, scale: float, *, align_corners: bool,
                  cubic: bool) -> np.ndarray:
    d = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size <= 1:
            return np.zeros(out_size, dtype=np.float64)
        return d * ((in_size - 1) / (out_size - 1))
    src = (d + 0.5) * scale - 0.5
    if not cubic:
        # torch clamps negative source indices to 0 for linear modes only
        src = np.maximum(src, 0.0)
    return src


def _cubic_coeffs(t: np.ndarray, a: float = -0.75):
    """Keys cubic convolution coefficients for 4 taps, torch's A=-0.75."""
    def k1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return np.stack([k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t)], axis=-1)


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, scale_key, method: str,
                   align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix with torch semantics."""
    scale = _axis_scale(in_size, out_size, scale_key)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bilinear":
        src = _source_index(out_size, in_size, scale, align_corners=align_corners,
                            cubic=False)
        i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        t = src - i0
        rows = np.arange(out_size)
        np.add.at(mat, (rows, i0), 1.0 - t)
        np.add.at(mat, (rows, i1), t)
    elif method == "bicubic":
        src = _source_index(out_size, in_size, scale, align_corners=align_corners,
                            cubic=True)
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        coeffs = _cubic_coeffs(t)  # [out, 4]
        rows = np.arange(out_size)
        for tap in range(4):
            idx = np.clip(i0 - 1 + tap, 0, in_size - 1)
            np.add.at(mat, (rows, idx), coeffs[:, tap])
    else:
        raise ValueError(f"unsupported method for matrix interp: {method}")
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int, scale_key, exact: bool) -> np.ndarray:
    # torch computes nearest indices in float32 (aten
    # `nearest_neighbor_compute_source_index`); float64 here would flip
    # floor() at exact-integer boundaries (e.g. 222*35/518 == 15).
    scale = np.float32(_axis_scale(in_size, out_size, scale_key))
    d = np.arange(out_size, dtype=np.float32)
    if exact:
        idx = np.floor((d + np.float32(0.5)) * scale)
    else:
        idx = np.floor(d * scale)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def resize_nearest(x: jax.Array, size=None, scale_factor=None, *,
                   exact: bool = False) -> jax.Array:
    """Nearest-neighbor resize on the (-3, -2) spatial axes of an ...HWC array.

    ``exact=False`` matches torch mode="nearest"; ``exact=True`` matches
    "nearest-exact" (used by the reference dataloader's Resize with
    NEAREST_EXACT, ``base_depth_dataset.py:231-236``).
    """
    hi, wi = x.shape[-3], x.shape[-2]
    sh, sw = _split2(scale_factor)
    oh_, ow_ = _split2(size)
    ho = _output_size(hi, oh_, sh)
    wo = _output_size(wi, ow_, sw)
    if (ho, wo) == (hi, wi):
        return x
    rows_np = _nearest_indices(hi, ho, sh, exact)
    cols_np = _nearest_indices(wi, wo, sw, exact)
    # Integer-upscale fast path: when torch's f32 index arithmetic
    # ACTUALLY reduces to k-fold pixel repetition (checked exactly at
    # trace time — it usually does, but f32(1/k) rounding flips a floor
    # for k in {41, 47, 55, 61, ...}, and explicit non-integral
    # scale_factors are not repetition at all), jnp.repeat lowers to
    # broadcast+reshape — bandwidth-optimal where the gather pair is not
    # (the VAE decoder's 2x upsamplers at 512px are on the serving path).
    if ho % hi == 0 and wo % wi == 0:
        kh, kw = ho // hi, wo // wi
        if (rows_np == np.arange(ho) // kh).all() and \
                (cols_np == np.arange(wo) // kw).all():
            if kh > 1:
                x = jnp.repeat(x, kh, axis=-3)
            if kw > 1:
                x = jnp.repeat(x, kw, axis=-2)
            return x
    rows = jnp.asarray(rows_np)
    cols = jnp.asarray(cols_np)
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def _split2(v):
    if v is None:
        return None, None
    if isinstance(v, (tuple, list)):
        return v[0], v[1]
    return v, v


def resize2d(x: jax.Array, size=None, scale_factor=None, *,
             method: str = "bilinear", align_corners: bool = False) -> jax.Array:
    """Resize the (-3, -2) spatial axes of an ``...HWC`` array.

    Exact torch `F.interpolate` semantics (same source-index formulas, cubic
    A=-0.75, scale_factor-vs-size scale selection, negative-index clamping).
    Linear/cubic modes lower to two MXU matmuls; nearest lowers to gathers.
    """
    if method in ("nearest", "nearest-exact"):
        return resize_nearest(x, size, scale_factor, exact=(method == "nearest-exact"))
    if method not in ("bilinear", "bicubic"):
        raise ValueError(f"unknown resize method: {method}")

    hi, wi = x.shape[-3], x.shape[-2]
    sh, sw = _split2(scale_factor)
    oh_, ow_ = _split2(size)
    ho = _output_size(hi, oh_, sh)
    wo = _output_size(wi, ow_, sw)
    if (ho, wo) == (hi, wi) and sh is None and sw is None:
        return x  # scale==1 on both axes -> identity map

    wh = jnp.asarray(_interp_matrix(hi, ho, sh, method, align_corners))
    ww = jnp.asarray(_interp_matrix(wi, wo, sw, method, align_corners))
    # [...,H,W,C]: contract H then W — two MXU dots.
    # f32 inputs: HIGHEST precision keeps true f32 accumulation on TPU
    # (default bf16 passes would break the <1e-3 depth-parity budget).
    # bf16 inputs opted into the fast path: single bf16 pass with f32
    # accumulation (~6x cheaper; interpolation weights lose <0.4% rel).
    if x.dtype == jnp.bfloat16:
        y = jnp.einsum("oh,...hwc->...owc", wh.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,...hwc->...hpc", ww.astype(jnp.bfloat16),
                       y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    prec = jax.lax.Precision.HIGHEST
    xf = jnp.einsum("oh,...hwc->...owc", wh, xf, precision=prec)
    xf = jnp.einsum("pw,...hwc->...hpc", ww, xf, precision=prec)
    return xf.astype(orig_dtype)


def interpolate(x: jax.Array, size=None, scale_factor=None, mode: str = "nearest",
                align_corners: bool = False) -> jax.Array:
    """`torch.nn.functional.interpolate`-shaped convenience wrapper (NHWC)."""
    return resize2d(x, size=size, scale_factor=scale_factor, method=mode,
                    align_corners=align_corners)
