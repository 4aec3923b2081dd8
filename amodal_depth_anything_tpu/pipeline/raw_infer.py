"""Keep-aspect multiple-of-14 preprocessing + raw `infer_image` helper.

Parity port of the reference transform utils
(`depth_anything_v2/util/transform.py:5-157`: `Resize` with
keep_aspect_ratio / ensure_multiple_of / lower_bound|upper_bound|minimal,
`NormalizeImage`, `PrepareForNet`) and the raw model's arbitrary-aspect
inference path (`depth_anything_v2_raw/dpt.py:186-222`:
cv2 INTER_CUBIC keep-aspect resize to >=518 multiple-of-14, forward,
bilinear align_corners=True upsample back to the input size).

The size arithmetic and the cv2 resizes run on host (exactly the
reference's library calls); the model forward + the align_corners=True
upsample are one jit program per (H', W') bucket. Our raw model
normalizes ImageNet-style inside the graph (`apply_raw_dav2`), so the
host side stops at [0,1] RGB.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["constrain_to_multiple_of", "keep_aspect_size",
           "image2tensor_np", "infer_image"]


def constrain_to_multiple_of(x: float, multiple_of: int, *, min_val: int = 0,
                             max_val: int | None = None) -> int:
    """Reference `Resize.constrain_to_multiple_of` (transform.py:51-60):
    round to the nearest multiple; floor if that overshoots max_val;
    ceil if below min_val."""
    y = int(round(x / multiple_of) * multiple_of)
    if max_val is not None and y > max_val:
        y = int(math.floor(x / multiple_of) * multiple_of)
    if y < min_val:
        y = int(math.ceil(x / multiple_of) * multiple_of)
    return y


def keep_aspect_size(height: int, width: int, *, target_height: int,
                     target_width: int, multiple_of: int = 1,
                     keep_aspect_ratio: bool = True,
                     method: str = "lower_bound") -> tuple[int, int]:
    """Output (new_height, new_width) of the reference `Resize.get_size`
    (transform.py:62-108)."""
    scale_height = target_height / height
    scale_width = target_width / width

    if keep_aspect_ratio:
        if method == "lower_bound":
            # scale such that output size is a lower bound
            if scale_width > scale_height:
                scale_height = scale_width
            else:
                scale_width = scale_height
        elif method == "upper_bound":
            if scale_width < scale_height:
                scale_height = scale_width
            else:
                scale_width = scale_height
        elif method == "minimal":
            if abs(1 - scale_width) < abs(1 - scale_height):
                scale_height = scale_width
            else:
                scale_width = scale_height
        else:
            raise ValueError(f"resize_method {method} not implemented")

    if method == "lower_bound":
        new_height = constrain_to_multiple_of(scale_height * height,
                                              multiple_of,
                                              min_val=target_height)
        new_width = constrain_to_multiple_of(scale_width * width,
                                             multiple_of,
                                             min_val=target_width)
    elif method == "upper_bound":
        new_height = constrain_to_multiple_of(scale_height * height,
                                              multiple_of,
                                              max_val=target_height)
        new_width = constrain_to_multiple_of(scale_width * width,
                                             multiple_of,
                                             max_val=target_width)
    elif method == "minimal":
        new_height = constrain_to_multiple_of(scale_height * height,
                                              multiple_of)
        new_width = constrain_to_multiple_of(scale_width * width,
                                             multiple_of)
    else:
        raise ValueError(f"resize_method {method} not implemented")
    return new_height, new_width


def image2tensor_np(raw_image_bgr: np.ndarray, input_size: int = 518):
    """Reference `image2tensor` (raw dpt.py:196-221) up to (not
    including) the ImageNet normalization our model applies in-graph:
    BGR -> RGB, /255, keep-aspect lower-bound multiple-of-14 resize with
    cv2 INTER_CUBIC. Returns ([1, H', W', 3] float32 in [0,1], (h, w))."""
    import cv2

    h, w = raw_image_bgr.shape[:2]
    image = cv2.cvtColor(raw_image_bgr, cv2.COLOR_BGR2RGB) / 255.0
    nh, nw = keep_aspect_size(h, w, target_height=input_size,
                              target_width=input_size, multiple_of=14,
                              method="lower_bound")
    image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_CUBIC)
    return np.ascontiguousarray(image, np.float32)[None], (h, w)


import functools


@functools.lru_cache(maxsize=32)
def _infer_image_jit(cfg, out_hw: tuple[int, int], attn_impl, dtype):
    """One cached jit program per (cfg, output size, impl, dtype) bucket —
    repeated same-shape calls must NOT re-trace (compiles cost minutes on
    this box)."""
    from ..models.amodal_dav2 import apply_raw_dav2
    from ..ops.resize import resize2d

    @jax.jit
    def run(params, x):
        depth = apply_raw_dav2(params, cfg, x.astype(dtype),
                               attn_impl=attn_impl)
        depth = resize2d(depth[..., None].astype(jnp.float32), size=out_hw,
                         method="bilinear", align_corners=True)
        return depth[0, :, :, 0]

    return run


def infer_image(params, cfg, raw_image_bgr: np.ndarray,
                input_size: int = 518, *, attn_impl: str | None = None,
                dtype=jnp.float32) -> np.ndarray:
    """Arbitrary-aspect raw depth inference (raw dpt.py:186-194):
    keep-aspect preprocess, raw forward, bilinear align_corners=True
    upsample back to the input's (h, w). Returns [h, w] float32.

    One jit program per ((H', W'), (h, w)) shape bucket — same recompile
    behavior the reference's dynamic shapes imply for XLA."""
    x, (h, w) = image2tensor_np(raw_image_bgr, input_size)
    run = _infer_image_jit(cfg, (h, w), attn_impl, jnp.dtype(dtype))
    return np.asarray(run(params, jnp.asarray(x)))
