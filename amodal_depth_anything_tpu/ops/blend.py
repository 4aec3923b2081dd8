"""Depth stitching / blending ops (jit-fused).

TPU-native equivalent of the reference's host-side blend
(`infer.py:30-44`): paste the amodal prediction into the base depth under
the mask, then smooth the mask border with a 3x3 box filter. The
reference does this with a CUDA dilate conv + cv2.blur on CPU; here the
whole thing is one fused XLA graph — dilation and box blur are tiny
depthwise convs, border selection is elementwise.

cv2.blur's default border mode is BORDER_REFLECT_101, which is exactly
`jnp.pad(..., mode='reflect')`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["box_blur", "median_filter_blend"]


def box_blur(x: jax.Array, width: int = 3) -> jax.Array:
    """Box filter over (-3,-2) of ...HWC with REFLECT_101 borders."""
    pad = width // 2
    pads = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    xp = jnp.pad(x, pads, mode="reflect")
    c = x.shape[-1]
    kernel = jnp.ones((width, width, 1, 1), x.dtype) / (width * width)
    kernel = jnp.broadcast_to(kernel, (width, width, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def median_filter_blend(depth_amodal: jax.Array, depth_base: jax.Array,
                        mask: jax.Array, *, filter_width: int = 3) -> jax.Array:
    """Composite amodal depth into base depth with border smoothing.

    All [B, H, W, 1]; mask is {0,1}. Matches reference `infer.py:30-44`:
      blended[mask>0] = amodal; border = 0 < dilate(mask) < w^2;
      blended[border] = boxblur(blended)[border].
    """
    mask = (mask > 0).astype(depth_base.dtype)
    blended = jnp.where(mask > 0, depth_amodal, depth_base)
    ones = jnp.ones((filter_width, filter_width, 1, 1), depth_base.dtype)
    dilated = jax.lax.conv_general_dilated(
        mask, ones, (1, 1),
        [(filter_width // 2,) * 2, (filter_width // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    border = (dilated > 0) & (dilated < filter_width ** 2)
    smoothed = box_blur(blended, filter_width)
    return jnp.where(border, smoothed, blended)
