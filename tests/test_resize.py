"""Parity tests: ops.resize vs torch.nn.functional.interpolate semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from amodal_depth_anything_tpu.ops.resize import resize2d, resize_nearest


def _torch_resize(x_nhwc, **kw):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1))  # NHWC -> NCHW
    out = F.interpolate(t, **kw)
    return np.moveaxis(out.numpy(), 1, -1)


CASES = [
    # (in_hw, kwargs)
    ((37, 37), dict(size=(74, 74), mode="bilinear", align_corners=True)),
    ((19, 19), dict(size=(37, 37), mode="bilinear", align_corners=True)),
    ((10, 14), dict(size=(25, 31), mode="bilinear", align_corners=True)),
    ((148, 148), dict(size=(518, 518), mode="bilinear", align_corners=True)),
    ((10, 14), dict(size=(25, 31), mode="bilinear", align_corners=False)),
    ((25, 31), dict(size=(10, 14), mode="bilinear", align_corners=False)),
    ((25, 31), dict(size=(10, 14), mode="bicubic", align_corners=False)),
    ((14, 14), dict(size=(37, 37), mode="bicubic", align_corners=False)),
    ((9, 9), dict(size=(18, 18), mode="bicubic", align_corners=True)),
    ((12, 12), dict(scale_factor=2.0, mode="bilinear", align_corners=False)),
]


@pytest.mark.parametrize("in_hw,kw", CASES)
def test_matmul_resize_matches_torch(rng, in_hw, kw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(
        resize2d(
            x,
            size=kw.get("size"),
            scale_factor=kw.get("scale_factor"),
            method=kw["mode"],
            align_corners=kw.get("align_corners", False),
        )
    )
    theirs = _torch_resize(x, **kw)
    # f32 rounding-order differences only; parity budget is 1e-3.
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_posembed_scale_factor_bicubic(rng):
    # The DINOv2 pos-embed interpolation path: scale_factor with +0.1 offset
    # (reference dinov2.py:199-230). 37x37 grid from the 518-native checkpoint.
    n = 37
    for target in (32, 40, 74):
        sx = (target + 0.1) / n
        x = rng.standard_normal((1, n, n, 64), dtype=np.float32)
        ours = np.asarray(resize2d(x, scale_factor=(sx, sx), method="bicubic"))
        theirs = _torch_resize(x, scale_factor=(sx, sx), mode="bicubic",
                               align_corners=False)
        assert ours.shape == theirs.shape == (1, target, target, 64)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("exact", [False, True])
def test_nearest(rng, exact):
    x = rng.standard_normal((1, 23, 35, 2), dtype=np.float32)
    mode = "nearest-exact" if exact else "nearest"
    for size in [(518, 518), (11, 17), (23, 35)]:
        ours = np.asarray(resize_nearest(x, size=size, exact=exact))
        theirs = _torch_resize(x, size=size, mode=mode)
        np.testing.assert_array_equal(ours, theirs)


def test_degenerate_single_pixel(rng):
    x = rng.standard_normal((1, 1, 1, 4), dtype=np.float32)
    out = np.asarray(resize2d(x, size=(7, 7), method="bilinear", align_corners=True))
    np.testing.assert_allclose(out, np.broadcast_to(x, (1, 7, 7, 4)), rtol=1e-6)


def test_nearest_integer_upscale_repeat_fast_path(rng):
    """Integer upscales take the broadcast-reshape path; it must equal
    the generic gather indices for both nearest modes."""
    import jax.numpy as jnp

    from amodal_depth_anything_tpu.ops.resize import (_nearest_indices,
                                                      resize_nearest)

    x = rng.random((2, 7, 5, 3)).astype(np.float32)
    for k in (2, 3, 4):
        for exact in (False, True):
            got = np.asarray(resize_nearest(jnp.asarray(x),
                                            size=(7 * k, 5 * k),
                                            exact=exact))
            rows = _nearest_indices(7, 7 * k, None, exact)
            cols = _nearest_indices(5, 5 * k, None, exact)
            want = x[:, rows][:, :, cols]
            np.testing.assert_array_equal(got, want, err_msg=f"k={k}")
    # mixed: one axis integer, one not -> generic path still correct
    got = np.asarray(resize_nearest(jnp.asarray(x), size=(14, 8)))
    rows = _nearest_indices(7, 14, None, False)
    cols = _nearest_indices(5, 8, None, False)
    np.testing.assert_array_equal(got, x[:, rows][:, :, cols])
    # adversarial k where f32(1/k) rounding breaks pure repetition
    # (k=41/47/...): the trace-time check must fall back to the gather
    x2 = rng.random((1, 2, 2, 1)).astype(np.float32)
    for k in (41, 47, 55):
        got = np.asarray(resize_nearest(jnp.asarray(x2), size=(2 * k, 2 * k)))
        rows = _nearest_indices(2, 2 * k, None, False)
        cols = _nearest_indices(2, 2 * k, None, False)
        np.testing.assert_array_equal(got, x2[:, rows][:, :, cols],
                                      err_msg=f"k={k}")
    # explicit non-integral scale_factor never repeats
    got = np.asarray(resize_nearest(jnp.asarray(x2), scale_factor=2.05))
    rows = _nearest_indices(2, 4, 2.05, False)
    cols = _nearest_indices(2, 4, 2.05, False)
    np.testing.assert_array_equal(got, x2[:, rows][:, :, cols])
