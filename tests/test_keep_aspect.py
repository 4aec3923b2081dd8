"""Keep-aspect multiple-of-14 Resize + raw infer_image parity.

Goldens execute the reference's OWN `Resize`/`NormalizeImage` transform
classes (`depth_anything_v2/util/transform.py`) on identical inputs and
require exact agreement — size arithmetic AND pixels (both stacks call
the same cv2)."""

import pathlib
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from amodal_depth_anything_tpu.pipeline import (image2tensor_np,
                                                infer_image,
                                                keep_aspect_size)

REFERENCE = pathlib.Path(
    "/root/reference/src/models/amodalsynthdrive/depth_anything_v2/util")

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not present")


def _ref_resize(**kw):
    sys.path.insert(0, str(REFERENCE))
    try:
        import transform as ref_transform
    finally:
        sys.path.pop(0)
    return ref_transform.Resize(**kw)


@pytest.mark.parametrize("method", ["lower_bound", "upper_bound", "minimal"])
def test_get_size_matches_reference(method, rng):
    import cv2

    ref = _ref_resize(width=518, height=518, keep_aspect_ratio=True,
                      ensure_multiple_of=14, resize_method=method,
                      image_interpolation_method=cv2.INTER_CUBIC)
    # odd rectangular shapes, both orientations, tiny and large
    for h, w in [(37, 91), (91, 37), (480, 640), (640, 480), (1, 7),
                 (517, 519), (518, 518), (1023, 311), (14, 1400)]:
        want_w, want_h = ref.get_size(w, h)
        got_h, got_w = keep_aspect_size(h, w, target_height=518,
                                        target_width=518, multiple_of=14,
                                        method=method)
        assert (got_h, got_w) == (int(want_h), int(want_w)), (h, w, method)
        if method == "lower_bound":
            assert got_h >= 518 and got_w >= 518
            assert got_h % 14 == 0 and got_w % 14 == 0


def test_image2tensor_matches_reference_transform(rng):
    """Full preprocessing chain (BGR->RGB, /255, keep-aspect INTER_CUBIC
    resize, ImageNet normalize) vs the reference Compose — exact."""
    import cv2

    sys.path.insert(0, str(REFERENCE))
    try:
        import transform as ref_transform
    finally:
        sys.path.pop(0)

    raw_bgr = (rng.random((67, 45, 3)) * 255).astype(np.uint8)

    # reference image2tensor chain (raw dpt.py:196-217)
    ref_pipeline = [
        ref_transform.Resize(width=56, height=56, resize_target=False,
                             keep_aspect_ratio=True, ensure_multiple_of=14,
                             resize_method="lower_bound",
                             image_interpolation_method=cv2.INTER_CUBIC),
        ref_transform.NormalizeImage(mean=[0.485, 0.456, 0.406],
                                     std=[0.229, 0.224, 0.225]),
        ref_transform.PrepareForNet(),
    ]
    sample = {"image": cv2.cvtColor(raw_bgr, cv2.COLOR_BGR2RGB) / 255.0}
    for t in ref_pipeline:
        sample = t(sample)
    want = sample["image"]  # [3, H', W'] normalized

    got01, (h, w) = image2tensor_np(raw_bgr, input_size=56)
    assert (h, w) == (67, 45)
    # our model normalizes in-graph; apply the same normalization here
    from amodal_depth_anything_tpu.models.amodal_dav2 import _normalize
    got = np.asarray(_normalize(jnp.asarray(got01)))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_infer_image_arbitrary_aspect(rng):
    """Raw infer_image helper: keep-aspect forward + align_corners=True
    bilinear upsample back to the input size (raw dpt.py:186-194)."""
    import jax

    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)

    cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    params = jax.jit(lambda k: init_amodal_dav2(k, cfg))(
        jax.random.PRNGKey(0))
    raw_bgr = (rng.random((41, 67, 3)) * 255).astype(np.uint8)
    depth = infer_image(params, cfg, raw_bgr, input_size=28,
                        attn_impl="xla")
    assert depth.shape == (41, 67)
    assert np.isfinite(depth).all()
    assert (depth >= 0).all()  # raw head is ReLU
