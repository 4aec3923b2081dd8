"""Native C++ preprocessing kernels: build, exact index parity vs numpy."""

import numpy as np
import pytest

from amodal_depth_anything_tpu import native
from amodal_depth_anything_tpu.ops.resize import _nearest_indices


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def _np_nearest(img, hw):
    rows = _nearest_indices(img.shape[0], hw[0], None, True)
    cols = _nearest_indices(img.shape[1], hw[1], None, True)
    return img[rows][:, cols]


def test_resize_u8_matches_numpy(lib_ok, rng):
    img = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    for hw in [(64, 64), (17, 23), (37, 53)]:
        ours = native.resize_u8_to_f32(img, hw, scale=1.0 / 255.0)
        ref = _np_nearest(img, hw).astype(np.float32) / 255.0
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_resize_u16_matches_numpy(lib_ok, rng):
    img = (rng.random((41, 29)) * 65535).astype(np.uint16)
    ours = native.resize_u16_to_f32(img, (64, 64))
    ref = _np_nearest(img, (64, 64)).astype(np.float32) / 65535.0
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_resize_f32_matches_numpy(lib_ok, rng):
    img = rng.random((31, 47, 4)).astype(np.float32)
    ours = native.resize_f32(img, (20, 24))
    np.testing.assert_array_equal(ours, _np_nearest(img, (20, 24)))
    # 2-D variant
    img2 = rng.random((31, 47)).astype(np.float32)
    ours2 = native.resize_f32(img2, (64, 64))
    np.testing.assert_array_equal(ours2, _np_nearest(img2, (64, 64)))


def test_dataset_uses_native_path(lib_ok, rng):
    from amodal_depth_anything_tpu.data.base_depth_dataset import \
        resize_nearest_exact_np
    img = rng.random((33, 44, 3)).astype(np.float32)
    np.testing.assert_array_equal(resize_nearest_exact_np(img, (56, 56)),
                                  _np_nearest(img, (56, 56)))


def test_native_imagecodec_pil_parity(tmp_path, rng):
    """Native libpng/libjpeg decode must be byte-identical to PIL for
    every format the datasets read (u8 gray/RGB/RGBA, u16 depth, JPEG)."""
    import io

    import pytest
    from PIL import Image

    from amodal_depth_anything_tpu.native import imagecodec

    if not imagecodec.available():
        pytest.skip("native imagecodec unavailable")

    cases = {
        "u8_gray": Image.fromarray((rng.random((20, 30)) * 255).astype(np.uint8)),
        "u8_rgb": Image.fromarray((rng.random((20, 30, 3)) * 255).astype(np.uint8)),
        "u8_rgba": Image.fromarray((rng.random((20, 30, 4)) * 255).astype(np.uint8)),
        "u16_gray": Image.fromarray((rng.random((20, 30)) * 65535).astype(np.uint16)),
    }
    for name, im in cases.items():
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        data = buf.getvalue()
        native = imagecodec.decode(data)
        pil = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(native, pil, err_msg=name)
        assert native.dtype == pil.dtype, name

    # JPEG (both stacks use libjpeg62 with default IDCT -> bit-exact)
    buf = io.BytesIO()
    cases["u8_rgb"].save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    native = imagecodec.decode(data)
    pil = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(native, pil, err_msg="jpeg")


def test_dataset_read_image_uses_native_path(tmp_path, rng):
    from PIL import Image

    from amodal_depth_anything_tpu.data.base_depth_dataset import (
        BaseDepthDataset, DatasetMode, DepthFileNameMode)
    from amodal_depth_anything_tpu.native import imagecodec

    d16 = (rng.random((12, 14)) * 65535).astype(np.uint16)
    Image.fromarray(d16).save(tmp_path / "x_depth.png")
    (tmp_path / "list.txt").write_text("x_depth.png x_depth.png\n")

    ds = BaseDepthDataset(mode=DatasetMode.EVAL,
                          filename_ls_path=str(tmp_path / "list.txt"),
                          dataset_dir=str(tmp_path),
                          name_mode=DepthFileNameMode.id,
                          min_depth=0, max_depth=1, has_filled_depth=False)
    got = ds._read_image("x_depth.png")
    np.testing.assert_array_equal(got, d16)
    assert got.dtype == np.uint16
    if imagecodec.available():
        assert imagecodec.decode(open(tmp_path / "x_depth.png", "rb").read()) is not None


def _write_adam7_png(gray: np.ndarray) -> bytes:
    """Minimal Adam7-interlaced 8-bit grayscale PNG writer (Pillow can't
    write interlaced files, but the wild is full of them)."""
    import struct
    import zlib

    h, w = gray.shape
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = gray[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter: none
            raw.extend(row.tobytes())

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload +
                struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_native_decodes_interlaced_png(rng):
    """Adam7 PNGs must decode correctly (regression: per-row reads without
    interlace handling returned pass-1 reduced rows as full rows)."""
    import io

    import pytest
    from PIL import Image

    from amodal_depth_anything_tpu.native import imagecodec

    if not imagecodec.available():
        pytest.skip("native imagecodec unavailable")

    gray = (rng.random((16, 16)) * 255).astype(np.uint8)
    data = _write_adam7_png(gray)
    pil = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil, gray)  # writer sanity
    native = imagecodec.decode(data)
    np.testing.assert_array_equal(native, gray)


def test_native_rejects_palette_sub8bit_trns_png(rng):
    """Palette, sub-8-bit, and tRNS PNGs decode differently under PIL's
    np.asarray (index map / bool / no synthesized alpha) than under the
    libpng canonical transforms -> native path must refuse them so every
    environment (with or without the .so) sees identical shapes/dtypes."""
    import io
    import struct
    import zlib

    import pytest
    from PIL import Image

    from amodal_depth_anything_tpu.native import imagecodec

    if not imagecodec.available():
        pytest.skip("native imagecodec unavailable")

    # palette PNG (PIL mode P -> np.asarray returns the [H,W] index map)
    im = Image.fromarray((rng.random((8, 8, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    im.convert("P", palette=Image.ADAPTIVE).save(buf, format="PNG")
    assert imagecodec.decode(buf.getvalue()) is None

    # 1-bit PNG (PIL mode 1 -> bool array)
    buf = io.BytesIO()
    im.convert("1").save(buf, format="PNG")
    assert imagecodec.decode(buf.getvalue()) is None

    # grayscale PNG with a tRNS chunk (PIL keeps [H,W]; libpng would
    # synthesize an alpha channel)
    gray = (rng.random((8, 8)) * 254).astype(np.uint8)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload +
                struct.pack(">I", zlib.crc32(tag + payload)))

    raw = bytearray()
    for row in gray:
        raw.append(0)
        raw.extend(row.tobytes())
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"tRNS", struct.pack(">H", 255)) +
            chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    pil = np.asarray(Image.open(io.BytesIO(data)))
    assert pil.shape == (8, 8)  # PIL: no alpha synthesis
    assert imagecodec.decode(data) is None


def test_native_rejects_cmyk_jpeg(rng):
    """4-component (CMYK) JPEGs need PIL's color handling -> native path
    must refuse them so the fallback produces correct RGB."""
    import io

    import pytest
    from PIL import Image

    from amodal_depth_anything_tpu.native import imagecodec

    if not imagecodec.available():
        pytest.skip("native imagecodec unavailable")

    im = Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    im.convert("CMYK").save(buf, format="JPEG")
    assert imagecodec.decode(buf.getvalue()) is None
