"""Zero-shot eval dataset loaders: per-format depth decoding, validity
masks, and registry dispatch — the reference ships these split files but
cannot load them (its registry is empty, src/dataset/__init__.py:8)."""

import os

import numpy as np
import pytest
from PIL import Image

from amodal_depth_anything_tpu.data import DatasetMode, get_dataset


def _write_rgb(path, hw=(8, 10)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((*hw, 3), 128, np.uint8)).save(path)


def _write_u16(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _cfg(name, filenames, **kw):
    return {"name": name, "dir": name, "filenames": filenames, **kw}


def test_nyu_decode_and_filled(tmp_path):
    root = str(tmp_path)
    d = os.path.join(root, "nyu")
    _write_rgb(os.path.join(d, "rgb_0001.png"))
    depth_mm = np.zeros((8, 10), np.uint16)
    depth_mm[2, 3] = 2500  # 2.5 m
    _write_u16(os.path.join(d, "depth_0001.png"), depth_mm)
    filled = depth_mm.copy()
    filled[0, 0] = 1000
    _write_u16(os.path.join(d, "filled_0001.png"), filled)
    lst = os.path.join(root, "nyu.txt")
    with open(lst, "w") as f:
        f.write("rgb_0001.png depth_0001.png filled_0001.png\n")

    ds = get_dataset(_cfg("nyu_v2", lst, dir="nyu"), root, DatasetMode.EVAL)
    s = ds[0]
    assert s["depth_raw_linear"][2, 3, 0] == pytest.approx(2.5)
    assert s["depth_filled_linear"][0, 0, 0] == pytest.approx(1.0)
    # valid: inside (1e-3, 10); zeros invalid
    assert s["valid_mask_raw"][2, 3, 0] and not s["valid_mask_raw"][0, 1, 0]


def test_kitti_decode_ignores_focal_column(tmp_path):
    root = str(tmp_path)
    d = os.path.join(root, "kitti")
    _write_rgb(os.path.join(d, "img.png"))
    depth = np.zeros((8, 10), np.uint16)
    depth[1, 1] = 256 * 42  # 42 m
    _write_u16(os.path.join(d, "gt.png"), depth)
    lst = os.path.join(root, "kitti.txt")
    with open(lst, "w") as f:
        f.write("img.png gt.png 721.5377\n")  # trailing focal length
    ds = get_dataset(_cfg("kitti", lst), root, DatasetMode.EVAL)
    s = ds[0]
    assert s["depth_raw_linear"][1, 1, 0] == pytest.approx(42.0)
    assert s["valid_mask_raw"].sum() == 1


def test_eth3d_raw_float_blob_with_inf(tmp_path, monkeypatch):
    from amodal_depth_anything_tpu.data.zero_shot_datasets import ETH3DDataset
    monkeypatch.setattr(ETH3DDataset, "HEIGHT", 4)
    monkeypatch.setattr(ETH3DDataset, "WIDTH", 6)
    root = str(tmp_path)
    d = os.path.join(root, "eth3d")
    _write_rgb(os.path.join(d, "rgb.png"), hw=(4, 6))
    depth = np.full((4, 6), np.inf, np.float32)
    depth[1, 2] = 3.25
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "depth.bin"), "wb") as f:
        f.write(depth.tobytes())
    lst = os.path.join(root, "eth3d.txt")
    with open(lst, "w") as f:
        f.write("rgb.png depth.bin\n")
    ds = get_dataset(_cfg("eth3d", lst), root, DatasetMode.EVAL)
    s = ds[0]
    assert s["depth_raw_linear"][1, 2, 0] == pytest.approx(3.25)
    assert s["valid_mask_raw"].sum() == 1  # inf rows invalid


def test_diode_npy_with_mask(tmp_path):
    root = str(tmp_path)
    d = os.path.join(root, "diode")
    _write_rgb(os.path.join(d, "a.png"))
    depth = np.full((8, 10, 1), 5.0, np.float32)
    np.save(os.path.join(d, "a_depth.npy"), depth)
    mask = np.zeros((8, 10), np.float32)
    mask[4, 4] = 1.0
    np.save(os.path.join(d, "a_mask.npy"), mask)
    lst = os.path.join(root, "diode.txt")
    with open(lst, "w") as f:
        f.write("a.png a_depth.npy a_mask.npy\n")
    ds = get_dataset(_cfg("diode", lst), root, DatasetMode.EVAL)
    s = ds[0]
    assert s["depth_raw_linear"][4, 4, 0] == pytest.approx(5.0)
    # all depths in range, but the sensor mask keeps one pixel
    assert s["valid_mask_raw"].sum() == 1


@pytest.mark.parametrize("name,scale,meters", [
    ("scannet", 1000.0, 4.2), ("hypersim", 1000.0, 7.0)])
def test_mm_png_datasets(tmp_path, name, scale, meters):
    root = str(tmp_path)
    d = os.path.join(root, name)
    _write_rgb(os.path.join(d, "rgb_0.png"))
    depth = np.zeros((8, 10), np.uint16)
    depth[3, 3] = int(meters * scale)
    _write_u16(os.path.join(d, "d_0.png"), depth)
    lst = os.path.join(root, f"{name}.txt")
    with open(lst, "w") as f:
        f.write("rgb_0.png d_0.png\n")
    ds = get_dataset(_cfg(name, lst), root, DatasetMode.EVAL)
    assert ds[0]["depth_raw_linear"][3, 3, 0] == pytest.approx(meters)


def test_vkitti_centimeters_clipped(tmp_path):
    root = str(tmp_path)
    d = os.path.join(root, "vkitti")
    _write_rgb(os.path.join(d, "rgb.jpg"))
    depth_cm = np.zeros((8, 10), np.uint16)
    depth_cm[0, 0] = 65535  # far plane: 655 m -> clipped to 80
    depth_cm[5, 5] = 1234   # 12.34 m
    _write_u16(os.path.join(d, "d.png"), depth_cm)
    lst = os.path.join(root, "vkitti.txt")
    with open(lst, "w") as f:
        f.write("rgb.jpg d.png\n")
    ds = get_dataset(_cfg("vkitti", lst), root, DatasetMode.EVAL)
    s = ds[0]
    assert s["depth_raw_linear"][5, 5, 0] == pytest.approx(12.34)
    assert s["depth_raw_linear"][0, 0, 0] == pytest.approx(80.0)
    assert not s["valid_mask_raw"][0, 0, 0]  # clipped-to-max is invalid


def test_zero_shot_eval_cli(tmp_path):
    """End-to-end: synthetic NYU tree + torch ckpt -> aligned metric suite."""
    import torch

    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config
    from amodal_depth_anything_tpu.scripts import zero_shot_eval
    from tests.test_models import _fake_torch_sd

    root = str(tmp_path)
    d = os.path.join(root, "data")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        os.makedirs(d, exist_ok=True)
        Image.fromarray((rng.random((64, 80, 3)) * 255).astype(np.uint8)
                        ).save(os.path.join(d, f"rgb_{i:04d}.png"))
        _write_u16(os.path.join(d, f"depth_{i:04d}.png"),
                   (rng.random((64, 80)) * 8000 + 500).astype(np.uint16))
        lines.append(f"rgb_{i:04d}.png depth_{i:04d}.png depth_{i:04d}.png")
    lst = os.path.join(root, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(lines))

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    sd, _ = _fake_torch_sd(raw_cfg, seed=3)
    ck = os.path.join(root, "base.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ck)

    out = os.path.join(root, "eval.txt")
    res = zero_shot_eval.main([
        "--dataset", "nyu_v2", "--base_data_dir", d, "--filenames", lst,
        "--checkpoint", ck, "--encoder", "vitt", "--size", "56",
        "--output_file", out])
    assert np.isfinite(res["abs_relative_difference"])
    assert 0.0 <= res["delta1_acc"] <= 1.0
    assert os.path.exists(out)


def test_reference_split_files_parse():
    """The shipped split files parse into (rgb, depth[, extra]) rows."""
    cases = [
        ("/root/reference/data_split/kitti/eigen_val_from_train_sub_100.txt", 3),
        ("/root/reference/data_split/eth3d/eth3d_filename_list.txt", 2),
        ("/root/reference/data_split/diode/diode_val_all_filename_list.txt", 3),
        ("/root/reference/data_split/scannet/scannet_val_sampled_list_800_1.txt", 2),
        ("/root/reference/data_split/hypersim/amodal_val.txt", 2),
        ("/root/reference/data_split/nyu/labeled/filename_list_test.txt", 3),
    ]
    for path, ncols in cases:
        if not os.path.exists(path):
            pytest.skip("reference splits not mounted")
        with open(path) as f:
            rows = [ln.split() for ln in f if ln.strip()]
        assert rows and all(len(r) == ncols for r in rows[:50]), path
