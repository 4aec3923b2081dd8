"""End-to-end infer CLI on the reference's real asset files: synthetic
torch checkpoints -> converter -> fused pipeline -> rendered PNGs.

Exercises the full load path (torch .pth + HF-style model.safetensors),
the BGR/nearest preprocessing contract, and mixed image/mask resolutions
(case1.jpg is 768x576, its mask 256x256 uint16)."""

import os

import numpy as np
import pytest

ASSET_IMG = "/root/reference/assets/inference_examples/case1.jpg"
ASSET_MASK = "/root/reference/assets/inference_masks/case1_mask.png"


@pytest.mark.skipif(not os.path.exists(ASSET_IMG),
                    reason="reference assets not mounted")
def test_infer_cli_on_reference_assets(tmp_path):
    import torch

    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config
    from tests.test_models import _fake_torch_sd

    # synthetic checkpoints in the reference's on-disk formats
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    sd_raw, _ = _fake_torch_sd(raw_cfg, seed=1)
    base_pth = str(tmp_path / "base.pth")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd_raw.items()}, base_pth)

    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    sd_amodal, _ = _fake_torch_sd(amodal_cfg, seed=2)
    ckpt_dir = tmp_path / "amodal_ckpt"
    ckpt_dir.mkdir()
    from safetensors.numpy import save_file
    save_file({k: np.asarray(v) for k, v in sd_amodal.items()},
              str(ckpt_dir / "model.safetensors"))

    from amodal_depth_anything_tpu.cli import infer as infer_cli

    out_dir = str(tmp_path / "out")
    infer_cli.main([
        "--input_image_path", ASSET_IMG,
        "--input_mask_path", ASSET_MASK,
        "--output_folder", out_dir,
        "--base_ckpt", base_pth,
        "--amodal_ckpt", str(ckpt_dir),
        "--size", "56",
    ])
    from PIL import Image
    raw = np.asarray(Image.open(os.path.join(out_dir,
                                             "case1_raw_depth_rendered.png")))
    amodal = np.asarray(Image.open(os.path.join(
        out_dir, "case1_amodal_depth_rendered.png")))
    assert raw.shape == (576, 768, 3)
    assert amodal.shape == (576, 768, 3)
    assert raw.std() > 0 and amodal.std() > 0  # non-degenerate renders
