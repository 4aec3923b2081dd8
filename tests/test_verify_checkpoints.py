"""Checkpoint-day verification kit: runs green today on stubbed
(seeded-weight) checkpoints written in the reference's own layouts.
The day the real weights land, the same command verifies them."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest
import torch

REFERENCE = pathlib.Path("/root/reference")
DUMP_SCRIPT = pathlib.Path(__file__).parent / "ref_golden_dump.py"

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def stub_ckpts(tmp_path_factory):
    """Seeded vits checkpoints in the reference key layout (via the
    reference's own model classes in the dump subprocess)."""
    td = tmp_path_factory.mktemp("ckpts")
    paths = {}
    for key, name in (("raw_dav2_vits", "base.pth"),
                      ("amodal_dav2_vits", "amodal.pth")):
        npz = td / f"{key}.npz"
        subprocess.run([sys.executable, str(DUMP_SCRIPT), key, str(npz)],
                       check=True, timeout=900)
        data = dict(np.load(npz))
        sd = {k[3:]: torch.from_numpy(v) for k, v in data.items()
              if k.startswith("sd.")}
        out = td / name
        torch.save(sd, out)
        paths[key] = str(out)
    return paths


def test_kit_convert_rows_pass(stub_ckpts, tmp_path, capsys):
    from amodal_depth_anything_tpu.scripts import verify_checkpoints as vk

    rc = vk.main(["--dav2_base", stub_ckpts["raw_dav2_vits"],
                  "--dav2_amodal", stub_ckpts["amodal_dav2_vits"],
                  "--skip_forward", "--skip_chain",
                  "--output", str(tmp_path / "report.txt")])
    assert rc == 0
    report = (tmp_path / "report.txt").read_text()
    for row in ("dav2_base_convert", "dav2_amodal_convert"):
        line = [l for l in report.splitlines() if l.startswith(row)][0]
        assert "PASS" in line, line
    assert "FAIL" not in report
    # absent artifacts are SKIP rows, never failures
    for row in ("depthfm", "sam", "pix2gestalt", "rmbg",
                "invisible_stitch"):
        assert f"{row}_convert" in report and "SKIP" in report


def test_kit_full_chain_gate_on_stub_weights(stub_ckpts, tmp_path):
    """The <1e-3 full-chain gate through the kit's real-weights plumbing
    (GOLDEN_* env -> reference infer_single_image subprocess) must pass
    on the stubbed vits weights — the exact command for checkpoint day."""
    from amodal_depth_anything_tpu.scripts import verify_checkpoints as vk

    rc = vk.main(["--dav2_base", stub_ckpts["raw_dav2_vits"],
                  "--dav2_amodal", stub_ckpts["amodal_dav2_vits"],
                  "--skip_forward",
                  "--output", str(tmp_path / "report.txt")])
    report = (tmp_path / "report.txt").read_text()
    chain_row = [l for l in report.splitlines() if "full_chain" in l][0]
    assert "PASS" in chain_row, chain_row
    assert rc == 0


def test_kit_depthfm_pipeline_rows(tmp_path):
    """Full DepthFM pipeline + quality rows on tiny stubbed files (the
    checkpoint-day command shape: --depthfm + --depthfm_vae +
    --quality)."""
    import jax
    import numpy as np
    from PIL import Image
    from test_convert_depthfm import emit_unet_sd, emit_vae_sd

    from amodal_depth_anything_tpu.models.unet_ldm import (UNetConfig,
                                                           init_unet)
    from amodal_depth_anything_tpu.models.vae import VAEConfig, init_vae
    from amodal_depth_anything_tpu.scripts import verify_checkpoints as vk

    ucfg = UNetConfig(in_channels=8, model_channels=32, channel_mult=(1, 2),
                      num_heads=2, context_dim=32)
    unet = jax.jit(lambda k: init_unet(k, ucfg))(jax.random.PRNGKey(2))
    torch.save({
        "ldm_hparams": {"context_dim": 32, "model_channels": 32,
                        "channel_mult": [1, 2], "num_heads": 2},
        "noising_step": 400,
        "state_dict": {k: torch.from_numpy(np.array(v)) for k, v in
                       emit_unet_sd(unet, ucfg).items()},
        "empty_text_embedding": np.zeros((7, 32), np.float32),
    }, tmp_path / "depthfm-v1.ckpt")
    vae = jax.jit(lambda k: init_vae(
        k, VAEConfig(block_out_channels=(16, 32), layers_per_block=1)))(
        jax.random.PRNGKey(3))
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                emit_vae_sd(vae).items()}, tmp_path / "vae.pth")

    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((40, 48, 3)) * 255).astype(np.uint8)).save(
        tmp_path / "img.png")
    Image.fromarray(((rng.random((40, 48)) > 0.5) * 255).astype(
        np.uint8)).save(tmp_path / "mask.png")

    rc = vk.main(["--depthfm", str(tmp_path / "depthfm-v1.ckpt"),
                  "--depthfm_vae", str(tmp_path / "vae.pth"),
                  "--depthfm_size", "32", "--quality",
                  "--image", str(tmp_path / "img.png"),
                  "--mask", str(tmp_path / "mask.png"),
                  "--output", str(tmp_path / "report.txt")])
    assert rc == 0
    report = (tmp_path / "report.txt").read_text()
    for row in ("depthfm_convert", "depthfm_unet_forward",
                "depthfm_pipeline_forward", "depthfm_int8_quality_delta",
                "depthfm_tome_quality_delta",
                "depthfm_deepcache_quality_delta"):
        line = [l for l in report.splitlines() if l.startswith(row)][0]
        assert "PASS" in line, line


def test_kit_rehearse_one_command(tmp_path):
    """--rehearse: synthesize every checkpoint format the reference loads
    (pth / safetensors / LDM ckpt hparams) via the package emitters and
    run the whole gate on them — the checkpoint-day dry run (fast
    variant: chain skipped, small size; the full command is documented
    in the module docstring and README)."""
    from amodal_depth_anything_tpu.scripts import verify_checkpoints as vk

    rdir = tmp_path / "ckpts"
    rc = vk.main(["--rehearse", str(rdir), "--skip_chain", "--size", "126",
                  "--gate_max_abs", "1e9",  # plumbing only: random weights
                  "--output", str(tmp_path / "report.txt")])
    report = (tmp_path / "report.txt").read_text()
    assert rc == 0, report
    for row in ("dav2_base_convert", "dav2_base_forward",
                "dav2_amodal_convert", "dav2_amodal_forward",
                "int8_quality_delta", "tome_quality_delta",
                "depthfm_convert", "depthfm_unet_forward",
                "depthfm_pipeline_forward", "depthfm_int8_quality_delta",
                "sam_convert", "pix2gestalt_convert", "rmbg_convert",
                "invisible_stitch_convert"):
        line = [l for l in report.splitlines() if l.startswith(row)][0]
        assert "PASS" in line, line
    assert "FAIL" not in report
    # the synthesized artifacts really are in the reference's formats
    for name in ("amodal_depth_anything_base.pth", "model.safetensors",
                 "depthfm-v1.ckpt", "vae.pth", "sam_vit_h.pth",
                 "epoch=000005.ckpt", "rmbg14.pth", "invisible-stitch.pt"):
        assert (rdir / name).exists(), name


def test_kit_gate_enforcement(tmp_path):
    """--gate_max_abs turns a too-large optimized-vs-exact delta into a
    FAIL row (the checkpoint-day acceptance gate, pipeline/quality.py)."""
    from amodal_depth_anything_tpu.scripts import verify_checkpoints as vk

    rdir = tmp_path / "ckpts"
    rc = vk.main(["--rehearse", str(rdir), "--skip_chain", "--size", "126",
                  "--skip_forward",  # dav2 quality rows only
                  "--gate_max_abs", "1e-12",
                  "--output", str(tmp_path / "report.txt")])
    report = (tmp_path / "report.txt").read_text()
    # int8 on random weights cannot be bit-exact: the gate must trip
    line = [l for l in report.splitlines()
            if l.startswith("int8_quality_delta")][0]
    assert "FAIL" in line and "quality gate" in line, line
    assert rc == 1
