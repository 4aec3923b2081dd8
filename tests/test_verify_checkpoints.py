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
