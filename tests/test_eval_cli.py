"""eval CLI contract test over the synthetic fixture + Orbax checkpoint."""

import os

import numpy as np


def test_eval_cli_smoke(tmp_path):
    import jax

    from amodal_depth_anything_tpu.cli import eval as eval_cli
    from amodal_depth_anything_tpu.cli import train as train_cli
    from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree

    root = str(tmp_path / "data")
    os.makedirs(root)
    make_synthetic_sam_tree(root, n=16, hw=56)

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "smoke_synthetic_vitt.yaml")
    train_cli.main([
        "--config", cfg_path, "--base_data_dir", root,
        "--output_dir", str(tmp_path / "out"), "--no_wandb",
    ])
    runs = sorted((tmp_path / "out" / "smoke_synthetic_vitt").iterdir())
    ckpt = runs[-1] / "checkpoint" / "latest"
    assert ckpt.exists()

    eval_cli.main([
        "--config", cfg_path,
        "--trained_checkpoint", str(ckpt),
        "--base_data_dir", root,
        "--output_dir", str(tmp_path / "eval"),
    ])
    eval_txt = tmp_path / "eval" / "evaluation" / "eval.txt"
    assert eval_txt.exists()
    text = eval_txt.read_text()
    assert "abs_relative_difference" in text and "align_overall" in text
