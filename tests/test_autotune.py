"""autotune_serving: ladder sweep plumbing on tiny random pipelines."""

import jax  # noqa: F401  (platform forced to cpu by conftest)

from amodal_depth_anything_tpu.scripts.autotune_serving import (
    build_parser, candidate_configs, run_autotune)


def test_candidate_configs():
    assert candidate_configs("amodal")[0] == "bf16"
    assert "int8_calib" in candidate_configs("amodal",
                                             include_calibrated=True)
    assert candidate_configs("depthfm")[0] == "bf16"


def test_autotune_amodal_random():
    args = build_parser().parse_args(
        ["--family", "amodal", "--random", "--batch", "2", "--reps", "1",
         "--configs", "bf16,tome_base", "--quality_budget", "1.0"])
    report = run_autotune(args)
    names = [r["config"] for r in report["rows"]]
    assert names == ["bf16", "tome_base"]
    exact = report["rows"][0]
    assert exact["quality_delta"]["max_abs"] == 0.0 and exact["passes_budget"]
    tome = report["rows"][1]
    # live-biased raw head + merged trunk: the delta must be non-vacuous
    assert tome["quality_delta"]["max_abs"] > 0.0
    assert report["best"] in names


def test_autotune_amodal_budget_gates():
    args = build_parser().parse_args(
        ["--family", "amodal", "--random", "--batch", "2", "--reps", "1",
         "--configs", "bf16,tome_base", "--quality_budget", "0.0"])
    report = run_autotune(args)
    assert report["best"] == "bf16"  # only the exact config fits budget 0


def test_autotune_depthfm_random():
    args = build_parser().parse_args(
        ["--family", "depthfm", "--random", "--batch", "2", "--reps", "1",
         "--configs", "bf16,int8_dynamic", "--quality_budget", "1.0"])
    report = run_autotune(args)
    names = [r["config"] for r in report["rows"]]
    assert names == ["bf16", "int8_dynamic"]
    assert report["rows"][1]["quality_delta"]["max_abs"] > 0.0
    assert report["best"] in names


def test_autotune_depthfm_deepcache():
    args = build_parser().parse_args(
        ["--family", "depthfm", "--random", "--batch", "2", "--reps", "1",
         "--configs", "bf16,deepcache_2", "--quality_budget", "1.0"])
    report = run_autotune(args)
    names = [r["config"] for r in report["rows"]]
    assert names == ["bf16", "deepcache_2"]
    assert report["best"] in names
