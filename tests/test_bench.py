"""bench.py smoke: the driver runs it at round end — a broken bench
means no recorded number. All three modes must print one valid JSON
line on CPU (tiny presets)."""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    # REPLACE inherited XLA_FLAGS: the suite may force 8 virtual devices,
    # and the bench's small CPU batches don't shard over data=8
    env["XLA_FLAGS"] = "--xla_cpu_parallel_codegen_split_count=1"
    res = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, line
    assert out["value"] > 0
    return out


def test_bench_default_mode():
    out = _run({})
    assert "images/sec/chip" in out["unit"]


def test_bench_quality_mode():
    out = _run({"AMODAL_QUALITY": "1", "AMODAL_TOME_BASE": "0,3",
                "AMODAL_BENCH_BATCH": "1"})
    assert "quality_delta" in out
    assert out["quality_delta"]["blended_max_abs"] >= 0.0


def test_bench_depthfm_mode():
    out = _run({"AMODAL_BENCH_DEPTHFM": "1"})
    assert "depthfm" in out["metric"]


def test_bench_depthfm_tome_quality_mode():
    out = _run({"AMODAL_BENCH_DEPTHFM": "1", "AMODAL_TOME_DEPTHFM": "0.4,8",
                "AMODAL_QUALITY": "1"})
    assert "tome=0.4" in out["metric"]
    assert out["quality_delta"]["depth_max_abs"] >= 0.0


def test_bench_train_mode():
    out = _run({"AMODAL_BENCH_TRAIN": "1"})
    assert out["unit"] == "ms/step"


def test_bench_train_depthfm_mode():
    out = _run({"AMODAL_BENCH_TRAIN": "depthfm"})
    assert out["unit"] == "ms/step"
    assert "depthfm" in out["metric"]


def test_bench_heuristics_mode():
    out = _run({"AMODAL_BENCH_HEURISTICS": "1"}, timeout=1200)
    assert "completions/sec" in out["unit"]
