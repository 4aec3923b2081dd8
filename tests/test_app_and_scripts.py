"""Headless app flow, profiling utils, convert_ckp script."""

import os

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.cli.app import AmodalDepthApp
from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          init_amodal_dav2)
from amodal_depth_anything_tpu.pipeline import AmodalDepthPipeline
from amodal_depth_anything_tpu.utils.profiling import StepTimer, \
    device_memory_stats


def test_app_amodal_mask_mode(rng):
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    pipe = AmodalDepthPipeline(
        init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg), raw_cfg,
        init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg), amodal_cfg,
        size=56, attn_impl="xla")
    app = AmodalDepthApp(pipe)
    img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
    mask = np.zeros((60, 70), np.float32)
    mask[10:40, 20:50] = 1
    base, amodal, depth = app.predict_amodal_depth(img, mask, "amodal_mask")
    assert base.shape == (60, 70, 3) and amodal.shape == (60, 70, 3)
    assert depth.shape == (56, 56) and np.isfinite(depth).all()
    with pytest.raises(RuntimeError, match="prompt_points"):
        app.predict_amodal_depth(img, mask, "prompt_points")


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(5):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 4 and s["p50_s"] >= 0


def test_device_memory_stats_no_crash():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_convert_ckp_strip(tmp_path):
    import torch
    from amodal_depth_anything_tpu.scripts.convert_ckp import main
    sd = {"pretrained.cls_token": torch.zeros(1, 1, 8),
          "depth_head.projects.0.weight": torch.zeros(4, 8, 1, 1)}
    inp = str(tmp_path / "in.pth")
    out = str(tmp_path / "out.pth")
    torch.save(sd, inp)
    main(["strip", "--input", inp, "--output", out])
    stripped = torch.load(out, weights_only=True)
    assert list(stripped) == ["cls_token"]


def test_colorize_depth_script(tmp_path, rng):
    from PIL import Image

    from amodal_depth_anything_tpu.scripts.colorize_depth import main

    d = (rng.random((24, 32)) * 65535).astype(np.uint16)
    Image.fromarray(d).save(tmp_path / "0001_depth.png")
    out_dir = tmp_path / "out"
    main(["--input", str(tmp_path), "--out_dir", str(out_dir)])
    rendered = np.asarray(Image.open(out_dir / "0001_depth_rendered.png"))
    assert rendered.shape == (24, 32, 3) and rendered.dtype == np.uint8
    assert rendered.std() > 0  # actually colorized, not constant


def test_precomputed_eval_script(tmp_path, rng, capsys):
    """Perfect predictions must score ~0 error / ~1 delta1 through the
    whole load->align->bucket->track path."""
    from PIL import Image

    from amodal_depth_anything_tpu.scripts.precomputed_eval import main

    dirs = {k: tmp_path / k for k in
            ("pred", "gt", "obs", "visible", "whole")}
    for d in dirs.values():
        d.mkdir()
    for i, vis_frac in enumerate((0.9, 0.6, 0.3)):  # one per bucket
        sid = f"{i:04d}"
        depth = (rng.random((64, 64)) * 0.5 + 0.25)
        u16 = (depth * 65535).astype(np.uint16)
        whole = np.zeros((64, 64), np.uint8)
        whole[8:56, 8:56] = 255
        visible = np.zeros_like(whole)
        n_rows = int(48 * vis_frac)
        visible[8:8 + n_rows, 8:56] = 255
        Image.fromarray(u16).save(dirs["pred"] / f"{sid}_depth.png")
        Image.fromarray(u16).save(dirs["gt"] / f"{sid}_depth.png")
        Image.fromarray(u16).save(dirs["obs"] / f"{sid}_depth.png")
        Image.fromarray(visible).save(dirs["visible"] / f"{sid}_visible_mask.png")
        Image.fromarray(whole).save(dirs["whole"] / f"{sid}_whole_mask.png")

    report = tmp_path / "eval.txt"
    main(["--pred_dir", str(dirs["pred"]), "--gt_dir", str(dirs["gt"]),
          "--obs_dir", str(dirs["obs"]), "--visible_dir", str(dirs["visible"]),
          "--whole_dir", str(dirs["whole"]), "--output", str(report)])
    out = capsys.readouterr().out
    assert "align_easy" in out and "align_diff" in out
    assert report.exists()
    # identical pred/gt -> rmse ~0, delta1 ~1 in every populated bucket
    import re
    rows = [list(map(float, re.findall(r"-?\d+\.\d+", line)))
            for line in out.splitlines() if re.search(r"^\s*-?\d+\.\d+", line)]
    for vals in rows:
        rmse, log10, d1 = vals
        assert rmse < 1e-4 and d1 > 0.999


def test_pix2gestalt_eval_single(tmp_path):
    """Qualitative baseline script (reference pix2gestalt_eval_single.py):
    depth on a pre-computed reconstruction, aligned to the scene depth
    over the visible mask, both written as 16-bit PNGs."""
    import torch
    from PIL import Image

    from amodal_depth_anything_tpu.models.amodal_dav2 import DAV2Config
    from amodal_depth_anything_tpu.scripts import pix2gestalt_eval_single
    from tests.test_models import _fake_torch_sd

    rng = np.random.default_rng(0)
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    sd_raw, _ = _fake_torch_sd(raw_cfg, seed=1)
    ckpt = str(tmp_path / "base.pth")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd_raw.items()}, ckpt)

    rec = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(rec).save(tmp_path / "rec.jpg")
    d16 = (rng.random((64, 64)) * 60000).astype(np.uint16)
    Image.fromarray(d16).save(tmp_path / "depth_raw.png")
    vis = np.zeros((64, 64), np.uint8)
    vis[8:40, 8:40] = 255
    Image.fromarray(vis).save(tmp_path / "visible.png")

    out = tmp_path / "out"
    depth, aligned = pix2gestalt_eval_single.main([
        "--reconstruction", str(tmp_path / "rec.jpg"),
        "--raw_depth", str(tmp_path / "depth_raw.png"),
        "--visible_mask", str(tmp_path / "visible.png"),
        "--checkpoint", ckpt,
        "--output_dir", str(out),
        "--size", "28", "--out_size", "32",
    ])
    assert depth.shape == (32, 32) and np.isfinite(depth).all()
    assert 0.0 <= depth.min() and depth.max() <= 1.0
    pred = np.asarray(Image.open(out / "pred_depth.png"))
    comb = np.asarray(Image.open(out / "combined_depth.png"))
    assert pred.dtype == np.uint16 and pred.shape == (32, 32)
    assert comb.dtype == np.uint16 and comb.shape == (32, 32)


def test_pix2gestalt_inpainting_baseline(tmp_path):
    """Batch inpainting baseline (reference pix2gestalt_inpainting.py):
    p2g completion -> matting -> DAV2 depth -> align -> bucketed metrics,
    writing the four per-sample output dirs precomputed_eval consumes."""
    import argparse

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics
    from amodal_depth_anything_tpu.scripts import pix2gestalt_inpainting

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    for d in ("occlusion", "visible_object_mask", "depth_da_update_combine"):
        (data / d).mkdir(parents=True)
    ids = ["0001", "0002"]
    for sid in ids:
        occ = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(occ).save(data / "occlusion" / f"{sid}_occlusion.png")
        vis = np.zeros((48, 48), np.uint8)
        vis[8:30, 8:24] = 255
        Image.fromarray(vis).save(
            data / "visible_object_mask" / f"{sid}_visible_mask.png")
        d16 = (rng.random((48, 48)) * 60000).astype(np.uint16)
        Image.fromarray(d16).save(
            data / "depth_da_update_combine" / f"{sid}_depth.png")
    split = tmp_path / "split.txt"
    split.write_text("".join(f"sa_{sid}.jpg x\n" for sid in ids))

    heuristics = MaskHeuristics.init_random(jax.random.PRNGKey(0), tiny=True)

    @jax.jit
    def dav2_apply(comp_u8):
        # stand-in frozen depth model: luminance ramp, min-max normalized
        x = jnp.asarray(comp_u8, jnp.float32)[None] / 255.0
        d = x.mean(-1)
        return (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-8)

    args = argparse.Namespace(
        data_dir=str(data), split=str(split), output_dir=str(tmp_path / "o"),
        metrics=["rmse_linear", "delta1_acc"], limit=0)
    banks, n = pix2gestalt_inpainting.run(args, heuristics, dav2_apply)
    assert n == 2
    assert np.isfinite(banks["align_overall"].avg("rmse_linear"))
    for d in ("amodal_inpainting", "amodal_mask", "amodal_depth",
              "amodal_aligned_depth"):
        files = list((tmp_path / "o" / d).iterdir())
        assert len(files) == 2, d
    m = np.asarray(Image.open(
        tmp_path / "o" / "amodal_mask" / "0001_amodal_mask.png"))
    assert m.dtype == np.uint16 and m.shape == (518, 518)


def _tiny_app():
    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    pipe = AmodalDepthPipeline(
        init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg), raw_cfg,
        init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg), amodal_cfg,
        size=56, attn_impl="xla")
    return AmodalDepthApp(pipe)


def test_http_demo_roundtrip(rng):
    """Launch the plain-HTTP demo (the gradio-free fallback the reference
    app.py:295-340 flow ships behind) and round-trip one request."""
    import base64
    import http.client
    import io
    import json
    import threading

    from PIL import Image

    from amodal_depth_anything_tpu.cli.app import build_http_demo

    server = build_http_demo(_tiny_app(), port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/")
        page = conn.getresponse()
        assert page.status == 200 and b"Predict" in page.read()

        def png64(arr):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
        mask = np.zeros((60, 70), np.uint8)
        mask[10:40, 20:50] = 255
        conn.request("POST", "/predict", body=json.dumps(
            {"image": png64(img), "mask": png64(mask),
             "mask_type": "amodal_mask"}))
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 200, out
        for key in ("base", "amodal"):
            arr = np.asarray(Image.open(io.BytesIO(
                base64.b64decode(out[key]))))
            assert arr.shape == (60, 70, 3), arr.shape

        # error path: malformed body -> structured 500, server survives
        conn.request("POST", "/predict", body="not json")
        err = conn.getresponse()
        assert err.status == 500 and "error" in json.loads(err.read())
    finally:
        server.shutdown()


def test_gradio_ui_graph_roundtrip(rng, monkeypatch):
    """Instantiate the Gradio UI wiring through a minimal stub module and
    drive one predict through the registered click callback — covers the
    editor-value parsing (background + painted layers) that only exists
    in the gradio path."""
    import sys
    import types

    class _Ctx:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Comp:
        def __init__(self, *a, **k):
            pass

    calls = {}

    class _Button(_Comp):
        def click(self, fn, inputs, outputs):
            calls["fn"], calls["inputs"], calls["outputs"] = fn, inputs, outputs

    gr = types.ModuleType("gradio")
    gr.Blocks = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Comp
    gr.ImageEditor = _Comp
    gr.Image = _Comp
    gr.Radio = _Comp
    gr.Button = _Button
    monkeypatch.setitem(sys.modules, "gradio", gr)

    from amodal_depth_anything_tpu.cli.app import build_demo

    demo = build_demo(_tiny_app())
    assert demo is not None and "fn" in calls
    img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
    layer = np.zeros((60, 70, 4), np.uint8)
    layer[10:40, 20:50, 3] = 255
    base, amodal = calls["fn"]({"background": img, "layers": [layer]},
                               "amodal_mask")
    assert base.shape == (60, 70, 3) and amodal.shape == (60, 70, 3)


def test_app_cli_build_heuristics_validation():
    """--p2g_* knobs without any heuristics source, or a partial raw-ckpt
    set, must SystemExit with a pointer to the missing flags — before any
    checkpoint IO."""
    import argparse

    from amodal_depth_anything_tpu.cli.app import _build_heuristics

    def ns(**kw):
        base = dict(sam_ckpt=None, p2g_ckpt=None, vae_ckpt=None,
                    clip_ckpt=None, rmbg_ckpt=None, heur_serving=None,
                    p2g_deep_cache=None, p2g_int8=False)
        base.update(kw)
        return argparse.Namespace(**base)

    assert _build_heuristics(ns()) is None
    with pytest.raises(SystemExit):
        _build_heuristics(ns(p2g_deep_cache="5"))
    with pytest.raises(SystemExit):
        _build_heuristics(ns(p2g_int8=True))
    with pytest.raises(SystemExit):
        _build_heuristics(ns(sam_ckpt="x.pth"))  # partial raw-ckpt set


def test_app_cli_build_heuristics_knobs(tmp_path):
    """The gated demo knobs reach the stack through the CLI path: a
    save_serving dir restores, '--p2g_deep_cache 5,2' lands in p2g_cfg,
    and --p2g_int8 leaves int8 UNet kernels (width-scaled thresholds
    quantize the tiny preset proportionally)."""
    import argparse

    import jax.numpy as jnp

    from amodal_depth_anything_tpu.cli.app import _build_heuristics
    from amodal_depth_anything_tpu.heuristics import MaskHeuristics

    MaskHeuristics.init_random(jax.random.PRNGKey(0),
                               tiny=True).save_serving(str(tmp_path))
    args = argparse.Namespace(
        sam_ckpt=None, p2g_ckpt=None, vae_ckpt=None, clip_ckpt=None,
        rmbg_ckpt=None, heur_serving=str(tmp_path),
        p2g_deep_cache="5,2", p2g_int8=True)
    mh = _build_heuristics(args)
    assert mh.p2g_cfg.ddim_deep_cache == (5, 2)
    int8_leaves = [a for a in jax.tree_util.tree_leaves(mh.p2g_params["unet"])
                   if hasattr(a, "dtype") and a.dtype == jnp.int8]
    assert int8_leaves, "no int8 kernels after --p2g_int8"
