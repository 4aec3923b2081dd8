"""MicroBatcher: host-side micro-batching serving frontend.

Contract under test: concurrent single-sample requests coalesce into
<= ceil(n/max_batch) device dispatches, partial batches pad to the
compiled batch size (one program shape), and every caller gets output
bit-identical to a direct batched pipeline call.
"""

import threading

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.pipeline import MicroBatcher


def test_microbatcher_coalesces_and_pads(rng):
    calls = []

    def batch_fn(x, y):
        calls.append(x.shape[0])
        return x * 2.0, y + 1.0

    with MicroBatcher(batch_fn, max_batch=4, max_delay_ms=200) as mb:
        xs = [rng.random((3, 2)).astype(np.float32) for _ in range(6)]
        ys = [rng.random((3,)).astype(np.float32) for _ in range(6)]
        futs = [mb.submit(x, y) for x, y in zip(xs, ys)]
        outs = [f.result(timeout=30) for f in futs]

    for (ox, oy), x, y in zip(outs, xs, ys):
        np.testing.assert_array_equal(ox, x * 2.0)
        np.testing.assert_array_equal(oy, y + 1.0)
    # 6 requests at max_batch 4 -> 2 dispatches, both padded to 4
    assert mb.dispatches == 2
    assert calls == [4, 4]


def test_microbatcher_single_output_and_infer():
    with MicroBatcher(lambda x: x + 1.0, max_batch=2,
                      max_delay_ms=0) as mb:
        out = mb.infer(np.zeros((2, 2), np.float32))
    np.testing.assert_array_equal(out, np.ones((2, 2), np.float32))
    assert mb.dispatches == 1


def test_microbatcher_infer_timeout():
    import concurrent.futures
    import time as _time

    def slow(x):
        _time.sleep(2.0)
        return x

    with MicroBatcher(slow, max_batch=1, max_delay_ms=0) as mb:
        with pytest.raises(concurrent.futures.TimeoutError):
            mb.infer(np.zeros((2,), np.float32), timeout=0.2)


def test_microbatcher_shape_mismatch_and_errors():
    def boom(x):
        raise RuntimeError("kernel on fire")

    with MicroBatcher(boom, max_batch=2, max_delay_ms=0) as mb:
        fut = mb.submit(np.zeros((2,), np.float32))
        with pytest.raises(RuntimeError, match="kernel on fire"):
            fut.result(timeout=30)

    with MicroBatcher(lambda x: x, max_batch=4, max_delay_ms=500) as mb:
        f1 = mb.submit(np.zeros((2,), np.float32))
        f2 = mb.submit(np.zeros((3,), np.float32))
        with pytest.raises(ValueError, match="per-sample shapes"):
            f1.result(timeout=30)
            f2.result(timeout=30)

    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.zeros((2,), np.float32))


def test_microbatcher_concurrent_callers_match_direct_pipeline(rng):
    """End-to-end over the real pipeline: threaded callers through the
    batcher get bit-identical results to one direct batched call."""
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline import AmodalDepthPipeline

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    pipe = AmodalDepthPipeline(
        jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(jax.random.PRNGKey(0)),
        raw_cfg,
        jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(jax.random.PRNGKey(1)),
        am_cfg, size=56, attn_impl="xla")

    imgs = (rng.random((5, 48, 40, 3)) * 255).astype(np.float32)
    msks = (rng.random((5, 48, 40)) > 0.5).astype(np.float32)
    want_base, want_blend = pipe(imgs[:4], msks[:4])  # direct, full batch

    results = [None] * 5
    with MicroBatcher(pipe, max_batch=4, max_delay_ms=1000) as mb:
        def call(i):
            results[i] = mb.infer(imgs[i], msks[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    assert mb.dispatches == 2  # 4 + 1(padded)
    for i in range(4):
        base_i, blend_i = results[i]
        np.testing.assert_array_equal(base_i, want_base[i])
        np.testing.assert_array_equal(blend_i, want_blend[i])
    base4, blend4 = results[4]
    assert base4.shape == (56, 56) and np.isfinite(blend4).all()


def test_http_serving_endpoint(rng):
    """cli/serve.py: stdlib HTTP server over MicroBatcher — concurrent
    POSTs return depth PNGs identical to a direct pipeline call."""
    import base64
    import io
    import json
    import urllib.request
    from PIL import Image

    from amodal_depth_anything_tpu.cli.serve import build_server, _prep
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline import AmodalDepthPipeline

    raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
    am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    pipe = AmodalDepthPipeline(
        jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(jax.random.PRNGKey(0)),
        raw_cfg,
        jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(jax.random.PRNGKey(1)),
        am_cfg, size=56, attn_impl="xla")

    server = build_server(pipe, port=0, max_batch=2, max_delay_ms=400)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"

    def b64_png(arr, mode=None):
        buf = io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    try:
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["size"] == 56

        image = (rng.random((48, 40, 3)) * 255).astype(np.uint8)
        mask = ((rng.random((48, 40)) > 0.5) * 255).astype(np.uint8)
        body = json.dumps({"image": b64_png(image),
                           "mask": b64_png(mask)}).encode()

        results = [None, None]

        def post(i):
            req = urllib.request.Request(
                f"{url}/v1/amodal_depth", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # expected: direct pipeline call on the server's host-resized inputs
        img_p, msk_p = _prep(image.astype(np.float32), mask, 56)
        base_want, blend_want = pipe(img_p, msk_p)
        want_u16 = (np.clip(blend_want, 0, 1) * 65535).astype(np.uint16)

        for res in results:
            got = np.asarray(Image.open(io.BytesIO(
                base64.b64decode(res["blended_depth"]))))
            np.testing.assert_array_equal(got.astype(np.uint16), want_u16)

        # bad request surfaces as 400, not a hung socket
        bad = urllib.request.Request(f"{url}/v1/amodal_depth",
                                     data=b'{"image": "zzz"}')
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.batcher.close()


def test_serve_cli_random_subprocess():
    """cli.serve --random: the full main() path (arg parsing, pipeline
    build, server bring-up) as a real subprocess, polled via /healthz."""
    import json
    import os
    import re
    import subprocess
    import sys
    import time
    import urllib.request

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_cpu_parallel_codegen_split_count=1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "amodal_depth_anything_tpu.cli.serve",
         "--random", "--port", "0", "--max_batch", "1"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        import select
        line = ""
        deadline = time.time() + 240
        while time.time() < deadline:
            # select-gated read: a wedged server must FAIL the deadline,
            # not block the suite in readline()
            ready, _, _ = select.select([proc.stdout], [], [], 5.0)
            if not ready:
                assert proc.poll() is None, "server exited early"
                continue
            line = proc.stdout.readline()
            if "serving on" in line:
                break
            assert proc.poll() is None, "server exited early"
        assert "serving on" in line, f"server not up by deadline: {line!r}"
        m = re.search(r":(\d+)", line)
        assert m, f"no port in startup line: {line!r}"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{m.group(1)}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["size"] == 56
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_http_serving_depthfm_family(rng):
    """--family depthfm route: image+mask+observation -> depth PNG,
    identical to a direct DepthFMPipeline call on the host-prepped
    inputs."""
    import base64
    import io
    import json
    import urllib.error
    import urllib.request
    from PIL import Image

    from amodal_depth_anything_tpu.cli.serve import (build_server,
                                                     _b64_depth_to_array,
                                                     _prep)
    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.pipeline import DepthFMPipeline

    model = get_model("DepthFMAmodal", tiny=True)
    params = model.init(jax.random.PRNGKey(0))
    pipe = DepthFMPipeline(params, model.config, size=32, num_steps=2,
                           attn_impl="xla")

    server = build_server(pipe, port=0, max_batch=2, max_delay_ms=0,
                          family="depthfm")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"

    def b64_png(arr, mode=None):
        buf = io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    try:
        image = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        mask = ((rng.random((40, 48)) > 0.5) * 255).astype(np.uint8)
        obs_u16 = (rng.random((40, 48)) * 65535).astype(np.uint16)
        body = json.dumps({"image": b64_png(image), "mask": b64_png(mask),
                           "observation": b64_png(obs_u16, mode="I;16"),
                           }).encode()
        req = urllib.request.Request(
            f"{url}/v1/depthfm_depth", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            res = json.loads(r.read())
        assert res["size"] == 32

        img_p, msk_p = _prep(image.astype(np.float32), mask, 32)
        obs_p = _b64_depth_to_array(b64_png(obs_u16, mode="I;16"), 32)
        want = pipe(img_p, msk_p, obs_p)
        want_u16 = (np.clip(want, 0, 1) * 65535).astype(np.uint16)
        got = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(res["depth"]))))
        np.testing.assert_array_equal(got.astype(np.uint16), want_u16)

        # the amodal route must 404 on a depthfm server
        bad = urllib.request.Request(f"{url}/v1/amodal_depth", data=body)
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.batcher.close()


def test_serve_cli_knob_validation():
    """The serving-menu knobs are depthfm-family, pre-compile options:
    wrong family or --artifact mode must exit with a clear message
    BEFORE any pipeline/restore work."""
    from amodal_depth_anything_tpu.cli import serve

    for argv in (["--family", "amodal", "--random", "--deep_cache", "2,2"],
                 ["--family", "amodal", "--random", "--int8", "wo"],
                 ["--family", "depthfm", "--random", "--int8", "ln"],
                 ["--family", "depthfm", "--artifact", "/nonexistent",
                  "--deep_cache", "2,2"],
                 ["--family", "depthfm", "--artifact", "/nonexistent",
                  "--int8", "dynamic"]):
        with pytest.raises(SystemExit):
            serve.main(argv)


def test_serve_deep_cache_and_int8_knobs_reach_pipeline(rng):
    """--deep_cache 'N,G' strings parse through the DepthFMPipeline
    constructor (the serving-menu incantation format) and the post-load
    override path used by cli.serve; int8-wo rewrites the param tree
    without breaking the serving graph."""
    from amodal_depth_anything_tpu.pipeline import DepthFMPipeline

    pipe = DepthFMPipeline.init_random(None, deep_cache="2,2")
    assert pipe.deep_cache == (2, 2)

    # the cli.serve override path: set post-construction, pre-first-call
    pipe.deep_cache = None
    from amodal_depth_anything_tpu.ops.ddim import parse_deep_cache
    pipe.deep_cache = parse_deep_cache("2,1")
    assert pipe.deep_cache == (2, 1)
    pipe.quantize_int8(weight_only=True)  # tiny sites under thresholds: no-op tree walk
    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.float32)
    msk = np.ones((1, 32, 32), np.float32)
    out = pipe(img, msk, np.zeros((1, 32, 32), np.float32))
    assert np.asarray(out).shape == (1, 32, 32)
    assert np.isfinite(np.asarray(out)).all()
