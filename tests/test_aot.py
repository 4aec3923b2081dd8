"""AOT serving artifacts (pipeline/aot.py): export -> serialize ->
deserialize -> serve must be bit-identical to the live pipeline, and a
TPU-target export from this CPU host must embed the Pallas kernel."""

import numpy as np
import pytest

import jax

from amodal_depth_anything_tpu.pipeline import (AmodalDepthPipeline,
                                                ExportedAmodalServing,
                                                MicroBatcher,
                                                save_amodal_artifact)

HW = (64, 72)


@pytest.fixture(scope="module")
def tiny_pipe():
    return AmodalDepthPipeline.init_random(jax.random.PRNGKey(7),
                                           encoder="vitt", size=56,
                                           attn_impl="xla")


@pytest.fixture(scope="module")
def artifact(tiny_pipe, tmp_path_factory):
    path = tmp_path_factory.mktemp("aot") / "artifact"
    meta = save_amodal_artifact(tiny_pipe, str(path), batches=(1, 2),
                                hw=HW, platforms=("cpu",))
    return path, meta


def test_artifact_layout(artifact):
    path, meta = artifact
    assert meta["artifact_version"] == 1
    assert meta["batches"] == [1, 2]
    assert (path / "meta.json").exists()
    assert (path / "batch_1.jaxexport").exists()
    assert (path / "batch_2.jaxexport").exists()


def test_roundtrip_bit_exact(tiny_pipe, artifact, rng):
    path, _ = artifact
    served = ExportedAmodalServing.load(str(path)).bind(
        tiny_pipe.params_raw, tiny_pipe.params_amodal)
    assert served.batches == [1, 2]

    img = (rng.random((2, *HW, 3)) * 255).astype(np.float32)
    msk = (rng.random((2, *HW)) > 0.5).astype(np.float32)
    base_live, blended_live = tiny_pipe(img, msk)
    base_aot, blended_aot = served(img, msk)
    np.testing.assert_array_equal(base_aot, base_live)
    np.testing.assert_array_equal(blended_aot, blended_live)


def test_unbucketed_batch_and_unbound_errors(tiny_pipe, artifact, rng):
    path, _ = artifact
    served = ExportedAmodalServing.load(str(path))
    img = np.zeros((3, *HW, 3), np.float32)
    msk = np.zeros((3, *HW), np.float32)
    with pytest.raises(RuntimeError, match="bind"):
        served(img, msk)
    served.bind(tiny_pipe.params_raw, tiny_pipe.params_amodal)
    with pytest.raises(ValueError, match="not in compiled buckets"):
        served(img, msk)


def test_microbatcher_front(tiny_pipe, artifact, rng):
    """The static-bucket contract: MicroBatcher pads request streams to
    the compiled batch, so any request count serves."""
    path, _ = artifact
    served = ExportedAmodalServing.load(str(path)).bind(
        tiny_pipe.params_raw, tiny_pipe.params_amodal)
    imgs = [(rng.random((*HW, 3)) * 255).astype(np.float32)
            for _ in range(3)]
    msks = [(rng.random(HW) > 0.5).astype(np.float32) for _ in range(3)]
    with MicroBatcher(served, max_batch=2, max_delay_ms=0.0) as mb:
        outs = [mb.infer(i, m, timeout=600) for i, m in zip(imgs, msks)]
    for (i, m), (base, blended) in zip(zip(imgs, msks), outs):
        ref_base, ref_blended = tiny_pipe(i, m)
        np.testing.assert_array_equal(base, ref_base)
        np.testing.assert_array_equal(blended, ref_blended)


def test_platform_guard(artifact, tiny_pipe):
    path, _ = artifact
    import json
    meta = json.loads((path / "meta.json").read_text())
    meta["platforms"] = ["tpu"]
    (path / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="exported for"):
        ExportedAmodalServing.load(str(path))
    ExportedAmodalServing.load(str(path), check_platform=False)
    meta["platforms"] = ["cpu"]
    (path / "meta.json").write_text(json.dumps(meta))


def test_tpu_target_export_embeds_pallas(tiny_pipe):
    """Cross-platform lowering from this CPU host: a platforms=('tpu',)
    export must pick the Pallas attention (attn_impl pinned by target)
    and carry the Mosaic payload in a tpu_custom_call; it must also
    survive serialize/deserialize."""
    from amodal_depth_anything_tpu.pipeline.aot import export_amodal_program

    # pipe was built with attn_impl="xla" for CPU execution; the target
    # pin only applies when attn_impl is None. size=238 -> 17x17 patches
    # + cls/reg = padded seq 384 > the 128-token threshold below which
    # the dispatch reroutes defaulted pallas to xla (ops/attention.py).
    tiny_pipe_tpu = AmodalDepthPipeline(
        tiny_pipe.params_raw, tiny_pipe.raw_cfg,
        tiny_pipe.params_amodal, tiny_pipe.amodal_cfg,
        size=238, attn_impl=None)
    exp = export_amodal_program(tiny_pipe_tpu, batch=1, hw=HW,
                                platforms=("tpu",))
    txt = exp.mlir_module()
    assert "tpu_custom_call" in txt, "Pallas kernel not embedded"
    rt = jax.export.deserialize(exp.serialize())
    assert rt.platforms == ("tpu",)


def test_serve_cli_artifact_flow(tmp_path, rng):
    """Deployment loop through the CLI: --export_artifact writes the
    program artifact and exits; a replica loads it (AOT handle, no
    model tracing), fronts it with build_server, and answers HTTP with
    outputs identical to the live --random pipeline."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from amodal_depth_anything_tpu.cli import serve as serve_cli
    from amodal_depth_anything_tpu.pipeline import (AmodalDepthPipeline,
                                                    ExportedAmodalServing)

    art = tmp_path / "artifact"
    serve_cli.main(["--random", "--size", "56", "--max_batch", "2",
                    "--export_artifact", str(art)])
    assert (art / "meta.json").exists()

    served = ExportedAmodalServing.load(str(art))
    assert served.size == 56 and served.batches == [2]
    live = AmodalDepthPipeline.init_random(None, size=56)  # same seed
    served.bind(live.params_raw, live.params_amodal)

    server = serve_cli.build_server(served, port=0, max_batch=2,
                                    max_delay_ms=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    def b64_png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    image = (rng.random((48, 40, 3)) * 255).astype(np.uint8)
    mask = ((rng.random((48, 40)) > 0.5) * 255).astype(np.uint8)
    try:
        body = json.dumps({"image": b64_png(image),
                           "mask": b64_png(mask)}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/amodal_depth", data=body,
            method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        got = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(out["blended_depth"]))), np.float32) / 65535.0
        img56, msk56 = serve_cli._prep(image, mask, 56)
        _, ref = live(img56, msk56)
        np.testing.assert_allclose(got, ref, atol=1.0 / 65535.0)
    finally:
        server.shutdown()
        server.batcher.close()


def test_depthfm_artifact_roundtrip(tmp_path, rng):
    """Generative-family artifact: export -> fresh handle -> serve is
    bit-identical to the live DepthFMPipeline, and the serve CLI
    export/replica flags work for --family depthfm."""
    from amodal_depth_anything_tpu.cli import serve as serve_cli
    from amodal_depth_anything_tpu.pipeline import (DepthFMPipeline,
                                                    ExportedDepthFMServing)

    art = tmp_path / "dfm_artifact"
    serve_cli.main(["--family", "depthfm", "--random", "--size", "32",
                    "--max_batch", "2", "--export_artifact", str(art)])

    live = DepthFMPipeline.init_random(None, size=32)  # same seed
    served = ExportedDepthFMServing.load(str(art)).bind(live.params)
    assert served.size == 32 and served.batches == [2]
    assert served.meta["inputs"] == ["image", "mask", "observation"]

    img = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
    msk = (rng.random((2, 32, 32)) > 0.5).astype(np.float32)
    obs = rng.random((2, 32, 32)).astype(np.float32)
    ref = live(img, msk, obs)
    got = served(img, msk, obs)
    np.testing.assert_array_equal(got, ref)

    with pytest.raises(ValueError, match="requires input"):
        served(img, msk)  # observation missing
