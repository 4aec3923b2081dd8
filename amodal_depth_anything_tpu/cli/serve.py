"""HTTP serving entry point: the production deployment surface.

    python -m amodal_depth_anything_tpu.cli.serve \
        --serving_state /ckpt/serving   # from AmodalDepthPipeline.save_serving
        --port 8000 --max_batch 8

or build the pipeline from raw checkpoints:

    python -m amodal_depth_anything_tpu.cli.serve \
        --base_ckpt work_dir/ckp/amodal_depth_anything_base.pth \
        --amodal_ckpt work_dir/ckp/amodal_dav2_vitl --dtype bfloat16

DepthFM family with the gated serving recommendations (docs/ROADMAP.md
"THE SERVING MENU" — trained-proxy quality-gate PASS points):

    python -m amodal_depth_anything_tpu.cli.serve --family depthfm \
        --depthfm_ckpt depthfm-v1.ckpt --vae_ckpt sd_vae.safetensors \
        --deep_cache 2,2        # +21% throughput, 80 ms b1 p50
    # latency-lever alternative: --int8 wo (weight-only UNet+VAE)

Stdlib-only (ThreadingHTTPServer): concurrent POSTs are coalesced by
`pipeline.MicroBatcher` into the ONE compiled batch shape — the device
sees full static batches no matter how requests arrive. The reference
has no serving layer (its `infer.py` is a one-shot script; `app.py` is a
Gradio demo).

API:
  GET  /healthz              -> {"status": "ok", "dispatches": N}
  POST /v1/amodal_depth      body {"image": <b64 png/jpg>, "mask": <b64 png>}
       -> {"base_depth": <b64 u16 png>, "blended_depth": <b64 u16 png>,
           "size": S}   (depth quantized [0,1] -> uint16, the repo's
                         16-bit output convention)
  POST /v1/depthfm_depth     (--family depthfm) body {"image", "mask",
       "observation": <b64 u16 png, depth in [0,1]>}
       -> {"depth": <b64 u16 png>, "size": S}
Inputs are host-resized to the pipeline's square `size` (image bilinear,
mask nearest — the reference's own preprocessing geometry) so every
request rides the same compiled program.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["build_parser", "build_server", "main"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU amodal-depth HTTP server")
    p.add_argument("--family", type=str, default="amodal",
                   choices=["amodal", "depthfm"],
                   help="amodal = discriminative AmodalDepthPipeline; "
                        "depthfm = generative DepthFMPipeline")
    p.add_argument("--serving_state", type=str, default=None,
                   help="Dir from <pipeline>.save_serving (restores the "
                        "exact optimized state — no recalibration).")
    p.add_argument("--artifact", type=str, default=None,
                   help="AOT program artifact dir from "
                        "--export_artifact / pipeline.aot: serve the "
                        "exported StableHLO program (no tracing); params "
                        "come from --serving_state.")
    p.add_argument("--export_artifact", type=str, default=None,
                   help="build the pipeline, jax.export its "
                        "fused program at batch --max_batch and the "
                        "serve input shape, write the artifact dir, and "
                        "exit (pair with --serving_state on replicas).")
    p.add_argument("--random", action="store_true",
                   help="Seeded random tiny-preset weights — serve without "
                        "checkpoints (demo/smoke mode)")
    p.add_argument("--base_ckpt", type=str, default=None)
    p.add_argument("--amodal_ckpt", type=str, default=None)
    p.add_argument("--depthfm_ckpt", type=str, default=None,
                   help="(depthfm) torch depthfm-v1-style ckpt")
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="(depthfm) diffusers SD VAE weights")
    p.add_argument("--num_steps", type=int, default=4,
                   help="(depthfm) Euler ODE steps")
    p.add_argument("--deep_cache", default=None,
                   help="(depthfm) DeepCache 'interval[,groups]' over the "
                        "Euler steps — opt-in, parity-breaking. The gated "
                        "serving recommendation is '2,2' (trained-proxy "
                        "PASS 0.043, 17.4 vs 14.3 img/s exact on v5e). "
                        "'0' forces it off (overrides a --serving_state "
                        "saved with caching on). Not available in "
                        "--artifact mode (baked at export time).")
    p.add_argument("--int8", default=None, choices=["wo", "dynamic", "ln"],
                   help="opt-in int8 at startup (applied after load — do "
                        "not combine with a --serving_state already saved "
                        "quantized; not available in --artifact mode). "
                        "depthfm family: 'wo' = weight-only UNet+VAE "
                        "(gated PASS, the b1-latency lever), 'dynamic' = "
                        "W8A8 run-time scales (b8 throughput lever; b1 "
                        "latency regresses). amodal family: 'ln' = "
                        "calibration-free LN-bound scales on both trunks "
                        "(gated PASS 0.016, 3.47 vs 3.16 img/s exact). "
                        "The faster calibrated chain needs data — run it "
                        "via the pipeline API and save_serving instead.")
    p.add_argument("--size", type=int, default=None,
                   help="input square size (default: 518 amodal / 512 "
                        "depthfm — the depthfm size must be divisible by "
                        "the VAE factor 8)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    return p


def _b64_png_to_array(data: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(data))))


def _depth_to_b64_png(depth: np.ndarray) -> str:
    from PIL import Image
    u16 = (np.clip(depth, 0.0, 1.0) * 65535.0).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(u16, mode="I;16").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _b64_depth_to_array(data: str, size: int) -> np.ndarray:
    """b64 depth png -> [size,size] float32 [0,1], host-bilinear-resized
    like the image. Scales by the SOURCE bit depth (u16 -> /65535,
    u8 -> /255) so an 8-bit observation isn't silently crushed to ~0."""
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(data)))
    arr = np.asarray(img).astype(np.float32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    denom = 65535.0 if np.asarray(img).dtype.itemsize > 1 else 255.0
    arr = np.clip(arr / denom, 0.0, 1.0)
    res = Image.fromarray(arr).resize((size, size), Image.BILINEAR)
    return np.asarray(res, dtype=np.float32)


def _prep(image: np.ndarray, mask: np.ndarray, size: int):
    """Host-resize to the one compiled square shape (image bilinear,
    mask nearest — reference infer.py:17,84-86 geometry)."""
    from PIL import Image
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    img = np.asarray(Image.fromarray(image[..., :3].astype(np.uint8)).resize(
        (size, size), Image.BILINEAR), dtype=np.float32)
    if mask.ndim == 3:
        mask = mask[..., 0]
    msk = np.asarray(Image.fromarray((mask > 0).astype(np.uint8)).resize(
        (size, size), Image.NEAREST), dtype=np.float32)
    return img, msk


def build_server(pipeline, host: str = "127.0.0.1", port: int = 0, *,
                 max_batch: int = 8, max_delay_ms: float = 5.0,
                 family: str = "amodal") -> ThreadingHTTPServer:
    """Wrap a ready pipeline in a ThreadingHTTPServer + MicroBatcher.
    Caller runs `server.serve_forever()` (or a thread around it) and
    `server.shutdown()`; `server.batcher` exposes dispatch counts.
    `family`: "amodal" (AmodalDepthPipeline, 2 outputs) or "depthfm"
    (DepthFMPipeline image+mask+observation -> depth)."""
    from ..pipeline import MicroBatcher

    batcher = MicroBatcher(pipeline, max_batch=max_batch,
                           max_delay_ms=max_delay_ms)
    size = pipeline.size
    route = "/v1/amodal_depth" if family == "amodal" else "/v1/depthfm_depth"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "dispatches": batcher.dispatches,
                                 "size": size})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != route:
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                image = _b64_png_to_array(req["image"])
                mask = _b64_png_to_array(req["mask"])
                img, msk = _prep(image, mask, size)
                if family == "amodal":
                    base, blended = batcher.infer(img, msk)
                    payload = {"base_depth": _depth_to_b64_png(base),
                               "blended_depth": _depth_to_b64_png(blended)}
                else:
                    obs = _b64_depth_to_array(req["observation"], size)
                    depth = batcher.infer(img, msk, obs)
                    payload = {"depth": _depth_to_b64_png(depth)}
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            payload["size"] = size
            self._json(200, payload)

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon TPU plugin ignores the env var; force it (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..pipeline import AmodalDepthPipeline, DepthFMPipeline
    if args.size is None:
        if args.random:
            args.size = 32 if args.family == "depthfm" else 56
        else:
            args.size = 512 if args.family == "depthfm" else 518
    if args.family == "depthfm" and args.size % 8 != 0:
        raise SystemExit(f"--size {args.size} must be divisible by the VAE "
                         f"factor 8 for --family depthfm")
    if args.deep_cache is not None and args.family != "depthfm":
        raise SystemExit("--deep_cache is a depthfm-family knob")
    if args.int8 in ("wo", "dynamic") and args.family != "depthfm":
        raise SystemExit(f"--int8 {args.int8} is a depthfm-family mode; "
                         "the amodal family's data-free mode is 'ln'")
    if args.int8 == "ln" and args.family != "amodal":
        raise SystemExit("--int8 ln (LN-bound scales) is an amodal-family "
                         "mode; depthfm modes are 'wo'/'dynamic'")
    if (args.deep_cache is not None or args.int8) and args.artifact:
        raise SystemExit("--deep_cache/--int8 cannot be applied to a "
                         "pre-compiled --artifact program — pass them to "
                         "the --export_artifact build instead")
    if args.artifact:
        # AOT replica mode: deserialized program + params, no model
        # tracing (pipeline/aot.py). Params ride the serving-state dir.
        from ..pipeline import (ExportedAmodalServing,
                                ExportedDepthFMServing)
        from ..pipeline.serving_ckpt import restore_serving_state
        amodal = args.family == "amodal"
        served = (ExportedAmodalServing if amodal
                  else ExportedDepthFMServing).load(args.artifact)
        if served.hw != (served.size, served.size):
            raise SystemExit(
                f"artifact hw {served.hw} != (size, size) — serve-CLI "
                f"artifacts must be exported at the serve input shape "
                f"(use --export_artifact)")
        if args.max_batch not in served.batches:
            raise SystemExit(f"--max_batch {args.max_batch} not among the "
                             f"artifact's compiled buckets {served.batches}")
        if args.random:
            if amodal:
                rnd = AmodalDepthPipeline.init_random(None, size=served.size)
                served.bind(rnd.params_raw, rnd.params_amodal)
            else:
                served.bind(DepthFMPipeline.init_random(
                    None, size=served.size).params)
        elif args.serving_state:
            trees, _ = restore_serving_state(
                args.serving_state,
                expect_kind="amodal_dav2" if amodal else "depthfm")
            if amodal:
                served.bind(trees["raw"], trees["amodal"])
            else:
                served.bind(trees["params"])
        else:
            raise SystemExit("--artifact needs --serving_state (or "
                             "--random for smoke mode)")
        pipe = served
    elif args.random:
        if args.family == "depthfm":
            pipe = DepthFMPipeline.init_random(None, size=args.size,
                                               num_steps=args.num_steps)
        else:
            pipe = AmodalDepthPipeline.init_random(None, size=args.size)
    elif args.family == "depthfm":
        if args.serving_state:
            pipe = DepthFMPipeline.load_serving(args.serving_state)
        elif args.depthfm_ckpt and args.vae_ckpt:
            pipe = DepthFMPipeline.from_checkpoints(
                args.depthfm_ckpt, args.vae_ckpt, size=args.size,
                num_steps=args.num_steps, dtype=jnp.dtype(args.dtype))
        else:
            raise SystemExit(
                "need --serving_state or --depthfm_ckpt/--vae_ckpt")
    elif args.serving_state:
        pipe = AmodalDepthPipeline.load_serving(args.serving_state)
    elif args.base_ckpt and args.amodal_ckpt:
        pipe = AmodalDepthPipeline.from_checkpoints(
            args.base_ckpt, args.amodal_ckpt, size=args.size,
            dtype=jnp.dtype(args.dtype))
    else:
        raise SystemExit("need --serving_state or --base_ckpt/--amodal_ckpt")

    if not args.artifact:
        # serving knobs (all lazily consumed at first-call trace time, so
        # a post-construction override is safe): DeepCache splices into
        # the Euler loop, int8 rewrites the param tree before any compile
        if args.deep_cache is not None:
            from ..ops.ddim import parse_deep_cache
            pipe.deep_cache = parse_deep_cache(args.deep_cache)
        if args.int8 in ("wo", "dynamic"):
            pipe.quantize_int8(weight_only=(args.int8 == "wo"))
        elif args.int8 == "ln":
            # calibration-free LN-bound scales on both trunks — the
            # data-free gated operating point (serving menu: PASS 0.016)
            pipe.quantize_int8(base=True, amodal=True)

    if args.export_artifact:
        from ..pipeline import save_amodal_artifact, save_depthfm_artifact
        save_fn = (save_amodal_artifact if args.family == "amodal"
                   else save_depthfm_artifact)
        meta = save_fn(
            pipe, args.export_artifact, batches=(args.max_batch,),
            hw=(pipe.size, pipe.size))
        print(f"artifact written to {args.export_artifact} "
              f"(platforms={meta['platforms']}, batches={meta['batches']})",
              flush=True)
        return

    server = build_server(pipe, args.host, args.port,
                          max_batch=args.max_batch,
                          max_delay_ms=args.max_delay_ms, family=args.family)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(size={pipe.size}, max_batch={args.max_batch})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.batcher.close()


if __name__ == "__main__":
    main()
