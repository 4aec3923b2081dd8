"""Interactive demo (reference `app.py:295-340` contract).

Two mask modes (reference `app.py:127-229`):
  * `amodal_mask` — the user supplies/draws the amodal mask; fully
    supported here: base DAV2 depth + guided AmodalDAv2 + linear-regression
    rescale of the prediction to the base depth over the visible region
    (`app.py:249-265`) + median-filter blend.
  * `prompt_points` — SAM point prompts -> pix2gestalt amodal completion ->
    RMBG matting (`app.py:101-124`). Requires the heuristics model stack
    (`amodal_depth_anything_tpu.heuristics`); raises with a clear message
    until those checkpoints are provided.

Gradio is optional in this image; `build_demo()` gates the import and
`main()` falls back to a dependency-free plain-HTTP demo
(`build_http_demo`, stdlib http.server + a canvas mask editor) serving
the same reference `app.py:295-340` flow on the same port, so the demo
is launchable everywhere. `predict_amodal_depth` stays importable
headlessly for programmatic use.
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["AmodalDepthApp", "build_demo", "build_http_demo", "main"]


class AmodalDepthApp:
    def __init__(self, pipeline, heuristics=None):
        """pipeline: `AmodalDepthPipeline`; heuristics: optional
        `heuristics.MaskHeuristics` (SAM + pix2gestalt + matting)."""
        self.pipeline = pipeline
        self.heuristics = heuristics

    def predict_amodal_depth(self, image_rgb: np.ndarray, mask: np.ndarray,
                             mask_type: str = "amodal_mask"):
        """image_rgb: [H,W,3] uint8 (RGB); mask: [H,W] (amodal mask for
        'amodal_mask'; point/visible hints for 'prompt_points').

        Returns (base_colored, amodal_colored, blended_depth)."""
        import cv2
        import jax.numpy as jnp

        from ..ops.resize import resize_nearest
        from ..utils.alignment import align_depth_least_square_np
        from ..utils.image import colorize_depth, highlight_target

        if mask_type == "prompt_points":
            if self.heuristics is None:
                raise RuntimeError(
                    "prompt_points mode needs the SAM + pix2gestalt "
                    "heuristics stack; construct AmodalDepthApp with "
                    "heuristics=MaskHeuristics.from_checkpoints(...) "
                    "or use mask_type='amodal_mask'")
            mask = self.heuristics.amodal_mask_from_points(image_rgb, mask)
        elif mask_type != "amodal_mask":
            raise ValueError(f"unknown mask_type: {mask_type!r}")

        base, blended = self.pipeline(image_rgb, (mask > 0).astype(np.float32))

        size = self.pipeline.size
        mask_s = np.asarray(resize_nearest(
            jnp.asarray(mask[None, :, :, None], jnp.float32),
            size=(size, size)))[0, :, :, 0]
        visible = mask_s <= 0
        # rescale prediction to base depth over the visible region
        # (reference app.py:214-216,249-265)
        blended_aligned, _s, _t = align_depth_least_square_np(
            base, blended, visible)
        blended_aligned = np.clip(blended_aligned, 0.0, 1.0)

        h, w = image_rgb.shape[:2]
        mask_u8 = (mask_s > 0).astype(np.uint8) * 255

        def render(depth, highlight):
            colored = (colorize_depth(depth) * 255).astype(np.uint8)
            if highlight:
                colored = highlight_target(colored, mask_u8)
            return cv2.resize(colored, (w, h),
                              interpolation=cv2.INTER_NEAREST)

        return render(base, False), render(blended_aligned, True), \
            blended_aligned


def build_demo(app: AmodalDepthApp):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; use "
            "AmodalDepthApp.predict_amodal_depth programmatically") from e

    def run(editor_value, mask_type):
        image = editor_value["background"][..., :3]
        layers = editor_value.get("layers") or []
        mask = np.zeros(image.shape[:2], np.float32)
        for layer in layers:
            mask = np.maximum(mask, (layer[..., -1] > 0).astype(np.float32))
        base, amodal, _ = app.predict_amodal_depth(image, mask, mask_type)
        return base, amodal

    with gr.Blocks(title="Amodal Depth Anything (TPU)") as demo:
        gr.Markdown("## Amodal Depth Anything — TPU-native demo")
        with gr.Row():
            editor = gr.ImageEditor(label="image + drawn amodal mask")
            with gr.Column():
                base_out = gr.Image(label="base depth")
                amodal_out = gr.Image(label="amodal depth")
        mask_type = gr.Radio(["amodal_mask", "prompt_points"],
                             value="amodal_mask", label="mask mode")
        gr.Button("Predict").click(run, [editor, mask_type],
                                   [base_out, amodal_out])
    return demo


_DEMO_HTML = """<!doctype html>
<html><head><title>Amodal Depth Anything (TPU)</title></head>
<body style="font-family:sans-serif;max-width:960px;margin:2em auto">
<h2>Amodal Depth Anything &mdash; TPU-native demo</h2>
<p>Pick an image, paint the amodal mask on it, hit Predict.</p>
<input type="file" id="file" accept="image/*">
<label>mode <select id="mode"><option>amodal_mask</option>
<option>prompt_points</option></select></label>
<button onclick="predict()">Predict</button>
<div><canvas id="cv" style="border:1px solid #888;cursor:crosshair">
</canvas></div>
<div id="out"></div>
<script>
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
let img = null, drawing = false;
const mask = document.createElement('canvas'), mctx = mask.getContext('2d');
document.getElementById('file').onchange = e => {
  img = new Image();
  img.onload = () => { cv.width = mask.width = img.width;
    cv.height = mask.height = img.height; ctx.drawImage(img, 0, 0); };
  img.src = URL.createObjectURL(e.target.files[0]);
};
cv.onmousedown = () => drawing = true;
cv.onmouseup = () => drawing = false;
cv.onmousemove = e => {
  if (!drawing) return;
  const r = cv.getBoundingClientRect();
  const x = e.clientX - r.left, y = e.clientY - r.top;
  for (const c of [ctx, mctx]) { c.fillStyle = 'rgba(255,0,0,0.8)';
    c.beginPath(); c.arc(x, y, 8, 0, 7); c.fill(); }
};
async function predict() {
  const body = JSON.stringify({
    image: cv.toDataURL().split(',')[1],
    mask: mask.toDataURL().split(',')[1],
    mask_type: document.getElementById('mode').value});
  const resp = await fetch('/predict', {method: 'POST', body});
  const out = await resp.json();
  document.getElementById('out').innerHTML =
    '<h3>base</h3><img src="data:image/png;base64,' + out.base +
    '"><h3>amodal</h3><img src="data:image/png;base64,' + out.amodal + '">';
}
</script></body></html>
"""


def build_http_demo(app: AmodalDepthApp, *, host="127.0.0.1", port=7860):
    """Dependency-free fallback demo: the same predict flow as the Gradio
    UI behind a stdlib ThreadingHTTPServer. GET / serves a canvas mask
    editor; POST /predict takes JSON {image, mask: base64 PNG, mask_type}
    and returns JSON {base, amodal: base64 PNG}. Returns the server
    (caller runs serve_forever / shutdown)."""
    import base64
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    def _png(arr: np.ndarray) -> str:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, _DEMO_HTML.encode(), "text/html")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                image = np.asarray(Image.open(io.BytesIO(
                    base64.b64decode(req["image"]))).convert("RGB"))
                mask_img = Image.open(io.BytesIO(
                    base64.b64decode(req["mask"])))
                mask = np.asarray(mask_img.convert("L")).astype(np.float32)
                if "A" in mask_img.getbands():  # painted alpha layer
                    alpha = np.asarray(mask_img)[..., -1]
                    mask = np.maximum(mask, alpha.astype(np.float32))
                base, amodal, _ = app.predict_amodal_depth(
                    image, mask, req.get("mask_type", "amodal_mask"))
                body = json.dumps({"base": _png(base),
                                   "amodal": _png(amodal)}).encode()
                self._send(200, body, "application/json")
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._send(500, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def _build_heuristics(args):
    """Heuristics stack for prompt_points mode, or None. Knob application
    (DeepCache config, weight-only int8) happens BEFORE the first call —
    the p2g jit is a cached property keyed on the config."""
    if args.heur_serving is None and not (
            args.sam_ckpt or args.p2g_ckpt or args.vae_ckpt
            or args.clip_ckpt):
        if args.p2g_deep_cache is not None or args.p2g_int8:
            raise SystemExit("--p2g_deep_cache/--p2g_int8 require the "
                             "heuristics stack (--sam_ckpt/--p2g_ckpt/"
                             "--vae_ckpt/--clip_ckpt or --heur_serving)")
        return None
    from ..heuristics import MaskHeuristics
    if args.heur_serving is not None:
        mh = MaskHeuristics.load_serving(args.heur_serving)
    else:
        missing = [f for f in ("sam_ckpt", "p2g_ckpt", "vae_ckpt",
                               "clip_ckpt") if getattr(args, f) is None]
        if missing:
            raise SystemExit("prompt_points mode needs all four stack "
                             f"checkpoints; missing --{' --'.join(missing)}")
        mh = MaskHeuristics.from_checkpoints(
            args.sam_ckpt, args.p2g_ckpt, args.vae_ckpt, args.clip_ckpt,
            rmbg_ckpt=args.rmbg_ckpt)
    if args.p2g_deep_cache is not None:
        import dataclasses

        from ..ops.ddim import parse_deep_cache
        mh.p2g_cfg = dataclasses.replace(
            mh.p2g_cfg,
            ddim_deep_cache=parse_deep_cache(args.p2g_deep_cache))
    if args.p2g_int8:
        mh.quantize_p2g_int8()  # weight_only=True default — the gated mode
    return mh


def main(argv=None):
    p = argparse.ArgumentParser(description="Amodal depth demo "
                                            "(Gradio, or plain HTTP "
                                            "fallback when absent)")
    p.add_argument("--base_ckpt", type=str,
                   default="work_dir/ckp/amodal_depth_anything_base.pth")
    p.add_argument("--amodal_ckpt", type=str,
                   default="work_dir/ckp/amodal_dav2_vitl")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--http", action="store_true",
                   help="force the plain-HTTP demo even if gradio exists")
    # prompt_points mode (reference app.py:101-124): SAM point prompts ->
    # pix2gestalt completion -> matting. Enabled by the heuristics
    # checkpoints (or a save_serving dir — the fast-restore path).
    p.add_argument("--sam_ckpt", default=None)
    p.add_argument("--p2g_ckpt", default=None)
    p.add_argument("--vae_ckpt", default=None,
                   help="SD VAE weights for the pix2gestalt stack")
    p.add_argument("--clip_ckpt", default=None)
    p.add_argument("--rmbg_ckpt", default=None)
    p.add_argument("--heur_serving", default=None,
                   help="MaskHeuristics.save_serving dir — restores the "
                        "ready (cast/quantized) stack instead of the four "
                        "raw checkpoints")
    p.add_argument("--p2g_deep_cache", default=None,
                   help="DeepCache 'interval[,groups]' over the p2g DDIM "
                        "steps — '5' is the gated demo recommendation "
                        "(trained-proxy PASS; 1.7x per completion)")
    p.add_argument("--p2g_int8", action="store_true",
                   help="weight-only int8 p2g UNet (gated PASS; with "
                        "--p2g_deep_cache 5 = the recommended 2.17 s "
                        "completion stack)")
    args = p.parse_args(argv)

    from ..pipeline import AmodalDepthPipeline

    # heuristics first: its flag validation (and SystemExit messages)
    # must fire before the multi-GB pipeline checkpoint load
    heuristics = _build_heuristics(args)
    pipe = AmodalDepthPipeline.from_checkpoints(args.base_ckpt,
                                                args.amodal_ckpt)
    app = AmodalDepthApp(pipe, heuristics=heuristics)
    if not args.http:
        try:
            build_demo(app).launch(server_port=args.port)
            return
        except RuntimeError:
            print("gradio not installed — falling back to plain HTTP")
    server = build_http_demo(app, port=args.port)
    print(f"demo on http://127.0.0.1:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
