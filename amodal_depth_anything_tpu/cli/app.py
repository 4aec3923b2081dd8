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

Gradio is optional in this image; `build_demo()` gates the import, and
`predict_amodal_depth` is importable headlessly for programmatic use.
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["AmodalDepthApp", "main"]


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


def main(argv=None):
    p = argparse.ArgumentParser(description="Amodal depth Gradio demo")
    p.add_argument("--base_ckpt", type=str,
                   default="work_dir/ckp/amodal_depth_anything_base.pth")
    p.add_argument("--amodal_ckpt", type=str,
                   default="work_dir/ckp/amodal_dav2_vitl")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    from ..pipeline import AmodalDepthPipeline

    pipe = AmodalDepthPipeline.from_checkpoints(args.base_ckpt,
                                                args.amodal_ckpt)
    demo = build_demo(AmodalDepthApp(pipe))
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
