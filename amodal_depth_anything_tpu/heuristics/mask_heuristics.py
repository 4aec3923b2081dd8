"""SAM + pix2gestalt amodal-mask derivation (the demo's model-heuristics)."""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..models.clip_vit import (CLIPVisionConfig, clip_image_embed,
                               init_clip_vision)
from ..models.sam import SAMConfig, init_sam, sam_encode_image, \
    sam_predict_masks
from ..models.unet_ldm import UNetConfig, apply_unet, init_unet
from ..models.vae import SD_VAE, VAEConfig, init_vae, vae_decode, \
    vae_encode_mode
from ..models.rmbg import RMBGConfig, apply_rmbg
from ..ops.ddim import ddim_sample
from ..ops.resize import resize2d

__all__ = ["Pix2GestaltConfig", "MaskHeuristics", "make_rmbg_matting_fn",
           "get_points_from_components"]

SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class Pix2GestaltConfig:
    """pix2gestalt SD checkpoint hparams (SD-1.5 UNet body, CLIP image
    embedding as 1-token cross-attention context, dim 768).

    `cond_mode` is the channel-concat conditioning layout — the exact
    layout is only provable against the real `epoch=000005.ckpt`
    (network-blocked), so it is AUTO-DETECTED from the checkpoint's
    conv-in shape at convert time (`p2g_cfg_from_ckpt`); both candidates
    are implemented:

    * `"image+mask"` (default; conv-in 12 = noisy 4 + image latent 4 +
      visible-mask-render latent 4): the reference demo passes the
      binary visible mask as a separate 3-channel image to
      `run_pix2gestalt(model, dev, input_image, rgb_visible_mask, ...)`
      (reference `app.py:113-122`), and the training config is named
      `sd-finetune-pix2gestalt-c_concat-256.yaml` (`app.py:55`) — two
      VAE-encoded conditioning images concatenated.
    * `"image"` (conv-in 8 = noisy 4 + conditioning latent 4):
      zero123-style single-image conditioning, with the visible object
      entering via the CLIP context only.
    """
    image_size: int = 256
    context_dim: int = 768
    model_channels: int = 320
    channel_mult: tuple = (1, 2, 4, 4)
    num_heads: int = 8
    ddim_steps: int = 100
    guidance_scale: float = 1.5
    cond_mode: str = "image+mask"
    # Which image feeds CLIP — the one semantic choice a shape check
    # CANNOT settle (ROADMAP item 2): "auto" = occluded image for
    # image+mask (the visible object enters via the mask latent),
    # masked object for zero123-style "image". On checkpoint day run
    # `verify_checkpoints --rehearse` (clip-divergence row) then both
    # explicit settings against the published demo output; the
    # non-matching one is mechanically excluded.
    clip_input: str = "auto"  # "auto" | "occluded" | "masked_object"
    # DeepCache (interval, shallow groups) over the DDIM steps — opt-in,
    # parity-breaking; None = every step runs the full UNet
    ddim_deep_cache: tuple | None = None

    @property
    def unet(self) -> UNetConfig:
        cond_ch = 8 if self.cond_mode == "image+mask" else 4
        return UNetConfig(in_channels=4 + cond_ch,
                          context_dim=self.context_dim,
                          model_channels=self.model_channels,
                          channel_mult=self.channel_mult,
                          num_heads=self.num_heads,
                          use_linear_in_transformer=False)


def make_rmbg_matting_fn(params, cfg: RMBGConfig = RMBGConfig(),
                         input_size: int = 1024, threshold: float = 0.5):
    """Build the RMBG-1.4 neural matting hook (reference app.py:164-169).

    The returned fn maps a completion render [H,W,3] float in [0,1] to a
    binary [H,W] float amodal mask: resize to the net's square input
    (RMBG-1.4 runs at 1024), jitted ISNet forward, resize the alpha back,
    threshold. Use `input_size` ≤ 256 with tiny configs in tests."""
    run = jax.jit(functools.partial(apply_rmbg, params, cfg))

    def matting_fn(completion: np.ndarray) -> np.ndarray:
        import cv2

        h, w = completion.shape[:2]
        img = cv2.resize(completion.astype(np.float32),
                         (input_size, input_size),
                         interpolation=cv2.INTER_LINEAR)
        alpha = np.asarray(run(jnp.asarray(img[None])))[0, ..., 0]
        alpha = cv2.resize(alpha, (w, h), interpolation=cv2.INTER_LINEAR)
        return (alpha > threshold).astype(np.float32)

    # expose construction state so MaskHeuristics.save_serving can
    # persist the hook (the closure itself is not serializable)
    matting_fn.rmbg_params = params
    matting_fn.rmbg_cfg = cfg
    matting_fn.rmbg_input_size = input_size
    matting_fn.rmbg_threshold = threshold
    return matting_fn


def get_points_from_components(mask_u8: np.ndarray,
                               small_component_thresh: int = 100,
                               grid_step: int = 10) -> np.ndarray:
    """Point prompts from connected components (reference app.py:77-99):
    centroids for small components, a sparse grid for large ones."""
    import cv2

    num_labels, labels, stats, centroids = cv2.connectedComponentsWithStats(
        mask_u8, connectivity=8)
    points = []
    for i in range(1, num_labels):
        if stats[i, cv2.CC_STAT_AREA] < small_component_thresh:
            points.append([int(centroids[i][0]), int(centroids[i][1])])
        else:
            ys, xs = np.where(labels == i)
            for y in range(ys.min(), ys.max(), grid_step):
                for x in range(xs.min(), xs.max(), grid_step):
                    if labels[y, x] == i:
                        points.append([x, y])
    return np.asarray(points, np.float32)


class MaskHeuristics:
    """Derives amodal masks from point prompts (reference app flow)."""

    def __init__(self, sam_params, sam_cfg: SAMConfig, p2g_params,
                 p2g_cfg: Pix2GestaltConfig,
                 clip_cfg: CLIPVisionConfig | None = None,
                 vae_cfg: VAEConfig = SD_VAE, matting_fn=None,
                 max_points: int = 64):
        self.sam_params = sam_params
        self.sam_cfg = sam_cfg
        self.p2g_params = p2g_params  # {"unet", "vae", "clip", "uncond_ctx"}
        self.p2g_cfg = p2g_cfg
        self.clip_cfg = clip_cfg or CLIPVisionConfig()
        self.vae_cfg = vae_cfg
        self.matting_fn = matting_fn  # optional RMBG-style matting hook
        self.max_points = max_points
        # serving compute dtype for the SAM image encoder + p2g DDIM
        # path (prompt coords / output logits stay f32). f32 = the
        # reference-parity default; `cast_to(jnp.bfloat16)` is the
        # opt-in serving mode (same ladder policy as the flagship
        # pipeline's bf16 default — gate with the trained p2g proxy).
        self.compute_dtype = jnp.float32

    def cast_to(self, dtype) -> None:
        """Cast the float param leaves (SAM + p2g stacks) and the image
        inputs to `dtype`. bf16 halves the bytes the param-read-bound
        100-step DDIM loop streams AND halves the serving-checkpoint
        restore transfer. Call BEFORE `quantize_p2g_int8` — on an
        already-quantized tree the float dequant scales would be cast
        too (int8 kernels themselves are untouched). Rebuilds the
        cached jit programs."""
        dtype = jnp.dtype(dtype)

        def cast_tree(t):
            return jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

        # jit the walks: eager per-leaf casts pay ~0.8 s/op dispatch
        # through the tunnel
        self.sam_params = jax.jit(cast_tree)(self.sam_params)
        self.p2g_params = jax.jit(cast_tree)(self.p2g_params)
        self.compute_dtype = dtype
        self.__dict__.pop("_sam_jit", None)
        self.__dict__.pop("_p2g_jit", None)

    # ------------------------------------------------------------- builders

    @classmethod
    def from_checkpoints(cls, sam_ckpt: str, p2g_ckpt: str, vae_ckpt: str,
                         clip_ckpt: str, rmbg_ckpt: str | None = None, **kw):
        """Load the real model stack: SAM `sam_vit_h.pth`, pix2gestalt LDM
        ckpt (`epoch=000005.ckpt`), diffusers SD VAE, HF CLIP vision, and
        (optionally) briaai/RMBG-1.4 as the neural matting hook — the
        reference demo's full model-heuristics stack (app.py:34-60).

        All torch files, converted on load (`convert/` package)."""
        import torch

        from ..convert.heuristics_convert import (convert_clip_vision,
                                                  convert_pix2gestalt_unet,
                                                  p2g_cfg_from_ckpt)
        from ..convert.depthfm_convert import convert_sd_vae
        from ..convert.rmbg_convert import convert_rmbg
        from ..convert.sam_convert import convert_sam
        from ..convert.torch_to_jax import load_state_dict

        if rmbg_ckpt is not None and "matting_fn" not in kw:
            kw["matting_fn"] = make_rmbg_matting_fn(
                convert_rmbg(load_state_dict(rmbg_ckpt)))

        sam_cfg = SAMConfig()
        sam_params = convert_sam(load_state_dict(sam_ckpt), sam_cfg)
        ldm = torch.load(p2g_ckpt, map_location="cpu", weights_only=False)
        ldm_sd = {k: v.numpy() for k, v in ldm["state_dict"].items()}
        # conditioning layout + hparams come from the checkpoint itself
        # (conv-in 8 vs 12, cc_projection presence — see Pix2GestaltConfig)
        p2g_cfg, cc = p2g_cfg_from_ckpt(ldm_sd)
        p2g_params = {
            "unet": convert_pix2gestalt_unet(ldm_sd, p2g_cfg.unet),
            "vae": convert_sd_vae(load_state_dict(vae_ckpt)),
            "clip": convert_clip_vision(load_state_dict(clip_ckpt)),
            "uncond_ctx": jnp.zeros((1, 1, p2g_cfg.context_dim),
                                    jnp.float32),
        }
        if cc is not None:
            p2g_params["cc_projection"] = jax.tree.map(jnp.asarray, cc)
        return cls(sam_params, sam_cfg, p2g_params, p2g_cfg, **kw)

    @classmethod
    def init_random(cls, key, *, tiny: bool = False, **kw):
        """Random-weight stack (tests / shape-checking; real use goes via
        the converters once checkpoints are available)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if tiny:
            sam_cfg = SAMConfig(img_size=64, embed_dim=32, depth=2,
                                num_heads=2, window_size=2,
                                global_blocks=(1,), out_chans=32,
                                decoder_dim=32, decoder_heads=2)
            p2g_cfg = Pix2GestaltConfig(image_size=32, context_dim=32,
                                        model_channels=32,
                                        channel_mult=(1, 2), num_heads=2,
                                        ddim_steps=2)
            clip_cfg = CLIPVisionConfig(image_size=32, patch_size=8,
                                        width=32, depth=2, num_heads=2,
                                        projection_dim=32)
            vae_cfg = VAEConfig(block_out_channels=(16, 32),
                                layers_per_block=1)
        else:
            sam_cfg, p2g_cfg = SAMConfig(), Pix2GestaltConfig()
            clip_cfg, vae_cfg = CLIPVisionConfig(), SD_VAE
        sam_params = init_sam(k1, sam_cfg)
        p2g_params = {
            "unet": init_unet(k2, p2g_cfg.unet),
            "vae": init_vae(k3, vae_cfg),
            "clip": init_clip_vision(k4, clip_cfg),
            "uncond_ctx": jnp.zeros((1, 1, p2g_cfg.context_dim), jnp.float32),
        }
        return cls(sam_params, sam_cfg, p2g_params, p2g_cfg,
                   clip_cfg=clip_cfg, vae_cfg=vae_cfg, **kw)

    # ------------------------------------------------------------------ SAM

    def sam_visible_mask(self, image_rgb: np.ndarray,
                         points_xy: np.ndarray) -> np.ndarray:
        """image_rgb: [H,W,3] uint8; points_xy: [P,2] pixel coords.

        Returns a [H,W] bool visible-object mask (best single mask)."""
        import cv2

        s = self.sam_cfg.img_size
        h, w = image_rgb.shape[:2]
        img = cv2.resize(image_rgb, (s, s)).astype(np.float32)
        img = (img - np.asarray(SAM_PIXEL_MEAN)) / np.asarray(SAM_PIXEL_STD)

        pts = np.zeros((1, self.max_points, 2), np.float32)
        lbl = np.full((1, self.max_points), -1.0, np.float32)
        n = min(len(points_xy), self.max_points)
        if n == 0:
            raise ValueError("no point prompts")
        pts[0, :n, 0] = points_xy[:n, 0] / w
        pts[0, :n, 1] = points_xy[:n, 1] / h
        lbl[0, :n] = 1.0

        # image in compute dtype (the encoder is ~95% of SAM's FLOPs);
        # point coords stay f32 — bf16's 8-bit mantissa would quantize
        # 1024-px coordinates to ~4 px
        masks, iou = self._sam_jit(self.sam_params,
                                   jnp.asarray(img[None],
                                               self.compute_dtype),
                                   jnp.asarray(pts), jnp.asarray(lbl))
        # single-mask output = mask token 0 (reference multimask_output=False)
        logits = np.asarray(masks, np.float32)[0, 0]
        mask = cv2.resize(logits, (w, h),
                          interpolation=cv2.INTER_LINEAR) > 0
        return mask

    @functools.cached_property
    def _sam_jit(self):
        cfg = self.sam_cfg

        @jax.jit
        def run(params, img, pts, lbl):
            emb = sam_encode_image(params, cfg, img)
            return sam_predict_masks(params, cfg, emb, pts, lbl)

        return run

    # ----------------------------------------------------------- pix2gestalt

    @functools.cached_property
    def _p2g_jit(self):
        p2g_cfg = self.p2g_cfg
        clip_cfg = self.clip_cfg
        vae_cfg = self.vae_cfg

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def run(params, rng, image01, visible_mask01, num_steps):
            # channel-concat conditioning (layout per cfg.cond_mode —
            # checkpoint-detected, see Pix2GestaltConfig):
            #   image+mask: VAE(image) ++ VAE(rgb visible-mask render)
            #               (reference app.py:113-122 passes the binary
            #                mask as a separate 3-channel image)
            #   image:      VAE(image) only (zero123-style)
            img_latent = vae_encode_mode(params["vae"],
                                         image01 * 2.0 - 1.0, vae_cfg)
            if p2g_cfg.cond_mode == "image+mask":
                mask_rgb = jnp.broadcast_to(visible_mask01, image01.shape)
                mask_latent = vae_encode_mode(params["vae"],
                                              mask_rgb * 2.0 - 1.0, vae_cfg)
                cond_latent = jnp.concatenate([img_latent, mask_latent],
                                              axis=-1)
                default_clip = "occluded"  # the visible object already
                # enters via the mask latent
            else:
                cond_latent = img_latent
                default_clip = "masked_object"
            if p2g_cfg.clip_input not in ("auto", "occluded",
                                          "masked_object"):
                # fail loudly: a typo'd value would silently fall through
                # to masked_object and defeat the checkpoint-day A/B this
                # knob exists for
                raise ValueError(
                    f"clip_input={p2g_cfg.clip_input!r} — expected "
                    f"'auto' | 'occluded' | 'masked_object'")
            clip_choice = (default_clip if p2g_cfg.clip_input == "auto"
                           else p2g_cfg.clip_input)
            clip_in_img = (image01 if clip_choice == "occluded"
                           else image01 * visible_mask01)
            clip_in = resize2d(clip_in_img, size=(clip_cfg.image_size,
                                                  clip_cfg.image_size),
                               method="bilinear")
            clip_mean = jnp.asarray((0.48145466, 0.4578275, 0.40821073),
                                    image01.dtype)
            clip_std = jnp.asarray((0.26862954, 0.26130258, 0.27577711),
                                   image01.dtype)
            ctx = clip_image_embed(params["clip"], clip_cfg,
                                   (clip_in - clip_mean) / clip_std)
            ctx = ctx[:, None, :]  # single conditioning token
            if "cc_projection" in params:
                # zero123-lineage checkpoints project [CLIP 768 ++ pose 4]
                # -> 768; pix2gestalt has no pose, so the slots are zero
                cc = params["cc_projection"]
                pad = jnp.zeros(ctx.shape[:-1] + (cc["w"].shape[0]
                                                  - ctx.shape[-1],),
                                ctx.dtype)
                ctx = jnp.concatenate([ctx, pad], axis=-1) \
                    @ cc["w"].astype(ctx.dtype)
                if "b" in cc:
                    ctx = ctx + cc["b"].astype(ctx.dtype)
            uncond = jnp.broadcast_to(
                params["uncond_ctx"].astype(ctx.dtype),
                ctx.shape)
            # CFG uncond branch zeros BOTH conditionings (crossattn ctx
            # and the concat latent), matching zero123-style samplers
            zero_latent = jnp.zeros_like(cond_latent)

            def eps_fn(ctx_tokens, concat_latent):
                def f(x, t, **dc):
                    return apply_unet(params["unet"], p2g_cfg.unet, x,
                                      t.astype(x.dtype),
                                      context=concat_latent,
                                      context_ca=ctx_tokens, **dc)
                return f

            # batched CFG: stack cond/uncond contexts so each DDIM step is
            # ONE UNet call at batch 2B (exact — no cross-sample ops in the
            # UNet; the 100-step loop is launch-bound at batch 1)
            ctx2 = jnp.concatenate([ctx, uncond], axis=0)
            cond2 = jnp.concatenate([cond_latent, zero_latent], axis=0)

            def joint(x2, t2, **dc):
                return apply_unet(params["unet"], p2g_cfg.unet, x2,
                                  t2.astype(x2.dtype), context=cond2,
                                  context_ca=ctx2, **dc)

            latent_hw = cond_latent.shape[1]
            z = ddim_sample(
                eps_fn(ctx, cond_latent), rng,
                (image01.shape[0], latent_hw, latent_hw, 4),
                num_steps=num_steps,
                guidance_scale=p2g_cfg.guidance_scale,
                uncond_fn=eps_fn(uncond, zero_latent), joint_fn=joint,
                deep_cache=p2g_cfg.ddim_deep_cache, dtype=image01.dtype)
            decoded = vae_decode(params["vae"], z, vae_cfg)
            return jnp.clip((decoded + 1.0) / 2.0, 0.0, 1.0)

        return run

    def quantize_p2g_int8(self, *, weight_only: bool = True,
                          bits: int = 8) -> None:
        """Opt-in int8 for the pix2gestalt UNet (parity-breaking serving
        knob, same ladder policy as the trunk/DepthFM int8 paths).

        The 100-step DDIM loop re-reads every UNet param each step and
        is PARAM-READ-BOUND (batched CFG measured neutral on v5e for
        exactly this reason; DeepCache's 1.7x comes from skipping the
        deep levels' param traffic). `weight_only=True` (default) stores
        int8 weights dequantized on the fly — halves the bytes the loop
        is bound on, no activation-quant error, no per-site amax
        reductions. `weight_only=False` is dynamic W8A8 (int8 MXU rate,
        adds amax reductions per site per step). `bits=4` (weight-only):
        nibble-packed int4 weights — half of W8's bytes on the same
        read-bound loop, larger per-weight quant error (per-group scales,
        gate with the quality proxy). Stacks with `ddim_deep_cache`."""
        from ..ops.quant import quantize_diffusion_int8
        # wide-site thresholds scale with the UNet width so narrow
        # trained proxies quantize proportionally the same sites as the
        # full SD body (a vacuously-unquantized proxy would PASS any gate)
        ws = self.p2g_cfg.model_channels / 320.0
        self.p2g_params = dict(self.p2g_params)
        self.p2g_params["unet"] = jax.jit(
            lambda t: quantize_diffusion_int8(
                t, weight_only=weight_only, bits=bits,
                min_conv_fan=max(64, int(512 * ws)),
                min_lin_dim=max(32, int(256 * ws)))
        )(self.p2g_params["unet"])
        self.__dict__.pop("_p2g_jit", None)  # rebuild the cached program

    def quantize_sam_int8(self, *, weight_only: bool = True,
                          bits: int = 8) -> None:
        """Opt-in weight-only int8 for the SAM stack (encoder + decoder
        linears/convs via the quant-aware `linear`/`conv2d` dispatch).

        The image encoder is one forward per prompt — compute-bound, so
        this is NOT a latency lever like the p2g loop; it exists to
        shrink the bytes a serving checkpoint must push through the
        tunnel at restore (vit-h is ~1.3 GB bf16 -> 0.65 GB int8).
        The decoder's transposed-layout upscale kernels are skipped
        (conv_transpose_same_stride reads `w` raw — it has no quant
        dispatch) along with the tiny mask/iou output heads."""
        from ..ops.quant import quantize_diffusion_int8
        self.sam_params = jax.jit(
            lambda t: quantize_diffusion_int8(
                t, weight_only=weight_only, bits=bits,
                skip_suffixes=("upscale_conv1", "upscale_conv2"))
        )(self.sam_params)
        self.__dict__.pop("_sam_jit", None)

    def save_serving(self, path: str) -> None:
        """Persist the READY-TO-SERVE heuristics stack (post conversion /
        int8 quantization) — same contract as the amodal/depthfm
        pipelines' serving checkpoints (pipeline/serving_ckpt.py): a
        restore skips every converter AND every on-device init program
        (~140 s of the measured 179 s warm first-pixel wall is random-
        weight init dispatch). The RMBG matting hook is persisted when
        present (its params ride on the closure —
        `make_rmbg_matting_fn`)."""
        from ..pipeline.serving_ckpt import save_serving_state

        trees = {"sam": self.sam_params, "p2g": self.p2g_params}
        meta = {
            "kind": "mask_heuristics",
            "sam_cfg": dataclasses.asdict(self.sam_cfg),
            "p2g_cfg": dataclasses.asdict(self.p2g_cfg),
            "clip_cfg": dataclasses.asdict(self.clip_cfg),
            "vae_cfg": dataclasses.asdict(self.vae_cfg),
            "max_points": self.max_points,
            "compute_dtype": str(jnp.dtype(self.compute_dtype)),
        }
        rmbg = getattr(self.matting_fn, "rmbg_params", None)
        if self.matting_fn is not None and rmbg is None:
            # fail loudly: silently dropping a custom hook would make the
            # restored stack fall back to threshold matting with no error
            raise ValueError(
                "matting_fn is not persistable (no rmbg_params — only "
                "make_rmbg_matting_fn hooks serialize); set matting_fn "
                "= None before save_serving and re-attach after load")
        if rmbg is not None:
            trees["rmbg"] = rmbg
            meta["rmbg_cfg"] = dataclasses.asdict(
                self.matting_fn.rmbg_cfg)
            meta["rmbg_input_size"] = self.matting_fn.rmbg_input_size
            meta["rmbg_threshold"] = self.matting_fn.rmbg_threshold
        save_serving_state(path, trees, meta)

    @classmethod
    def load_serving(cls, path: str) -> "MaskHeuristics":
        """Restore a stack saved by `save_serving` — param dtypes kept
        exactly (int8 stays int8, no re-quantization), no converters,
        no init programs."""
        from ..pipeline.serving_ckpt import (cfg_from_dict,
                                             restore_serving_state)

        trees, meta = restore_serving_state(path,
                                            expect_kind="mask_heuristics")
        matting_fn = None
        if "rmbg" in trees:
            matting_fn = make_rmbg_matting_fn(
                trees["rmbg"],
                cfg_from_dict(RMBGConfig, meta["rmbg_cfg"]),
                input_size=int(meta["rmbg_input_size"]),
                threshold=float(meta["rmbg_threshold"]))
        mh = cls(trees["sam"], cfg_from_dict(SAMConfig, meta["sam_cfg"]),
                 trees["p2g"],
                 cfg_from_dict(Pix2GestaltConfig, meta["p2g_cfg"]),
                 clip_cfg=cfg_from_dict(CLIPVisionConfig,
                                        meta["clip_cfg"]),
                 vae_cfg=cfg_from_dict(VAEConfig, meta["vae_cfg"]),
                 matting_fn=matting_fn,
                 max_points=int(meta["max_points"]))
        # bf16 serving states carry their compute dtype (the leaves are
        # already cast in the checkpoint — only the input-cast policy
        # needs restoring)
        mh.compute_dtype = jnp.dtype(meta.get("compute_dtype", "float32"))
        return mh

    def pix2gestalt_completion(self, image_rgb: np.ndarray,
                               visible_mask: np.ndarray,
                               seed: int = 0) -> np.ndarray:
        """256px amodal completion render [H,W,3] in [0,1]."""
        import cv2

        s = self.p2g_cfg.image_size
        img = cv2.resize(image_rgb, (s, s)).astype(np.float32) / 255.0
        m = cv2.resize(visible_mask.astype(np.uint8) * 255, (s, s),
                       interpolation=cv2.INTER_AREA)
        m01 = (m > 127).astype(np.float32)[..., None]
        out = self._p2g_jit(self.p2g_params, jax.random.PRNGKey(seed),
                            jnp.asarray(img[None], self.compute_dtype),
                            jnp.asarray(m01[None], self.compute_dtype),
                            self.p2g_cfg.ddim_steps)
        return np.asarray(out, np.float32)[0]

    # ---------------------------------------------------------------- public

    def amodal_mask_from_points(self, image_rgb: np.ndarray,
                                point_hint_mask: np.ndarray) -> np.ndarray:
        """Full model-heuristics path (reference app.py:127-229):
        point hints -> SAM visible mask -> pix2gestalt completion ->
        amodal-mask extraction. Returns [H,W] float mask."""
        import cv2

        hint_u8 = (np.asarray(point_hint_mask) > 0).astype(np.uint8) * 255
        points = get_points_from_components(hint_u8)
        visible = self.sam_visible_mask(image_rgb, points)
        completion = self.pix2gestalt_completion(image_rgb, visible)

        if self.matting_fn is not None:
            amodal = self.matting_fn(completion)  # e.g. RMBG-1.4
        else:
            # threshold matting fallback: the completed object against the
            # (near-white) pix2gestalt background
            gray = completion.mean(axis=-1)
            amodal = (gray < 0.95).astype(np.float32)
        h, w = image_rgb.shape[:2]
        amodal = cv2.resize(amodal, (w, h), interpolation=cv2.INTER_NEAREST)
        # union with the visible mask: amodal ⊇ visible by construction
        return np.maximum(amodal, visible.astype(np.float32))
