"""Model-heuristics amodal mask pipeline: SAM -> pix2gestalt -> matting.

TPU re-design of the reference demo's `prompt_points` path
(`app.py:77-124,127-229`): connected-component point selection (host cv2),
SAM visible-object segmentation, pix2gestalt amodal completion at 256 px
(SD UNet conditioned on the image latent + visible-mask latent on
channels, CLIP image embedding by cross-attention; DDIM with
classifier-free guidance scale 1.5 and 100 steps), then amodal-mask
extraction from the completed render (RMBG-1.4 / ISNet neural matting as
in `app.py:164-169` when a checkpoint is given via
`MaskHeuristics.from_checkpoints(rmbg_ckpt=...)` or a custom
`matting_fn`; threshold matting otherwise).

All compute-heavy stages (SAM encoder, SAM decoder, DDIM loop, VAE
decode) are jitted; host code only does point selection and mask
post-processing.
"""

from .mask_heuristics import (MaskHeuristics, Pix2GestaltConfig,
                              get_points_from_components,
                              make_rmbg_matting_fn)

__all__ = ["MaskHeuristics", "Pix2GestaltConfig",
           "get_points_from_components", "make_rmbg_matting_fn"]
