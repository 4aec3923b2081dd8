from .depthfm_convert import (convert_ldm_unet, convert_sd_vae,
                              load_depthfm_ckpt)
from .heuristics_convert import convert_clip_vision, convert_pix2gestalt_unet
from .jo_dpt_convert import convert_jo_dpt
from .rmbg_convert import convert_rmbg
from .sam_convert import convert_sam
from .torch_to_jax import convert_dav2, infer_dav2_config, load_state_dict
from .zoedepth_convert import convert_zoedepth

__all__ = ["convert_dav2", "infer_dav2_config", "load_state_dict",
           "convert_ldm_unet", "convert_sd_vae", "load_depthfm_ckpt",
           "convert_sam", "convert_clip_vision", "convert_pix2gestalt_unet",
           "convert_zoedepth", "convert_rmbg", "convert_jo_dpt"]
