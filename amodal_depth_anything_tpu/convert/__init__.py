from .depthfm_convert import (convert_ldm_unet, convert_sd_vae,
                              load_depthfm_ckpt)
from .torch_to_jax import convert_dav2, infer_dav2_config, load_state_dict

__all__ = ["convert_dav2", "infer_dav2_config", "load_state_dict",
           "convert_ldm_unet", "convert_sd_vae", "load_depthfm_ckpt"]
