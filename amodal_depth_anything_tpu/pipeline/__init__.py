from .amodal_pipeline import AmodalDepthPipeline, amodal_depth_graph
from .depthfm_pipeline import DepthFMPipeline
from .raw_infer import (constrain_to_multiple_of, image2tensor_np,
                        infer_image, keep_aspect_size)
from .server import MicroBatcher

__all__ = ["AmodalDepthPipeline", "DepthFMPipeline", "MicroBatcher",
           "amodal_depth_graph",
           "constrain_to_multiple_of", "image2tensor_np", "infer_image",
           "keep_aspect_size"]
