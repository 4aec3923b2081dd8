from .amodal_pipeline import AmodalDepthPipeline, amodal_depth_graph
from .aot import (ExportedAmodalServing, ExportedDepthFMServing,
                  save_amodal_artifact, save_depthfm_artifact)
from .depthfm_pipeline import DepthFMPipeline
from .raw_infer import (constrain_to_multiple_of, image2tensor_np,
                        infer_image, keep_aspect_size)
from .server import MicroBatcher

__all__ = ["AmodalDepthPipeline", "DepthFMPipeline", "MicroBatcher",
           "ExportedAmodalServing", "ExportedDepthFMServing",
           "save_amodal_artifact", "save_depthfm_artifact",
           "amodal_depth_graph",
           "constrain_to_multiple_of", "image2tensor_np", "infer_image",
           "keep_aspect_size"]
