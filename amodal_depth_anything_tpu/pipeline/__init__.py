from .amodal_pipeline import AmodalDepthPipeline, amodal_depth_graph

__all__ = ["AmodalDepthPipeline", "amodal_depth_graph"]
