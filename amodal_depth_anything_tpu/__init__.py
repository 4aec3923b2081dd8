"""amodal_depth_anything_tpu: TPU-native amodal depth estimation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
zhyever/Amodal-Depth-Anything (reference at /root/reference): guided
Depth-Anything-V2 (DINOv2 ViT encoder + DPT decoder) for amodal depth
estimation, plus the DepthFM generative branch, training/eval loops,
and data pipeline.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere; convs via XLA `conv_general_dilated`.
  * Resizes are separable matmuls with torch-exact interpolation weights
    (MXU-friendly; exact `align_corners` parity for weight transplant).
  * Attention via a Pallas TPU flash-attention kernel with a pure-XLA
    fallback for CPU/interpret mode.
  * Pure-functional models: params are pytrees; per-depth block params are
    stacked so the transformer trunk runs under `lax.scan`.
  * Data parallel + optional tensor parallel via `jax.sharding.Mesh` and
    NamedSharding; collectives are emitted by XLA, never hand-written.
"""

__version__ = "0.1.0"
