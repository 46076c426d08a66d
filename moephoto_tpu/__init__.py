"""MoePhoto-TPU: a TPU-native image/video restoration framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
opteroncx/MoePhoto (reference layout documented in SURVEY.md): chained
restoration steps (denoise, super-resolution, demoire, dehaze, deblur,
retouch, frame interpolation, video SR) over images and streamed video,
behind the same step-JSON/HTTP protocol.

Architecture (TPU-first, not a port):
  - NHWC activations / HWIO weights, bf16 params with fp32 accumulation.
  - Static halo-tile engine with precomputed blend windows and bucketed,
    jit-compiled tile batches (replaces the reference's free-RAM solver,
    ``imageProcess.py:61-155``).
  - ``lax.scan`` streaming runtime for temporal models (replaces the
    generator-based StreamState graphs, ``imageProcess.py:407-537``).
  - Pallas kernels for gather-heavy ops (adaptive 3D LUT, warp).
  - Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` halo
    exchange (the reference is single-GPU only).
"""

__version__ = "0.1.0"

from moephoto_tpu.config import config  # noqa: F401
