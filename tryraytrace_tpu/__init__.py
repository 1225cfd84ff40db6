"""tryraytrace_tpu — a TPU-native progressive path-tracing framework.

A from-scratch rebuild of the capabilities of ENJOU1224/TryRaytrace
(an interactive CUDA progressive path tracer) designed TPU-first:

- the CUDA megakernel (reference src/renderer.cu:317-760) becomes a
  *wavefront* pipeline: ray generation, threaded (stackless) BVH
  traversal, Moller-Trumbore intersection and PBR shading run as fused
  vectorized stages over SoA ray buffers under one ``jax.jit``;
- the pointer-chasing stack walk becomes a branch-free hit-link /
  miss-link traversal (identical visit order and pruning semantics);
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map``
  (image tiles x sample streams) instead of any host-side threading;
- the host runtime around the compute path (OBJ/PPM parsing, BVH
  build, tonemap) has a native C++ implementation (csrc/) with NumPy
  fallbacks.

See SURVEY.md for the full map from reference components to modules.
"""

__version__ = "0.1.0"

from tryraytrace_tpu.config import RenderConfig  # noqa: F401
