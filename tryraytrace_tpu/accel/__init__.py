from tryraytrace_tpu.accel.bvh import LinearBVH, build_bvh  # noqa: F401
