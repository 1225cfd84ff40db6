from tryraytrace_tpu.oracle.cpu_renderer import oracle_render  # noqa: F401
