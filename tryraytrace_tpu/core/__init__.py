from tryraytrace_tpu.core import rng, vec  # noqa: F401
