from tryraytrace_tpu.ops.intersect import moller_trumbore  # noqa: F401
from tryraytrace_tpu.ops.traverse import any_hit, closest_hit  # noqa: F401
