from tryraytrace_tpu.utils.logging import get_logger, log_event  # noqa: F401
from tryraytrace_tpu.utils.profiling import PhaseTimer, trace_context  # noqa: F401
