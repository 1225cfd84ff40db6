from tryraytrace_tpu.display.pipeline import DisplayPipeline  # noqa: F401
from tryraytrace_tpu.display.input import InputManager, InputState  # noqa: F401
