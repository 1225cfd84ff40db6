from tryraytrace_tpu.engine.device_scene import DeviceScene  # noqa: F401
from tryraytrace_tpu.engine.renderer import Renderer  # noqa: F401
from tryraytrace_tpu.engine.wavefront import render_frame, render_sample  # noqa: F401
