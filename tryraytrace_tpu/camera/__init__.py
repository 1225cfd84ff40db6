from tryraytrace_tpu.camera.controller import CameraController, CameraParams  # noqa: F401
