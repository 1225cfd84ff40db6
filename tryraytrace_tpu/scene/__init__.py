from tryraytrace_tpu.scene.model import (  # noqa: F401
    Object,
    Scene,
    SceneArrays,
    flatten_scene,
    scan_lights,
)
from tryraytrace_tpu.scene.cornell import create_cornell_box  # noqa: F401
from tryraytrace_tpu.scene.objloader import load_obj  # noqa: F401
