from tryraytrace_tpu.io.ppm import load_ppm, save_ppm  # noqa: F401
from tryraytrace_tpu.io.snapshot import save_snapshot  # noqa: F401
