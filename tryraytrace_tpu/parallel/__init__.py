from tryraytrace_tpu.parallel.mesh import make_mesh  # noqa: F401
from tryraytrace_tpu.parallel.shard import (  # noqa: F401
    ShardedRenderer,
    render_frame_sharded,
)
