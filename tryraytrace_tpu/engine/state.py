"""Progressive render state: accumulator + sample count + checkpointing.

The reference's accumulation buffer *is* its implicit render state,
but only the tonemapped image is ever persisted and any camera move
discards everything (main.cpp:170-173).  Checkpoint/resume here is a
strict superset (SURVEY.md section 5): the raw accumulator, spp and
camera state round-trip through one ``.npz``, so a progressive render
can resume exactly where it stopped.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderState:
    accum: jax.Array  # [N, 3] f32 radiance sum
    spp: jax.Array    # scalar i32 sample count

    @staticmethod
    def zeros(n: int) -> "RenderState":
        return RenderState(jnp.zeros((n, 3), jnp.float32), jnp.int32(0))

    def reset(self) -> "RenderState":
        """Camera moved -> discard accumulation (main.cpp:170-173)."""
        return RenderState(jnp.zeros_like(self.accum), jnp.int32(0))


def _payload(state: RenderState, width, height, camera, frame_seed):
    payload = dict(
        accum=np.asarray(state.accum),
        spp=np.asarray(state.spp),
        width=np.int64(width),
        height=np.int64(height),
        frame_seed=np.int64(frame_seed),
    )
    if camera is not None:
        payload.update(
            cam_pos=np.asarray(camera.pos),
            cam_yaw=np.float64(camera.yaw),
            cam_pitch=np.float64(camera.pitch),
            cam_aperture=np.float64(camera.aperture),
            cam_focus=np.float64(camera.focus_dist),
        )
    return payload


def _is_orbax_path(path) -> bool:
    """Checkpoint format by suffix: ``.npz`` = NumPy archive (default),
    anything else = an Orbax checkpoint directory."""
    return not str(path).endswith(".npz")


def save_checkpoint(path, state: RenderState, width: int, height: int,
                    camera=None, frame_seed: int = 0) -> None:
    """Persist accumulator + spp (+ optional camera pose).

    ``*.npz`` paths use the portable NumPy archive; any other path is
    written as an Orbax checkpoint directory (beyond-reference option:
    Orbax writes sharded device arrays per-host without a gather,
    which is the multi-host-friendly format for the dp-sharded
    ShardedRenderer accumulator).
    """
    if _is_orbax_path(path):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(os.fspath(path)),
                   _payload(state, width, height, camera, frame_seed),
                   force=True)
        return
    np.savez(path, **_payload(state, width, height, camera, frame_seed))


def load_checkpoint(path):
    """Returns (RenderState, width, height, frame_seed, camera_or_None).

    Accepts both checkpoint formats (see save_checkpoint).
    """
    from tryraytrace_tpu.camera.controller import CameraController

    if _is_orbax_path(path):
        import os

        import orbax.checkpoint as ocp

        z = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.fspath(path)))
    else:
        with np.load(path) as f:
            z = {k: f[k] for k in f.files}
    state = RenderState(
        jnp.asarray(z["accum"], jnp.float32),
        jnp.asarray(z["spp"], jnp.int32),
    )
    width = int(z["width"])
    height = int(z["height"])
    frame_seed = int(z["frame_seed"])
    camera = None
    if "cam_pos" in z:
        camera = CameraController(tuple(np.asarray(z["cam_pos"])))
        camera.yaw = float(z["cam_yaw"])
        camera.pitch = float(z["cam_pitch"])
        camera.aperture = float(z["cam_aperture"])
        camera.focus_dist = float(z["cam_focus"])
        camera._update_camera_vectors()
    return state, width, height, frame_seed, camera
