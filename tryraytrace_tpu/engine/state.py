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


def save_checkpoint(path, state: RenderState, width: int, height: int,
                    camera=None, frame_seed: int = 0) -> None:
    """Persist accumulator + spp (+ optional camera pose) to .npz."""
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
    np.savez(path, **payload)


def load_checkpoint(path):
    """Returns (RenderState, width, height, frame_seed, camera_or_None)."""
    from tryraytrace_tpu.camera.controller import CameraController

    with np.load(path) as z:
        state = RenderState(
            jnp.asarray(z["accum"], jnp.float32),
            jnp.asarray(z["spp"], jnp.int32),
        )
        width = int(z["width"])
        height = int(z["height"])
        frame_seed = int(z["frame_seed"])
        camera = None
        if "cam_pos" in z:
            camera = CameraController(tuple(z["cam_pos"]))
            camera.yaw = float(z["cam_yaw"])
            camera.pitch = float(z["cam_pitch"])
            camera.aperture = float(z["cam_aperture"])
            camera.focus_dist = float(z["cam_focus"])
            camera._update_camera_vectors()
    return state, width, height, frame_seed, camera
