"""shard_map'd multi-chip rendering.

One jitted step renders a frame over the (dp, sp) mesh:

  - pixel indices are sharded along ``dp`` (each chip owns a block of
    image rows; RNG streams are keyed by absolute pixel index so the
    sharded image is bit-identical to the single-chip one);
  - the spp loop is split along ``sp`` (chip k renders samples
    [k*spp/sp, (k+1)*spp/sp) of the frame's sample set -- again the
    same RNG streams, so identical accumulation);
  - one ``psum`` over ``sp`` combines sample partials: the only
    collective per frame.

This is the XLA-collectives-over-ICI replacement for what a CUDA
multi-GPU port would do with NCCL.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.state import RenderState
from tryraytrace_tpu.engine.wavefront import render_frame
from tryraytrace_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS, make_mesh
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()


def render_frame_sharded(scene, textures, cam, frame_seed, width: int,
                         height: int, cfg: RenderConfig, spp: int,
                         mesh, with_stats: bool = False):
    """Render one frame's radiance sum [N, 3], sharded over ``mesh``.

    Requires width*height % dp == 0 and spp % sp == 0.  With
    ``with_stats`` also returns the frame's exact (path, shadow) ray
    totals psum'd over both mesh axes -- the Mrays/s numerator for the
    sharded benchmark (bench.py --shard-mesh), replicated on every
    shard.
    """
    n = width * height
    dp = mesh.shape[TILE_AXIS]
    sp = mesh.shape[SAMPLE_AXIS]
    if n % dp != 0:
        raise ValueError(f"{n} pixels not divisible by dp={dp}")
    if spp % sp != 0:
        raise ValueError(f"spp={spp} not divisible by sp={sp}")
    local_spp = spp // sp
    frame_seed = jnp.asarray(frame_seed).astype(jnp.uint32)
    pixel_idx = jnp.arange(n, dtype=jnp.int32)

    def local(scene, textures, cam, frame_seed, pixels):
        # Shard s of the sample axis renders samples
        # [s*local_spp, (s+1)*local_spp) of the frame's global sample
        # set with the frame's global RNG streams, so the psum'd image
        # is bit-identical to the single-chip render.
        s_idx = jax.lax.axis_index(SAMPLE_AXIS).astype(jnp.int32)
        # pixels is this shard's contiguous block of the global
        # arange, so pixels[j] == pixels[0] + j: the affine promise
        # lets quota's inline refill claim pixels without a gather.
        out = render_frame(scene, textures, cam, frame_seed,
                           width, height, cfg, spp=local_spp,
                           pixel_idx=pixels,
                           sample_offset=s_idx * local_spp,
                           seed_spp=spp,
                           pixel_affine_base=pixels[0],
                           with_stats=with_stats)
        if not with_stats:
            return jax.lax.psum(out, SAMPLE_AXIS)
        acc, (tr, sh) = out
        acc = jax.lax.psum(acc, SAMPLE_AXIS)
        # Frame-total ray counts: sum the per-shard counters over both
        # axes so every shard returns the same replicated scalars.
        tr = jax.lax.psum(tr, (TILE_AXIS, SAMPLE_AXIS))
        sh = jax.lax.psum(sh, (TILE_AXIS, SAMPLE_AXIS))
        return acc, (tr, sh)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(TILE_AXIS)),
        out_specs=(P(TILE_AXIS), (P(), P())) if with_stats
        else P(TILE_AXIS),
        # The traversal while_loops initialize carries from replicated
        # constants that become shard-varying inside the body; that is
        # intentional, so skip the varying-manual-axes check.
        check_vma=False,
    )
    return fn(scene, textures, cam, frame_seed, pixel_idx)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cfg", "spp", "mesh"),
    donate_argnames=("state",),
)
def _sharded_step(scene, textures, cam, state, frame_seed, *,
                  width, height, cfg, spp, mesh):
    acc = render_frame_sharded(scene, textures, cam, frame_seed,
                               width, height, cfg, spp, mesh)
    return RenderState(state.accum + acc, state.spp + spp)


class ShardedRenderer:
    """Multi-chip progressive renderer (scene replicated, image
    row-sharded, spp psum-reduced).  API mirrors engine.Renderer."""

    def __init__(self, arrays, cfg: RenderConfig, mesh=None):
        from tryraytrace_tpu.engine.device_scene import upload_scene

        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = cfg
        self.width, self.height = cfg.width, cfg.height
        from tryraytrace_tpu.config import quad_select_resolved

        scene, textures, bvh = upload_scene(
            arrays, device_put=False,
            leaf_size=cfg.bvh_leaf_size,
            method=cfg.bvh_method,
            traversal=cfg.traversal,
            leaf_fmt=cfg.leaf_isect,
            quad_collapse=cfg.quad_collapse,
            quad_layout=cfg.quad_layout,
            quad_select=quad_select_resolved(cfg))
        if cfg.shade_every < 1:
            from tryraytrace_tpu.config import inline_resolved
            from tryraytrace_tpu.engine.device_scene import auto_shade_every

            self.cfg = cfg = cfg.replace(shade_every=auto_shade_every(
                bvh, arrays, cfg.step_unroll,
                inline=inline_resolved(cfg, scene.num_lights)))
        repl = NamedSharding(self.mesh, P())
        self.scene = jax.device_put(scene, repl)
        self.textures = tuple(jax.device_put(t, repl) for t in textures)
        self.bvh = bvh
        n = self.width * self.height
        accum_sharding = NamedSharding(self.mesh, P(TILE_AXIS))
        # spp must carry the replicated mesh sharding (not a bare
        # single-device scalar): checkpoint resume re-distributes the
        # host state through ``x.sharding`` of these leaves, and a
        # SingleDeviceSharding there places each process's copy on a
        # different device, which the jitted step then rejects.
        self.state = RenderState(
            jax.device_put(np.zeros((n, 3), np.float32), accum_sharding),
            jax.device_put(np.int32(0), repl),
        )
        self.frame = 1
        self._step_spp = None

    def step(self, cam, spp: int | None = None) -> None:
        spp = self.cfg.spp if spp is None else spp
        # Same aliasing guard as engine.Renderer.step: the seed
        # schedule (core/rng.py) needs a constant spp per accumulation.
        if self._step_spp is not None and spp != self._step_spp:
            raise ValueError(
                f"spp changed {self._step_spp} -> {spp} mid-accumulation; "
                "call reset() first (RNG streams would alias)")
        self._step_spp = spp
        self.state = _sharded_step(
            self.scene, self.textures, cam, self.state,
            jnp.uint32(self.frame), width=self.width, height=self.height,
            cfg=self.cfg, spp=spp, mesh=self.mesh,
        )
        self.frame += 1

    def reset(self) -> None:
        self.state = self.state.reset()
        self.frame = 1
        self._step_spp = None

    def spp(self) -> int:
        return int(self.state.spp)

    def accum_host(self) -> np.ndarray:
        from tryraytrace_tpu.parallel.distributed import gather_accum_host

        # On a multi-host mesh the dp shards live on other processes;
        # allgather them (single-process: plain device->host copy).
        return gather_accum_host(self.state.accum).reshape(
            self.height, self.width, 3)

    def block_until_ready(self) -> None:
        jax.block_until_ready(self.state.accum)
