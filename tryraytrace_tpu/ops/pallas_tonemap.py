"""Pallas TPU kernel: progressive-accumulator tonemap.

The reference tonemaps on the host with OpenMP (pipeline.cpp:59-71,
image_io.cpp:53-68): average by sample count, gamma 1/2.2, quantize to
bytes.  Transferring the float accumulator off-chip to do that wastes
PCIe/host time; this kernel does average+gamma+quantize *on the TPU*
so only uint8 pixels cross the wire (3 bytes/pixel instead of 12
floats' worth).

The computation is pure VPU element-wise work over VMEM blocks -- the
canonical Pallas shape: grid over row blocks, one (BLOCK, 128) f32
tile in, one int32 tile out (quantized 0..255; the final uint8 cast is
a free XLA convert on the way out).  Falls back to plain jnp when
Pallas is unavailable (CPU tests run the same code via interpret
mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tryraytrace_tpu.core.vec import GAMMA_EXP

LANES = 128
BLOCK_ROWS = 8


def _tonemap_kernel(inv_spp_ref, accum_ref, out_ref):
    x = accum_ref[:] * inv_spp_ref[0]
    x = jnp.clip(x, 0.0, 1.0)
    out_ref[:] = (jnp.power(x, GAMMA_EXP) * 255.0 + 0.5).astype(jnp.int32)


def tonemap_device(accum, spp, interpret: bool = False):
    """accum [N, 3] f32, spp scalar -> uint8 [N, 3] on device.

    Matches toInt (reference common.h:126-128) exactly: clamp, gamma
    1/2.2, *255 + 0.5, truncate.
    """
    n = accum.shape[0]
    flat = accum.reshape(-1)
    total = flat.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-total) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.float32)])
    rows = flat.shape[0] // LANES
    grid = rows // BLOCK_ROWS
    inv = (1.0 / jnp.maximum(spp, 1).astype(jnp.float32)).reshape(1)

    out = pl.pallas_call(
        _tonemap_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(inv, flat.reshape(rows, LANES))

    out = out.reshape(-1)[:total].reshape(n, 3)
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tonemap_image(accum, spp, interpret: bool = False):
    """Jitted wrapper used by the renderer's image path."""
    return tonemap_device(accum, spp, interpret=interpret)
