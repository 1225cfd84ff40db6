"""Reduced-precision traversal-row experiment (VERDICT r2 #8).

The in-loop gather is byte-insensitive (microbench_gather.py), but the
per-step DECODE elementwise (4 slab tests + first-hit select in the
quad walk) is not: the VPU runs bf16 at up to 2x the f32 rate, so
storing the 24 box floats as bf16 (conservatively widened at pack
time, so no hit is ever lost) and doing the slab arithmetic in bf16
could cut the decode bucket.

This microbench isolates exactly that block: a dependent in-loop
gather of a quad-style row followed by 4 slab tests and an argmin
select, in three variants:

  f32            -- today's engine (f32 rows, f32 math)
  bf16-math      -- bf16 rows, slab arithmetic in bf16, f32 compare
  bf16-rows-f32  -- bf16 rows upcast to f32 (pure storage change;
                    expected nil, the gather doesn't care about bytes)

Prints ns/lane-step for each.  Decision rule (VERDICT): keep if the
bf16-math step is >=5% faster end-to-end-extrapolated, else record
as a dead end in docs/PERFORMANCE.md.

Usage: python scripts/microbench_bf16.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 100
N = 65536
M = 4096  # rows


def timeit(fn, *args) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS


def quad_decode_loop(table, math_dtype):
    """Gather a 26-col row; cols 0:24 are 4 boxes (lo3, hi3 each),
    24:26 carry continuation indices.  Slab-test all 4 boxes against a
    per-lane ray, pick the nearest hit, chase its continuation."""
    m = table.shape[0]

    @jax.jit
    def fn(idx, o, inv):
        om = o.astype(math_dtype)
        im = inv.astype(math_dtype)

        def body(c):
            i, ix, s = c
            for _ in range(4):  # dependent chain like step_unroll=4
                row = table[ix]
                boxes = row[:, :24].astype(math_dtype).reshape(-1, 4, 6)
                t0 = (boxes[:, :, 0:3] - om[:, None, :]) * im[:, None, :]
                t1 = (boxes[:, :, 3:6] - om[:, None, :]) * im[:, None, :]
                lo = jnp.minimum(t0, t1).max(axis=2)
                hi = jnp.maximum(t0, t1).min(axis=2)
                hit = (hi >= lo) & (hi > 0)
                key = jnp.where(hit, lo, jnp.asarray(jnp.inf, math_dtype))
                k = key.argmin(axis=1).astype(jnp.int32)
                cont = row[:, 24:26].astype(jnp.int32)
                nxt = jnp.where(k < 2, cont[:, 0], cont[:, 1])
                s = s + key.min(axis=1).astype(jnp.float32)
                ix = (ix + nxt + 1) % m
            return i + 1, ix, s

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, idx, jnp.zeros(N, jnp.float32)))[2]

    return fn


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    rows = rng.rand(M, 26).astype(np.float32)
    rows[:, 24:26] = rng.randint(0, 7, (M, 2))
    idx = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    o = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    inv = jnp.asarray((1.0 / (rng.rand(N, 3) + 0.1)).astype(np.float32))

    t_f32 = jnp.asarray(rows)
    t_bf16 = jnp.asarray(rows, dtype=jnp.bfloat16)

    for name, tab, mdt in (
        ("f32           ", t_f32, jnp.float32),
        ("bf16-math     ", t_bf16, jnp.bfloat16),
        ("bf16-rows-f32 ", t_bf16, jnp.float32),
    ):
        dt = timeit(quad_decode_loop(tab, mdt), idx, o, inv)
        # 4 dependent decodes per loop iteration
        print(f"  {name}: {dt * 1e3:7.3f} ms/iter "
              f"= {dt / 4 / N * 1e9:5.2f} ns/lane-step")


if __name__ == "__main__":
    main()
