"""Pallas one-hot-MXU node-row fetch: the keep/kill measurement for the
two-level traversal plan (ROADMAP: top ~1k BVH nodes VMEM-resident,
fetched as one_hot(idx) @ table on the MXU instead of an XLA gather).

Methodology mirrors scripts/microbench_gather.py: a dependent index
chain (next index computed from the fetched row, like traversal), cost
reported as ns per lane per step.  The XLA in-loop gather baseline on
v5e is ~4 ns/lane/step, pattern- and width-independent
(docs/PERFORMANCE.md).

Variants: table height M (top-level node count), row width W, and
table dtype (bf16 single, bf16-pair = two bf16 planes reconstructing
~16-bit-mantissa f32, f32 = exact rows at 3-pass MXU cost).

Usage: python scripts/microbench_pallas_fetch.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256     # lanes per grid program (>=128 keeps the MXU full)
STEPS = 64     # dependent fetches per kernel invocation


def _fetch_kernel(idx_ref, table_ref, out_ref, *, m, steps, dtype):
    """steps x (one-hot @ table) with a dependent index chain."""
    tile = idx_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)

    def body(_, carry):
        idx, acc = carry
        oh = (col == idx).astype(dtype)
        rows = jnp.dot(oh, table_ref[:], preferred_element_type=jnp.float32)
        acc = acc + rows[:, 0:1]
        nxt = (idx + rows[:, 1:2].astype(jnp.int32) + 1) % m
        return nxt, acc

    idx0 = idx_ref[:]
    acc0 = jnp.zeros((tile, 1), jnp.float32)
    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, acc0))
    out_ref[:] = acc


def onehot_fetch(table, idx, steps=STEPS, interpret=False):
    m, w = table.shape
    n = idx.shape[0]
    kernel = functools.partial(_fetch_kernel, m=m, steps=steps,
                               dtype=table.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(idx, table)


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--lanes", type=int, default=65536)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    n = args.lanes if not args.interpret else 512
    steps = STEPS if not args.interpret else 4

    for m, w, dt in [(1024, 128, jnp.bfloat16),
                     (1024, 256, jnp.bfloat16),
                     (512, 128, jnp.bfloat16),
                     (256, 128, jnp.bfloat16),
                     (1024, 128, jnp.float32)]:
        tab_np = rng.rand(m, w).astype(np.float32)
        table = jnp.asarray(tab_np, dtype=dt)
        idx = jnp.asarray(
            rng.randint(0, m, (n, 1)).astype(np.int32))
        fn = jax.jit(functools.partial(
            onehot_fetch, table, idx, steps=steps,
            interpret=args.interpret))
        dtms, out = timeit(fn)
        per = dtms / (n * steps)
        print(f"  M={m:>5} W={w:>4} {np.dtype(table.dtype).name:>8}: "
              f"{dtms * 1e3:8.3f} ms/call -> {per * 1e9:6.2f} ns/lane/step  "
              f"(checksum {float(out.sum()):.1f})")

    # Correctness spot-check vs a plain gather chain (f32 table).
    m, w = 256, 128
    tab = jnp.asarray(rng.rand(m, w).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, m, (n, 1)).astype(np.int32))
    got = onehot_fetch(tab, idx, steps=4, interpret=args.interpret)

    def ref_chain(idx):
        ix = idx[:, 0]
        acc = jnp.zeros((idx.shape[0],), jnp.float32)
        for _ in range(4):
            rows = tab[ix]
            acc = acc + rows[:, 0]
            ix = (ix + rows[:, 1].astype(jnp.int32) + 1) % m
        return acc

    want = ref_chain(idx)
    err = float(jnp.abs(got[:, 0] - want).max())
    print(f"  f32 one-hot vs gather chain: max abs err {err:.2e} "
          f"({'EXACT' if err == 0 else 'approx'})")


if __name__ == "__main__":
    main()
