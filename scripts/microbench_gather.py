"""Reproduces the TPU cost-model measurements behind the engine design
(docs/PERFORMANCE.md, BASELINE.md): in-loop gather cost vs batch size,
index pattern, row width, table size, and chained-unroll amortization.

Usage: python scripts/microbench_gather.py   (runs on the default device)
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 100


def timeit(fn, *args) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS


def gather_loop(table, idx0, unroll: int = 1):
    m = table.shape[0]

    @jax.jit
    def fn(idx):
        def body(c):
            i, ix, s = c
            for _ in range(unroll):  # dependent chain, like traversal
                row = table[ix]
                s = s + row[:, 0].sum()
                ix = (ix + row[:, 1].astype(jnp.int32) + 1) % m
            return i + 1, ix, s

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, idx0, jnp.float32(0)))[2]

    return fn


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)

    print("\n-- gather cost vs lanes (table 12k x 24 f32) --")
    table = jnp.asarray(rng.rand(12288, 24).astype(np.float32))
    for n in (8192, 65536, 262144, 1048576):
        idx = jnp.asarray(rng.randint(0, 12288, n).astype(np.int32))
        dt = timeit(gather_loop(table, idx), idx)
        print(f"  N={n:>8}: {dt * 1e3:7.3f} ms/step "
              f"({dt / n * 1e9:5.2f} ns/lane)")

    print("\n-- vs index pattern (N=65536) --")
    n = 65536
    for name, arr in (
        ("random", rng.randint(0, 12288, n)),
        ("constant", np.zeros(n)),
        ("coherent", np.repeat(np.arange(n // 64) % 12288, 64)),
    ):
        idx = jnp.asarray(arr.astype(np.int32))
        dt = timeit(gather_loop(table, idx), idx)
        print(f"  {name:>9}: {dt * 1e3:7.3f} ms/step")

    print("\n-- vs row width (N=65536, 12k rows) --")
    idx = jnp.asarray(rng.randint(0, 12288, n).astype(np.int32))
    # 106/130/154/202 = quad bw-row widths at fat-leaf K=8/10/12/16
    # (the K>8 points size the larger-leaf experiment, round 3).
    for c in (4, 24, 96, 112, 130, 154, 202):
        t = jnp.asarray(rng.rand(12288, c).astype(np.float32))
        dt = timeit(gather_loop(t, idx), idx)
        print(f"  C={c:>4}: {dt * 1e3:7.3f} ms/step")

    print("\n-- vs row width at CONSTANT table bytes (~1.3 MB, N=65536) --")
    # Decouples width from the ~3 MB size knee (the sweep above holds
    # ROWS constant, so C=130 is a 6.4 MB table).  This is the clean
    # answer to "is width still free past 112 f32?" (VERDICT r3 #2:
    # bw K>=10 quad rows are 130+ wide).
    for c in (96, 106, 112, 120, 128, 130, 144, 154, 202, 256):
        m = max(256, int(1.3e6 / 4 / c))
        t = jnp.asarray(rng.rand(m, c).astype(np.float32))
        idx2 = jnp.asarray(rng.randint(0, m, n).astype(np.int32))
        dt = timeit(gather_loop(t, idx2), idx2)
        print(f"  C={c:>4} (M={m:>6}): {dt * 1e3:7.3f} ms/step "
              f"({dt / n * 1e9:5.2f} ns/lane)")

    print("\n-- vs table rows (N=65536, C=24) --")
    for m in (1024, 12288, 32768, 101376):
        t = jnp.asarray(rng.rand(m, 24).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, m, n).astype(np.int32))
        dt = timeit(gather_loop(t, idx), idx)
        print(f"  M={m:>7} ({m * 24 * 4 / 1e6:5.1f} MB): {dt * 1e3:7.3f} ms/step")

    print("\n-- chained unroll amortization (N=65536, 7k x 96) --")
    t = jnp.asarray(rng.rand(7168, 96).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 7168, n).astype(np.int32))
    for u in (1, 2, 4, 8):
        dt = timeit(gather_loop(t, idx, unroll=u), idx)
        print(f"  unroll {u}: {dt * 1e3:7.3f} ms/iter "
              f"= {dt / u * 1e3:6.3f} ms per step-equivalent")


if __name__ == "__main__":
    main()
