"""Cost of per-tick result accumulation schemes inside the traversal
while-loop, on the real chip.

The pool scheduler measured 12% SLOWER than owner at the headline
despite ~1.5x better utilization; suspects are (a) the scatter-add of
completed-pixel sums into a span-wide [S,3] carry, (b) the cumsum
claim counter, (c) plain carry of a multi-MB buffer through the loop.
This isolates each on a synthetic loop shaped like the engine's
(65536 lanes, a gather-chain "step" x4, then a "tick").

Variants:
  none     step-only loop (floor)
  carry    + [S,3] buffer carried untouched
  onehot   + out[Q,W,3] += onehot(k)[..,None] * val  (quota scheme)
  scatter  + out.at[pos].add(val, unique, promise_in_bounds)
  cumsum   + scatter + cumsum claim counter (pool scheme)

Usage: python scripts/microbench_accum.py [--iters 512] [--lanes 65536]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--quota", type=int, default=32)
    ap.add_argument("--cadence", type=int, default=4)
    ap.add_argument("--rows", type=int, default=3291)
    ap.add_argument("--width", type=int, default=80)
    args = ap.parse_args()
    w, iters, q = args.lanes, args.iters, args.quota
    span = w * q

    table = jnp.asarray(
        np.random.RandomState(0).rand(args.rows, args.width), jnp.float32)
    print(f"device: {jax.devices()[0].device_kind}, lanes={w}, "
          f"iters={iters}, quota={q} (span {span})")

    def step(idx, acc):
        # Dependent-index gather chain, same shape as a traversal step.
        row = table[idx]
        acc = acc + row.sum(axis=-1)
        idx = (idx * 1103515245 + 12345) % args.rows
        return idx, acc

    def make(variant):
        def run(idx0):
            def body(c):
                it, idx, acc, out, pos, nxt = c
                for _ in range(args.cadence):
                    idx, acc = step(idx, acc)
                tick = (it % args.cadence) == (args.cadence - 1)

                def do_tick(out, pos, nxt, acc):
                    val = acc[:, None] * jnp.ones((1, 3), jnp.float32)
                    if variant == "onehot":
                        k = jnp.minimum(pos // w, q - 1)
                        oh = jax.nn.one_hot(k, q, dtype=jnp.float32)
                        out = (out.reshape(q, w, 3)
                               + oh.T[:, :, None] * val[None]).reshape(-1, 3)
                        pos = pos + w
                    elif variant in ("scatter", "cumsum"):
                        done = (idx % 7) == 0  # ~1/7 lanes "finish"
                        out = out.at[pos].add(
                            jnp.where(done[:, None], val, 0.0),
                            unique_indices=True, mode="promise_in_bounds")
                        if variant == "cumsum":
                            claims = done.astype(jnp.int32)
                            newpos = nxt + jnp.cumsum(claims) - claims
                            pos = jnp.where(done,
                                            jnp.minimum(newpos, span - 1),
                                            pos)
                            nxt = nxt + claims.sum()
                        else:
                            pos = jnp.where(done, (pos + w) % span, pos)
                    return out, pos, nxt

                if variant in ("onehot", "scatter", "cumsum"):
                    out, pos, nxt = jax.lax.cond(
                        tick, lambda: do_tick(out, pos, nxt, acc),
                        lambda: (out, pos, nxt))
                return (it + 1, idx, acc, out, pos, nxt)

            out_sz = span if variant != "none" else 1
            c = (jnp.int32(0), idx0, jnp.zeros(w, jnp.float32),
                 jnp.zeros((out_sz, 3), jnp.float32),
                 jnp.arange(w, dtype=jnp.int32), jnp.int32(w))
            c = jax.lax.while_loop(lambda c: c[0] < iters, body, c)
            return c[2].sum() + c[3].sum()

        return jax.jit(run)

    idx0 = jnp.arange(w, dtype=jnp.int32) % args.rows
    base = None
    for variant in ("none", "carry", "onehot", "scatter", "cumsum"):
        f = make(variant)
        t0 = time.time()
        f(idx0).block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = f(idx0)
        r.block_until_ready()
        ms = (time.time() - t0) / reps * 1e3
        ns = ms * 1e6 / (iters * args.cadence) / w
        if variant == "none":
            base = ms
        print(f"  {variant:8s} {ms:9.2f} ms  {ns:6.2f} ns/lane/step  "
              f"(+{(ms / base - 1) * 100:5.1f}% vs none; "
              f"compile {compile_s:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
