"""Price an inline-shading step: extra in-loop gathers on top of the
traversal row fetch.

The persistent engine (engine/persistent.py) separates traversal steps
(one node-row gather, ~0.30 ms at 65k lanes) from shade ticks (one
trimat-row gather + texture taps + heavy elementwise, ~0.28 ms) and
pays tick-wait idle between them (utilization 0.60 at the headline,
docs/ROADMAP.md).  An inline-shading engine would fold the shade into
the step loop so READY lanes shade immediately -- worth it only if a
loop body with BOTH gathers (plus texture taps) costs well under the
sum of a step and a tick.

This measures, at the headline working set (65536 lanes, node table
3291x104, trimat 6327x37, texture 128x128x3):
  A  1 dependent gather/body                  (the traversal step)
  B  2 dependent gathers/body                 (+ trimat row)
  C  B + 4 texture taps                       (+ bilinear sample)
  D  C + shade-grade elementwise (~120 flops) (the full merged body)

Usage: python scripts/microbench_inline_shade.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 100
LANES = 65536
NODES = 3291
NODE_W = 104
TRIS = 6327
TRI_W = 37
TEX = 128


def timeit(fn, *args) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS


def make_loop(nodes, tris, tex, level: str):
    n_nodes = nodes.shape[0]
    n_tris = tris.shape[0]

    @jax.jit
    def fn(idx0):
        def body(c):
            i, ix, s = c
            row = nodes[ix]                      # A: node-row gather
            s = s + row[:, 0].sum()
            nxt = (ix + row[:, 1].astype(jnp.int32) + 1) % n_nodes
            if level >= "B":                     # + trimat gather,
                tid = (row[:, 2] * n_tris).astype(jnp.int32) % n_tris
                trow = tris[tid]                 #   index from row A
                s = s + trow[:, 0].sum()
                if level >= "C":                 # + 4 bilinear taps
                    u = trow[:, 1] * TEX
                    v = trow[:, 2] * TEX
                    iu = jnp.floor(u).astype(jnp.int32) % TEX
                    iv = jnp.floor(v).astype(jnp.int32) % TEX
                    iu1 = (iu + 1) % TEX
                    iv1 = (iv + 1) % TEX
                    flat = tex.reshape(-1, 3)
                    t00 = flat[iv * TEX + iu]
                    t01 = flat[iv * TEX + iu1]
                    t10 = flat[iv1 * TEX + iu]
                    t11 = flat[iv1 * TEX + iu1]
                    fu = (u - jnp.floor(u))[..., None]
                    fv = (v - jnp.floor(v))[..., None]
                    texel = ((t00 * (1 - fu) + t01 * fu) * (1 - fv)
                             + (t10 * (1 - fu) + t11 * fu) * fv)
                    s = s + texel.sum()
                if level >= "D":                 # + shade-ish math
                    alb = trow[:, 3:6] * texel
                    nrm = trow[:, 6:9]
                    d = trow[:, 9:12]
                    cosi = (nrm * d).sum(-1)
                    f0 = 0.04 + (alb[:, 0] - 0.04) * trow[:, 12]
                    fres = f0 + (1.0 - f0) * (1.0 - jnp.abs(cosi)) ** 5
                    refl = d - 2.0 * cosi[..., None] * nrm
                    diff = jnp.sqrt(jnp.maximum(1 - fres, 0.0))
                    w = jnp.where(fres > 0.5, refl[:, 0],
                                  diff * alb[:, 1])
                    s = s + (w * fres).sum()
            return i + 1, nxt, s

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, idx0, jnp.float32(0)))[2]

    return fn


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    r = np.random.RandomState(0)
    nodes = jnp.asarray(r.rand(NODES, NODE_W).astype(np.float32))
    tris = jnp.asarray(r.rand(TRIS, TRI_W).astype(np.float32))
    tex = jnp.asarray(r.rand(TEX, TEX, 3).astype(np.float32))
    idx = jnp.asarray(r.randint(0, NODES, LANES).astype(np.int32))

    base = None
    for level, desc in (("A", "1 gather (traversal step)"),
                        ("B", "2 dependent gathers (+trimat)"),
                        ("C", "B + 4 texture taps"),
                        ("D", "C + shade elementwise")):
        dt = timeit(make_loop(nodes, tris, tex, level), idx)
        if base is None:
            base = dt
        print(f"  {level}  {desc:34s}: {dt * 1e3:7.3f} ms/body "
              f"({dt / LANES * 1e9:5.2f} ns/lane, {dt / base:4.2f}x A)")


if __name__ == "__main__":
    main()
