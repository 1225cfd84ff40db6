"""Threaded (stackless) BVH traversal over ray waves.

Parity targets: the closest-hit walk inlined in the megakernel
(reference renderer.cu:369-427) and trace_shadow (renderer.cu:273-314).
The reference simulates recursion with a per-thread ``int stack[32]``,
pushing right-then-left so nodes are visited in preorder with the
current best t as the AABB t_max (occlusion pruning).

TPU-first inversion: per-lane stacks are the CUDA idiom that maps
worst onto a vector unit.  The builder (accel/bvh.py) threads the tree
with preorder miss links, so the walk becomes one branch-free update

    next = (aabb_hit and internal) ? node + 1 : miss_link[node]

executed in lockstep for the whole wave inside ``lax.while_loop``.
Visit order and pruning semantics are identical to the reference;
per-ray state is a single int32.  Leaves hold exactly one primitive
(the reference splits to singleton leaves, bvh.cpp:67-72) so the leaf
case is a single Moller-Trumbore evaluation, also in lockstep.

All node/triangle fetches are dynamic gathers; on TPU the node arrays
for the reference scenes (<= ~26k nodes) fit comfortably in VMEM.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tryraytrace_tpu.accel.bvh import (
    PAIR_COL_BODY,
    PAIR_COL_CONT,
    QB_ENT,
    QB_NSLOTS,
    QUAD_COL_BODY,
    QUAD_COL_CONT,
)
from tryraytrace_tpu.core import vec
from tryraytrace_tpu.ops.aabb import aabb_hit, aabb_slab
from tryraytrace_tpu.ops.intersect import (LEAF_STRIDE, baldwin_intersect,
                                            moller_trumbore,
                                            moller_trumbore_pre)


def _slot_isect(row, base: int, r_o, r_d, fmt: str):
    """One leaf slot's intersection t from its packed columns: "mt"
    reads (v0, e1, e2) at stride 9, "bw" the Baldwin-Weber
    (n, v0, bu, bv) transform at stride 12 (ops/intersect)."""
    if fmt == "bw":
        return baldwin_intersect(row[:, base:base + 12], r_o, r_d)
    return moller_trumbore_pre(row[:, base:base + 3],
                               row[:, base + 3:base + 6],
                               row[:, base + 6:base + 9], r_o, r_d)

# np (not jnp): a module-level jnp scalar would initialize the JAX
# backend at import time, breaking pre-backend config such as
# jax.distributed.initialize (parallel/distributed.py).
MISS_T = np.float32(1e20)  # renderer.cu:380

def ray_octant(r_d, xp=jnp):
    """Direction octant (bit k set iff d_k < 0) -> int32 [N]."""
    return ((r_d[..., 0] < 0).astype(xp.int32)
            | ((r_d[..., 1] < 0).astype(xp.int32) << 1)
            | ((r_d[..., 2] < 0).astype(xp.int32) << 2))


def _mux8(octant, cols):
    """Binary select tree over the 3 octant bits (7 selects + 3 bit
    tests vs an 8-term one-hot's ~32 ops); pure selection of identical
    values, so bit-identical to the one-hot multiply-add it replaced."""
    b0 = (octant & 1) == 1
    b1 = (octant & 2) == 2
    l = [jnp.where(b0, cols[1], cols[0]), jnp.where(b0, cols[3], cols[2]),
         jnp.where(b0, cols[5], cols[4]), jnp.where(b0, cols[7], cols[6])]
    m = [jnp.where(b1, l[1], l[0]), jnp.where(b1, l[3], l[2])]
    return jnp.where((octant & 4) == 4, m[1], m[0])


def _decode_links(row, octant, k: int, xp=jnp, fmt: str = "mt"):
    """Per-ray (next_hit, next_miss) from the row's 16 octant-link
    columns, selected by an elementwise mux tree (free fused VPU work
    riding the gather, avoiding a second gather)."""
    col = 6 + LEAF_STRIDE[fmt] * k + 2
    nh = _mux8(octant, [row[:, col + o] for o in range(8)])
    nm = _mux8(octant, [row[:, col + 8 + o] for o in range(8)])
    return nh.astype(jnp.int32), nm.astype(jnp.int32)


def _leaf_intersect(row, k: int, r_o, r_d, prim_start, prim_count,
                    tlo, thi, fmt: str = "mt"):
    """MT-test the <=K inline leaf triangles of each row, returning the
    closest (t, prim_id) inside the per-lane open window (tlo, thi).
    The K tests are unrolled elementwise math over the gathered row.
    Slots store (v0, e1, e2) -- edges precomputed at pack time,
    bit-identical to in-step subtraction -- and pad slots are all-zero
    (degenerate -> guaranteed miss), so no per-slot ``j < prim_count``
    mask is needed: callers mask the result by ``is_leaf`` anyway.
    The window is two per-lane scalars (hoisted out of the K-unroll)
    rather than a callable: closest-hit passes (0, d_min), shadow
    (1e-3, smax - 1e-3) -- decisions identical to the old per-slot
    ``(t > 0) & window(t)`` forms."""
    del prim_count  # pad slots self-mask (zero edges -> parallel -> t=0)
    n = r_o.shape[0]
    best_t = jnp.full((n,), MISS_T)
    best_id = jnp.full((n,), -1, jnp.int32)
    st = LEAF_STRIDE[fmt]
    for j in range(k):
        t = _slot_isect(row, 6 + st * j, r_o, r_d, fmt)
        ok = (t > tlo) & (t < thi) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_id = jnp.where(ok, prim_start + j, best_id)
    # Internal rows (prim_start < 0) hold box/child data in the slot
    # columns; their decoded "t"s are garbage.  Enforce the miss at the
    # source so the contract doesn't rest on every caller's is_leaf
    # mask (two selects; XLA CSEs them with the callers' masks).
    is_leaf = prim_start >= 0
    return (jnp.where(is_leaf, best_t, MISS_T),
            jnp.where(is_leaf, best_id, -1))


# --- Fat-node traversal (v3; see accel/bvh.py pack_fatnode_table) ----
#
# Both children's boxes live in the parent row, so only known-hit nodes
# are fetched; descent is front-to-back by actual slab entry distance
# (dynamic, so t_max pruning bites harder than any static order);
# pending far children sit in a per-lane register short-stack updated
# by free elementwise shifts.

FATNODE_DEPTH = 32


def _fat_leaf_intersect(row, k: int, r_o, r_d, prim_start, prim_count,
                        tlo, thi, base0: int = 2, fmt: str = "mt"):
    """Closest (t, prim_id) among the <=K inline (v0, e1, e2) triangle
    slots at columns base0.. of each gathered row, inside the per-lane
    open window (tlo, thi) (see ``_leaf_intersect``).  Pad slots are
    all-zero (degenerate -> miss), so no per-slot count mask is
    needed; the miss for internal rows is enforced here (see
    ``_leaf_intersect``) rather than left to callers' is_leaf masks."""
    del prim_count  # pad slots self-mask (zero edges -> parallel -> t=0)
    n = r_o.shape[0]
    best_t = jnp.full((n,), MISS_T)
    best_id = jnp.full((n,), -1, jnp.int32)
    st = LEAF_STRIDE[fmt]
    for j in range(k):
        t = _slot_isect(row, base0 + st * j, r_o, r_d, fmt)
        ok = (t > tlo) & (t < thi) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_id = jnp.where(ok, prim_start + j, best_id)
    is_leaf = prim_start >= 0
    return (jnp.where(is_leaf, best_t, MISS_T),
            jnp.where(is_leaf, best_id, -1))


def fatnode_step(table, k: int, r_o, r_d, inv_d, cur, stack,
                 t_min, t_max, tlo, thi, live, fmt: str = "mt"):
    """One fat-node traversal step shared by closest/any-hit walks.

    Returns (cur', stack', leaf_t, leaf_id) where leaf_t/leaf_id are
    the best leaf intersection found this step (-1 when none).
    ``t_max`` is the per-lane box window (d_min for closest hit)."""
    sentinel = table.shape[0]
    idx = jnp.where(live, jnp.minimum(cur, sentinel - 1), 0)
    row = table[idx]
    prim_start = row[:, 0].astype(jnp.int32)
    prim_count = row[:, 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    lt, lid = _fat_leaf_intersect(row, k, r_o, r_d, prim_start, prim_count,
                                  tlo, thi, fmt=fmt)
    lid = jnp.where(live & is_leaf, lid, -1)

    lo_l, ok_l = aabb_slab(row[:, 2:8], r_o, inv_d, t_min, t_max)
    lo_r, ok_r = aabb_slab(row[:, 8:14], r_o, inv_d, t_min, t_max)
    child_l = row[:, 14].astype(jnp.int32)
    child_r = row[:, 15].astype(jnp.int32)
    l_near = lo_l <= lo_r
    near_id = jnp.where(l_near, child_l, child_r)
    far_id = jnp.where(l_near, child_r, child_l)
    near_ok = jnp.where(l_near, ok_l, ok_r)
    far_ok = jnp.where(l_near, ok_r, ok_l)

    internal = live & ~is_leaf
    both = internal & near_ok & far_ok
    stack = jnp.where(
        both[..., None],
        jnp.concatenate([far_id[..., None], stack[:, :-1]], axis=1),
        stack)
    descend = internal & (near_ok | far_ok)
    child_next = jnp.where(near_ok, near_id, far_id)

    need_pop = live & ~descend
    popped = stack[:, 0]
    stack = jnp.where(
        need_pop[..., None],
        jnp.concatenate(
            [stack[:, 1:],
             jnp.full((stack.shape[0], 1), sentinel, jnp.int32)], axis=1),
        stack)
    cur = jnp.where(~live, cur,
                    jnp.where(descend, child_next, popped))
    return cur, stack, lt, lid


def closest_hit_fatnode(table, k: int, r_o, r_d, active, fmt: str = "mt"):
    """Closest-hit via fat-node traversal; same results as
    closest_hit / closest_hit_packed (order-independent)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32)
    inv_d = vec.safe_inv(r_d, jnp)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    stack0 = jnp.full((n, FATNODE_DEPTH), sentinel, jnp.int32)
    state = (cur0, stack0, jnp.full((n,), MISS_T),
             jnp.full((n,), -1, jnp.int32))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, stack, d_min, hit_id = s
        live = cur < sentinel
        cur, stack, lt, lid = fatnode_step(
            table, k, r_o, r_d, inv_d, cur, stack,
            jnp.float32(0.0), d_min, jnp.float32(0.0), d_min, live,
            fmt=fmt)
        take = lid >= 0
        d_min = jnp.where(take, lt, d_min)
        hit_id = jnp.where(take, lid, hit_id)
        return cur, stack, d_min, hit_id

    _, _, d_min, hit_id = jax.lax.while_loop(cond, body, state)
    return d_min, hit_id


def any_hit_fatnode(table, k: int, r_o, r_d, max_dist, active, fmt: str = "mt"):
    """Shadow traversal via fat-node walk (trace_shadow parity:
    plain 1/d, constant (1e-3, max_dist) window, early exit)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.zeros((n,), bool)
    inv_d = (1.0 / r_d).astype(jnp.float32)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    stack0 = jnp.full((n, FATNODE_DEPTH), sentinel, jnp.int32)
    state = (cur0, stack0, jnp.zeros((n,), bool))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, stack, occ = s
        live = cur < sentinel
        cur, stack, _, lid = fatnode_step(
            table, k, r_o, r_d, inv_d, cur, stack,
            jnp.float32(1e-3), max_dist,
            jnp.float32(1e-3), max_dist - 1e-3, live, fmt=fmt)
        occ = occ | (lid >= 0)
        cur = jnp.where(occ, sentinel, cur)
        return cur, stack, occ

    _, _, occ = jax.lax.while_loop(cond, body, state)
    return occ


# --- Pair-row traversal (v4; see accel/bvh.py pack_pair_table) -------
#
# Stackless two-boxes-per-row walk: each fetched internal row tests
# BOTH children (near-first by octant) and branches near / far / the
# threaded continuation; a missed far node entered through the thread
# is absorbed by containment (one wasted row), and a one-slot per-lane
# skip register (entry(far) -> cont(X)) removes most of that waste
# exactly.  ~0.8x the row fetches of the threaded walk at the same
# per-step cost (scripts/sim_pair_walk.py).

def _pair_decode(row, octant, r_o, inv_d, t_min, t_max):
    """Internal-row decode for the pair walk: per-lane continuation
    link, the 3-way next pointer, and the skip-register push condition.

    Returns (cont, nxt_internal, push, far): ``cont`` is this row's
    per-octant threaded continuation (also the leaf next), ``push`` is
    true where the walk descends near with far missed (so entry(far)
    -> cont may be registered), ``far`` the far child's row id.  All
    elementwise selects riding the row gather."""
    cont = _mux8(octant, [row[:, PAIR_COL_CONT + o]
                          for o in range(8)]).astype(jnp.int32)
    b = PAIR_COL_BODY
    hit_l = aabb_hit(row[:, b:b + 6], r_o, inv_d, t_min, t_max)
    hit_r = aabb_hit(row[:, b + 6:b + 12], r_o, inv_d, t_min, t_max)
    child_l = row[:, b + 12].astype(jnp.int32)
    child_r = row[:, b + 13].astype(jnp.int32)
    # Clamp: masked lanes (leaf rows, or SHADEG/TEXG material/tile rows
    # riding the same gather slot in the engine) carry arbitrary floats
    # here, and an out-of-range shift amount is implementation-defined.
    axis = jnp.clip(row[:, b + 14].astype(jnp.int32), 0, 2)
    neg = ((octant >> axis) & 1) == 1
    near = jnp.where(neg, child_r, child_l)
    far = jnp.where(neg, child_l, child_r)
    hit_n = jnp.where(neg, hit_r, hit_l)
    hit_f = jnp.where(neg, hit_l, hit_r)
    nxt_int = jnp.where(hit_n, near, jnp.where(hit_f, far, cont))
    return cont, nxt_int, hit_n & ~hit_f, far


def pair_step(table, k: int, r_o, r_d, inv_d, octant, cur, reg_e, reg_s,
              t_min, t_max, tlo, thi, live, fmt: str = "mt"):
    """One pair-row step shared by the closest/any-hit walks and the
    persistent engine: gathers each live lane's current row, MT-tests
    leaf rows, 3-way-branches internal rows, and advances the one-slot
    skip register.  Returns (cur', reg_e', reg_s', leaf_t, leaf_id)
    with leaf_id = -1 where no in-window leaf hit was found."""
    sentinel = table.shape[0]
    idx = jnp.where(live, jnp.minimum(cur, sentinel - 1), 0)
    row = table[idx]
    prim_start = row[:, 0].astype(jnp.int32)
    prim_count = row[:, 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    lt, lid = _fat_leaf_intersect(row, k, r_o, r_d, prim_start, prim_count,
                                  tlo, thi, base0=PAIR_COL_BODY, fmt=fmt)
    lid = jnp.where(live & is_leaf, lid, -1)

    cont, nxt_int, push, far = _pair_decode(row, octant, r_o, inv_d,
                                            t_min, t_max)
    nxt = jnp.where(is_leaf, cont, nxt_int)
    push = push & ~is_leaf & live
    reg_e = jnp.where(push, far, reg_e)
    reg_s = jnp.where(push, cont, reg_s)
    redirect = live & (reg_e >= 0) & (nxt == reg_e)
    nxt = jnp.where(redirect, reg_s, nxt)
    reg_e = jnp.where(redirect, -1, reg_e)
    cur = jnp.where(live, nxt, cur)
    return cur, reg_e, reg_s, lt, lid


def closest_hit_pair(table, k: int, r_o, r_d, active, fmt: str = "mt"):
    """Closest-hit via the pair walk; same results as closest_hit /
    closest_hit_packed (closest-hit is order-independent)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32)
    inv_d = vec.safe_inv(r_d, jnp)
    octant = ray_octant(r_d)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    reg0 = jnp.full((n,), -1, jnp.int32)
    state = (cur0, reg0, reg0, jnp.full((n,), MISS_T),
             jnp.full((n,), -1, jnp.int32))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, reg_e, reg_s, d_min, hit_id = s
        live = cur < sentinel
        cur, reg_e, reg_s, lt, lid = pair_step(
            table, k, r_o, r_d, inv_d, octant, cur, reg_e, reg_s,
            jnp.float32(0.0), d_min, jnp.float32(0.0), d_min, live,
            fmt=fmt)
        take = lid >= 0
        d_min = jnp.where(take, lt, d_min)
        hit_id = jnp.where(take, lid, hit_id)
        return cur, reg_e, reg_s, d_min, hit_id

    _, _, _, d_min, hit_id = jax.lax.while_loop(cond, body, state)
    return d_min, hit_id


def any_hit_pair(table, k: int, r_o, r_d, max_dist, active, fmt: str = "mt"):
    """Shadow traversal via the pair walk (trace_shadow parity: plain
    1/d, constant (1e-3, max_dist) window, early exit)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.zeros((n,), bool)
    inv_d = (1.0 / r_d).astype(jnp.float32)
    octant = ray_octant(r_d)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    reg0 = jnp.full((n,), -1, jnp.int32)
    state = (cur0, reg0, reg0, jnp.zeros((n,), bool))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, reg_e, reg_s, occ = s
        live = cur < sentinel
        cur, reg_e, reg_s, _, lid = pair_step(
            table, k, r_o, r_d, inv_d, octant, cur, reg_e, reg_s,
            jnp.float32(1e-3), max_dist,
            jnp.float32(1e-3), max_dist - 1e-3, live, fmt=fmt)
        occ = occ | (lid >= 0)
        cur = jnp.where(occ, sentinel, cur)
        return cur, reg_e, reg_s, occ

    _, _, _, occ = jax.lax.while_loop(cond, body, state)
    return occ


# --- Quad-row traversal (v5; see accel/bvh.py pack_quad_table) -------
#
# Four-boxes-per-row stackless walk over the collapsed 4-ary tree: a
# fetched internal row tests all child boxes and jumps to the first
# hit child in per-octant front-to-back order; missed later siblings
# entered through the thread are absorbed by containment, and a
# 3-slot skip-register file removes most of that waste.  0.52-0.64x
# the threaded walk's gathers on the bench scenes
# (scripts/sim_pair_walk.py multi_walk).

QUAD_REGS = 3


def _quad_decode(row, octant, r_o, inv_d, t_min, t_max):
    """Internal-row decode for the quad walk.

    Returns (cont, nxt_int, pushes) where ``pushes`` is a list of
    (push, target, succ) triples in LIFO order (nearest missed sibling
    last, so after pushing in sequence it sits at register slot 0).
    All elementwise selects riding the row gather."""
    # One packed column per octant (cont*256 + perm, bvh.py layout),
    # selected by the _mux8 binary tree (7 selects vs the 8-term
    # one-hot FMA's ~32 ops): pure selection of identical values, so
    # bit-identical -- the decode's select network is the exposed
    # per-step cost (docs/PERFORMANCE.md 2b.3).
    cp = _mux8(octant, [row[:, QUAD_COL_CONT + o] for o in range(8)])
    cpi = cp.astype(jnp.int32)
    cont = cpi >> 8
    perm = cpi & 255
    b = QUAD_COL_BODY
    hits_c = [aabb_hit(row[:, b + 6 * i:b + 6 * i + 6], r_o, inv_d,
                       t_min, t_max) for i in range(4)]
    ents_c = [row[:, b + QB_ENT + i].astype(jnp.int32) for i in range(4)]
    nsl = jnp.clip(row[:, b + QB_NSLOTS], 0, 4).astype(jnp.int32)

    def mux4(slot, vals, zero):
        # Binary select tree over the 2-bit slot (5 ops vs the 8 of a
        # where-chain); slot is always in [0, 4) so ``zero`` is dead.
        del zero
        s0 = (slot & 1) == 1
        a = jnp.where(s0, vals[1], vals[0])
        c = jnp.where(s0, vals[3], vals[2])
        return jnp.where((slot & 2) == 2, c, a)

    hit_p, ent_p = [], []
    for pos in range(4):
        slot = (perm >> (2 * pos)) & 3
        valid = pos < nsl
        hit_p.append(mux4(slot, hits_c, hits_c[0]) & valid)
        ent_p.append(mux4(slot, ents_c, ents_c[0]))
    nxt_int = cont
    for pos in range(3, -1, -1):
        nxt_int = jnp.where(hit_p[pos], ent_p[pos], nxt_int)
    pushes = []
    prefix = hit_p[0]
    for pos in range(1, 4):
        valid = pos < nsl
        succ = (jnp.where(pos + 1 < nsl, ent_p[pos + 1], cont)
                if pos < 3 else cont)
        pushes.append((prefix & ~hit_p[pos] & valid, ent_p[pos], succ))
        prefix = prefix | hit_p[pos]
    pushes.reverse()  # push farthest first so nearest lands at slot 0
    return cont, nxt_int, pushes


def _quad_decode_rank(row, octant, r_o, inv_d, t_min, t_max):
    """Rank-based internal-row decode for register-free quad walks
    (cfg.quad_regs == 0, table packed with perm_kind="slot2pos").

    The packed octant column's low byte holds each child SLOT's
    front-to-back POSITION (its rank); the first-entered child is the
    min-rank hit child -- a 4-way argmin tournament (3 compares + 6
    selects) instead of _quad_decode's permutation mux network (perm
    unpack + eight 4-way muxes + the 4-deep first-hit chain, ~40
    selects).  Exactly the same child wins (ranks are the thread
    order), so the register-free walk is bit-identical visit-for-visit
    to _quad_decode at quad_regs=0.  No pushes are produced: the skip
    registers need position->slot information this layout drops, which
    is fine -- the rank decode exists only for the register-free walk.

    Pad slots bake rank 3 and always "hit" (inverted boxes under the
    swapping slab test), so the hit mask must include slot < nslots.
    """
    cp = _mux8(octant, [row[:, QUAD_COL_CONT + o] for o in range(8)])
    cpi = cp.astype(jnp.int32)
    cont = cpi >> 8
    inv = cpi & 255
    b = QUAD_COL_BODY
    nsl = jnp.clip(row[:, b + QB_NSLOTS], 0, 4).astype(jnp.int32)
    MISSK = jnp.int32(4)
    keys, ents = [], []
    for i in range(4):
        hit = aabb_hit(row[:, b + 6 * i:b + 6 * i + 6], r_o, inv_d,
                       t_min, t_max) & (i < nsl)
        rank = (inv >> (2 * i)) & 3
        keys.append(jnp.where(hit, rank, MISSK))
        ents.append(row[:, b + QB_ENT + i].astype(jnp.int32))

    def mn(k0, e0, k1, e1):
        take0 = k0 <= k1
        return jnp.where(take0, k0, k1), jnp.where(take0, e0, e1)

    ka, ea = mn(keys[0], ents[0], keys[1], ents[1])
    kb, eb = mn(keys[2], ents[2], keys[3], ents[3])
    km, em = mn(ka, ea, kb, eb)
    nxt_int = jnp.where(km < MISSK, em, cont)
    return cont, nxt_int, []


def _quad_decode_oct(row, octant, r_o, inv_d, t_min, t_max):
    """Internal-row decode for the octant-baked quad layout
    (accel/bvh.py pack_quad_oct_table): boxes and entry links are
    already stored in this octant's front-to-back order, so the
    permutation mux network of _quad_decode (extract 2-bit slots +
    eight 4-way muxes, the round-3 decomposition's largest exposed
    non-gather bucket) disappears entirely.  Only the continuation
    keeps the 8-way mux -- leaf rows are octant-shared and internal
    replicas store their own cont in all 8 columns so the same mux
    serves both.  Same (cont, nxt_int, pushes) contract as
    _quad_decode."""
    cont = _mux8(octant,
                 [row[:, QUAD_COL_CONT + o] for o in range(8)]
                 ).astype(jnp.int32)
    b = QUAD_COL_BODY
    nsl = jnp.clip(row[:, b + QB_NSLOTS], 0, 4).astype(jnp.int32)
    # Pad slots always "hit" (inverted boxes span the whole line under
    # the swapping slab test) but their entry IS the row continuation
    # (pack_quad_oct_table), so selecting them is the fall-through --
    # no explicit nsl mask needed on the hit tests.
    hit_p = [aabb_hit(row[:, b + 6 * pos:b + 6 * pos + 6], r_o, inv_d,
                      t_min, t_max) for pos in range(4)]
    ent_p = [row[:, b + QB_ENT + pos].astype(jnp.int32)
             for pos in range(4)]
    nxt_int = cont
    for pos in range(3, -1, -1):
        nxt_int = jnp.where(hit_p[pos], ent_p[pos], nxt_int)
    pushes = []
    prefix = hit_p[0]
    for pos in range(1, 4):
        valid = pos < nsl   # pad entries must not enter the registers
        succ = (jnp.where(pos + 1 < nsl, ent_p[pos + 1], cont)
                if pos < 3 else cont)
        pushes.append((prefix & ~hit_p[pos] & valid, ent_p[pos], succ))
        prefix = prefix | hit_p[pos]
    pushes.reverse()  # push farthest first so nearest lands at slot 0
    return cont, nxt_int, pushes


def _regfile_apply(reg_e, reg_s, pushes, nxt, live, gate,
                   passes: int = 2):
    """Advance the skip-register file: shift-push each (push, target,
    succ) triple (already LIFO-ordered), then redirect ``nxt`` past
    known-missed entries, consuming matches.  Two redirect passes
    resolve chained misses (a redirect landing on another registered
    entry); one pass leaves those to containment absorption (identical
    results -- visit order/count changes only).  ``gate`` masks lanes
    whose row was internal and live.  reg_e/reg_s are [n, R]."""
    es = [reg_e[:, r] for r in range(reg_e.shape[1])]
    ss = [reg_s[:, r] for r in range(reg_s.shape[1])]
    for push, tgt, succ in pushes:
        p = push & gate
        for r in range(len(es) - 1, 0, -1):
            es[r] = jnp.where(p, es[r - 1], es[r])
            ss[r] = jnp.where(p, ss[r - 1], ss[r])
        es[0] = jnp.where(p, tgt, es[0])
        ss[0] = jnp.where(p, succ, ss[0])
    for _ in range(max(1, passes)):
        for r in range(len(es)):
            m = live & (es[r] >= 0) & (nxt == es[r])
            nxt = jnp.where(m, ss[r], nxt)
            es[r] = jnp.where(m, -1, es[r])
    return jnp.stack(es, -1), jnp.stack(ss, -1), nxt


def quad_step(table, k: int, r_o, r_d, inv_d, octant, cur, reg_e, reg_s,
              t_min, t_max, tlo, thi, live, fmt: str = "mt",
              oct_stride: int | None = None, select: str = "perm"):
    """One quad-row step shared by the closest/any-hit walks: gathers
    each live lane's current row, MT-tests leaf rows, first-hit-
    branches internal rows, and advances the 3-slot skip-register
    file.  Returns (cur', reg_e', reg_s', leaf_t, leaf_id).

    ``oct_stride`` (not None = the octant-baked layout,
    pack_quad_oct_table): a fresh walk at cur == 0 gathers its lane's
    octant root row (octant * stride) and the decode reads
    pre-permuted slots.

    ``select="rank"`` (table packed with perm_kind="slot2pos") uses
    the argmin rank decode; it produces no pushes, so pass
    reg_e/reg_s=None to drop the register file."""
    sentinel = table.shape[0]
    cur_m = cur
    if oct_stride is not None and oct_stride > 0:
        cur_m = jnp.where(cur == 0, octant * oct_stride, cur)
    idx = jnp.where(live, jnp.minimum(cur_m, sentinel - 1), 0)
    row = table[idx]
    prim_start = row[:, 0].astype(jnp.int32)
    prim_count = row[:, 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    lt, lid = _fat_leaf_intersect(row, k, r_o, r_d, prim_start,
                                  prim_count, tlo, thi,
                                  base0=QUAD_COL_BODY, fmt=fmt)
    lid = jnp.where(live & is_leaf, lid, -1)

    decode = (_quad_decode_rank if select == "rank"
              else _quad_decode if oct_stride is None
              else _quad_decode_oct)
    cont, nxt_int, pushes = decode(row, octant, r_o, inv_d,
                                   t_min, t_max)
    nxt = jnp.where(is_leaf, cont, nxt_int)
    if reg_e is not None:
        reg_e, reg_s, nxt = _regfile_apply(reg_e, reg_s, pushes, nxt,
                                           live, ~is_leaf & live)
    cur = jnp.where(live, nxt, cur)
    return cur, reg_e, reg_s, lt, lid


def closest_hit_quad(table, k: int, r_o, r_d, active, fmt: str = "mt",
                     oct_stride: int | None = None,
                     select: str = "perm"):
    """Closest-hit via the quad walk; same results as closest_hit
    (closest-hit is order-independent)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32)
    inv_d = vec.safe_inv(r_d, jnp)
    octant = ray_octant(r_d)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    use_regs = select != "rank"
    reg0 = (jnp.full((n, QUAD_REGS), -1, jnp.int32) if use_regs
            else jnp.zeros((n, 0), jnp.int32))
    state = (cur0, reg0, reg0, jnp.full((n,), MISS_T),
             jnp.full((n,), -1, jnp.int32))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, reg_e, reg_s, d_min, hit_id = s
        live = cur < sentinel
        cur, re, rs, lt, lid = quad_step(
            table, k, r_o, r_d, inv_d, octant, cur,
            reg_e if use_regs else None, reg_s if use_regs else None,
            jnp.float32(0.0), d_min, jnp.float32(0.0), d_min, live,
            fmt=fmt, oct_stride=oct_stride, select=select)
        take = lid >= 0
        d_min = jnp.where(take, lt, d_min)
        hit_id = jnp.where(take, lid, hit_id)
        return (cur, re if use_regs else reg_e,
                rs if use_regs else reg_s, d_min, hit_id)

    _, _, _, d_min, hit_id = jax.lax.while_loop(cond, body, state)
    return d_min, hit_id


def any_hit_quad(table, k: int, r_o, r_d, max_dist, active, fmt: str = "mt",
                 oct_stride: int | None = None, select: str = "perm"):
    """Shadow traversal via the quad walk (trace_shadow parity: plain
    1/d, constant (1e-3, max_dist) window, early exit)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.zeros((n,), bool)
    inv_d = (1.0 / r_d).astype(jnp.float32)
    octant = ray_octant(r_d)
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    use_regs = select != "rank"
    reg0 = (jnp.full((n, QUAD_REGS), -1, jnp.int32) if use_regs
            else jnp.zeros((n, 0), jnp.int32))
    state = (cur0, reg0, reg0, jnp.zeros((n,), bool))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, reg_e, reg_s, occ = s
        live = cur < sentinel
        cur, re, rs, _, lid = quad_step(
            table, k, r_o, r_d, inv_d, octant, cur,
            reg_e if use_regs else None, reg_s if use_regs else None,
            jnp.float32(1e-3), max_dist,
            jnp.float32(1e-3), max_dist - 1e-3, live, fmt=fmt,
            oct_stride=oct_stride, select=select)
        occ = occ | (lid >= 0)
        cur = jnp.where(occ, sentinel, cur)
        return (cur, re if use_regs else reg_e,
                rs if use_regs else reg_s, occ)

    _, _, _, occ = jax.lax.while_loop(cond, body, state)
    return occ


def closest_hit_packed(table, k: int, r_o, r_d, active, fmt: str = "mt"):
    """Closest-hit over the fused fat-leaf table [M, 9K+24].

    Semantics identical to ``closest_hit`` (same pruning window, same
    strict-< update, leaf primitives tested in array order); the
    visit order is the near-child-first octant order, which only
    changes exact-tie winners.  One HBM row gather per (ray, visited
    node) -- the measured cost unit on TPU v5e (~4 ns/lane/step).
    """
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32)

    inv_d = vec.safe_inv(r_d, jnp)
    octant = ray_octant(r_d)
    col_ps = 6 + LEAF_STRIDE[fmt] * k
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    state = (cur0, jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, d_min, hit_id = s
        live = cur < sentinel
        idx = jnp.minimum(cur, sentinel - 1)
        row = table[idx]
        hit = aabb_hit(row[:, :6], r_o, inv_d, jnp.float32(0.0), d_min) & live
        prim_start = row[:, col_ps].astype(jnp.int32)
        prim_count = row[:, col_ps + 1].astype(jnp.int32)
        is_leaf = prim_start >= 0
        lt, lid = _leaf_intersect(row, k, r_o, r_d, prim_start, prim_count,
                                  jnp.float32(0.0), d_min, fmt=fmt)
        take = hit & is_leaf & (lid >= 0)
        d_min = jnp.where(take, lt, d_min)
        hit_id = jnp.where(take, lid, hit_id)
        nh, nm = _decode_links(row, octant, k, fmt=fmt)
        nxt = jnp.where(hit & ~is_leaf, nh, nm)
        cur = jnp.where(live, nxt, sentinel)
        return cur, d_min, hit_id

    _, d_min, hit_id = jax.lax.while_loop(cond, body, state)
    return d_min, hit_id


def any_hit_packed(table, k: int, r_o, r_d, max_dist, active, fmt: str = "mt"):
    """Shadow traversal over the fused table (trace_shadow parity:
    plain 1/d, constant (0.001, max_dist) window, early exit)."""
    n = r_o.shape[0]
    sentinel = table.shape[0]
    if sentinel == 0:
        return jnp.zeros((n,), bool)

    inv_d = (1.0 / r_d).astype(jnp.float32)
    octant = ray_octant(r_d)
    col_ps = 6 + LEAF_STRIDE[fmt] * k
    cur0 = jnp.where(active, 0, sentinel).astype(jnp.int32)
    state = (cur0, jnp.zeros((n,), bool))

    def cond(s):
        return jnp.any(s[0] < sentinel)

    def body(s):
        cur, occluded = s
        live = cur < sentinel
        idx = jnp.minimum(cur, sentinel - 1)
        row = table[idx]
        hit = aabb_hit(row[:, :6], r_o, inv_d, jnp.float32(1e-3),
                       max_dist) & live
        prim_start = row[:, col_ps].astype(jnp.int32)
        prim_count = row[:, col_ps + 1].astype(jnp.int32)
        is_leaf = prim_start >= 0
        _, lid = _leaf_intersect(
            row, k, r_o, r_d, prim_start, prim_count,
            jnp.float32(1e-3), max_dist - 1e-3, fmt=fmt)
        occluded = occluded | (hit & is_leaf & (lid >= 0))
        nh, nm = _decode_links(row, octant, k, fmt=fmt)
        nxt = jnp.where(hit & ~is_leaf, nh, nm)
        cur = jnp.where(live & ~occluded, nxt, sentinel)
        return cur, occluded

    _, occluded = jax.lax.while_loop(cond, body, state)
    return occluded


def closest_hit(bounds, leaf_prim, miss, tri_v0, tri_v1, tri_v2,
                r_o, r_d, active):
    """Closest-hit traversal for a wave of rays.

    Args:
      bounds [M,6] f32, leaf_prim [M] i32 (prim or -1), miss [M] i32
        (sentinel M): the threaded BVH.
      tri_v0/1/2 [T,3] f32: triangle vertices (BVH primitive order).
      r_o, r_d [N,3] f32; active [N] bool.

    Returns (t [N] f32 = 1e20 on miss, hit_id [N] i32 = -1 on miss).
    """
    m = int(bounds.shape[0])
    n = r_o.shape[0]
    if m == 0:
        return jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32)

    inv_d = vec.safe_inv(r_d, jnp)  # renderer.cu:371-379
    cur0 = jnp.where(active, 0, m).astype(jnp.int32)
    state = (cur0, jnp.full((n,), MISS_T), jnp.full((n,), -1, jnp.int32))

    def cond(s):
        return jnp.any(s[0] < m)

    def body(s):
        cur, d_min, hit_id = s
        idx = jnp.minimum(cur, m - 1)
        live = cur < m
        nb = bounds[idx]
        hit = aabb_hit(nb, r_o, inv_d, jnp.float32(0.0), d_min) & live
        lp = leaf_prim[idx]
        is_leaf = lp >= 0
        pidx = jnp.maximum(lp, 0)
        t = moller_trumbore(tri_v0[pidx], tri_v1[pidx], tri_v2[pidx], r_o, r_d)
        take = hit & is_leaf & (t > 0.0) & (t < d_min)  # renderer.cu:412
        d_min = jnp.where(take, t, d_min)
        hit_id = jnp.where(take, pidx, hit_id)
        nxt = jnp.where(hit & ~is_leaf, idx + 1, miss[idx])
        cur = jnp.where(live, nxt, m).astype(jnp.int32)
        return cur, d_min, hit_id

    _, d_min, hit_id = jax.lax.while_loop(cond, body, state)
    return d_min, hit_id


def any_hit(bounds, leaf_prim, miss, tri_v0, tri_v1, tri_v2,
            r_o, r_d, max_dist, active):
    """Shadow (any-hit) traversal: True where something occludes.

    Parity with trace_shadow (renderer.cu:273-314): the AABB window is
    the constant (0.001, max_dist); an occluder counts when
    ``0.001 < t < max_dist - 0.001``; the walk early-exits per ray on
    the first occluder.  Note the reference uses a *plain* reciprocal
    here (renderer.cu:276), not the safe inverse -- preserved.
    """
    m = int(bounds.shape[0])
    n = r_o.shape[0]
    if m == 0:
        return jnp.zeros((n,), bool)

    inv_d = (1.0 / r_d).astype(jnp.float32)
    cur0 = jnp.where(active, 0, m).astype(jnp.int32)
    state = (cur0, jnp.zeros((n,), bool))

    def cond(s):
        return jnp.any(s[0] < m)

    def body(s):
        cur, occluded = s
        idx = jnp.minimum(cur, m - 1)
        live = cur < m
        nb = bounds[idx]
        hit = aabb_hit(nb, r_o, inv_d, jnp.float32(1e-3), max_dist) & live
        lp = leaf_prim[idx]
        is_leaf = lp >= 0
        pidx = jnp.maximum(lp, 0)
        t = moller_trumbore(tri_v0[pidx], tri_v1[pidx], tri_v2[pidx], r_o, r_d)
        occ_now = hit & is_leaf & (t > 1e-3) & (t < max_dist - 1e-3)
        occluded = occluded | occ_now
        nxt = jnp.where(hit & ~is_leaf, idx + 1, miss[idx])
        cur = jnp.where(live & ~occluded, nxt, m).astype(jnp.int32)
        return cur, occluded

    _, occluded = jax.lax.while_loop(cond, body, state)
    return occluded
