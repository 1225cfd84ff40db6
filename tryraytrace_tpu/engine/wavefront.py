"""The wavefront path tracer: the TPU-native replacement for the
reference's CUDA megakernel (renderer.cu:317-760).

Architecture inversion, not translation: instead of one thread per
pixel carrying a serial 30-bounce loop with divergent control flow,
the *entire ray population* advances bounce-by-bounce in lockstep
inside one ``jax.jit``:

  raygen -> [closest-hit traversal -> shade (+NEE shadow wave)] x depth

Each stage is branch-free masked math over SoA buffers; the bounce
loop is a ``lax.while_loop`` that exits when every path is dead,
and each traversal is itself a lockstep threaded-BVH walk
(ops/traverse.py).  Dead lanes are masked, not compacted -- with RR
after depth 3 the live fraction collapses fast and masking measures
cheaper than sort/segment compaction at these scene sizes (SURVEY.md
hard-part #2); a compaction path can slot in between bounces later
without changing any semantics.

Every constant, epsilon and draw order matches the reference; the RNG
is the shared counter-based hash (core/rng.py) so the NumPy oracle
produces bit-comparable frames.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.core import rng, vec
from tryraytrace_tpu.engine.camera_rays import generate_rays
from tryraytrace_tpu.ops import shade
from tryraytrace_tpu.ops.texture import interp_uv, planar_uv, sample_textures
from tryraytrace_tpu.ops.traverse import any_hit_packed, closest_hit_packed

PI = np.float32(np.pi)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def render_sample(scene, textures, cam, seed, width: int, height: int,
                  cfg: RenderConfig, pixel_idx=None, with_stats: bool = False):
    """Trace one 1-spp pass for all pixels -> radiance [N, 3].

    ``seed`` is the per-sample uint32 seed; ``pixel_idx`` (optional
    [N] i32) supports sharded/tiled rendering -- RNG streams are keyed
    by absolute pixel index so tiling never changes the image.
    ``with_stats=True`` additionally returns (rays_traced,
    shadow_rays_traced) float32 scalars, the basis of the Mrays/s
    benchmark metric.
    """
    n = width * height if pixel_idx is None else pixel_idx.shape[0]
    if pixel_idx is None:
        pixel_idx = jnp.arange(n, dtype=jnp.int32)
    seed = jnp.asarray(seed).astype(jnp.uint32)

    r_o, r_d = generate_rays(cam, width, height, seed, pixel_idx)

    carry = (
        jnp.int32(0),                              # depth
        r_o,
        r_d,
        jnp.ones((n, 3), jnp.float32),             # throughput
        jnp.zeros((n, 3), jnp.float32),            # radiance
        jnp.ones((n,), bool),                      # alive
        jnp.ones((n,), bool),                      # prev bounce specular
        jnp.zeros((), jnp.float32),                # rays traced (stats)
        jnp.zeros((), jnp.float32),                # shadow rays (stats)
    )

    def cond(c):
        alive = c[5]
        return (c[0] < cfg.max_depth) & jnp.any(alive)

    def body(c):
        depth, o, d, tp, rad, alive, prev_spec, n_traced, n_shadow = c
        n_traced = n_traced + alive.sum().astype(jnp.float32)
        o, d, tp, rad, alive, prev_spec, shadow = _bounce(
            scene, textures, seed, pixel_idx, depth,
            o, d, tp, rad, alive, prev_spec, cfg,
        )
        return (depth + 1, o, d, tp, rad, alive, prev_spec,
                n_traced, n_shadow + shadow)

    (_, _, _, _, rad, _alive, _prev,
     n_traced, n_shadow) = jax.lax.while_loop(cond, body, carry)
    rad = _sanitize(rad, cfg)
    if with_stats:
        return rad, (n_traced, n_shadow)
    return rad


def _bounce(scene, textures, seed, pixel_idx, depth,
            o, d, tp, rad, alive, prev_spec, cfg: RenderConfig):
    """One wavefront bounce: traverse, shade, NEE, next-ray selection.

    Traversal and hit-data fetches go through the fused row tables
    (accel/bvh.py): one gather per node visit, one gather for all
    shading inputs -- HBM random-row fetches are the measured cost
    unit on TPU, so fewer/wider beats many/narrow.
    """
    t, hit_id = closest_hit_packed(scene.node_table, scene.leaf_size,
                                   o, d, alive, fmt=scene.leaf_fmt)
    alive = alive & (hit_id >= 0)  # miss -> path ends (renderer.cu:427)
    sid = jnp.maximum(hit_id, 0)

    hitrow = scene.trimat[sid]
    v0 = hitrow[:, 0:3]
    v1 = hitrow[:, 3:6]
    v2 = hitrow[:, 6:9]
    x_hit = o + d * t[..., None]

    # Face normal, two-sided flip (renderer.cu:441-446).
    nrm = vec.norm(vec.cross(v1 - v0, v2 - v0, jnp), jnp)
    nl = jnp.where((vec.dot(nrm, d, jnp) < 0.0)[..., None], nrm, -nrm)

    albedo = hitrow[:, 9:12]
    emission = hitrow[:, 12:15]
    metallic = hitrow[:, 15]
    roughness = hitrow[:, 16]
    ior = hitrow[:, 17]
    transmission = hitrow[:, 18]

    # Texture modulation: planar projection (renderer.cu:463-481), or
    # interpolated per-vertex UVs where present (beyond-reference,
    # RenderConfig.uv_mapping; sliver triangles fall back to planar).
    if textures:
        t_u, t_v = planar_uv(x_hit, nrm, jnp.float32(cfg.tex_planar_scale))
        if cfg.uv_mapping and scene.has_uvs:
            b1, b2, okb = shade.barycentric(v0, v1, v2, x_hit)
            iu, iv = interp_uv(hitrow[:, 30:36], b1, b2)
            use_uv = (hitrow[:, 36] > 0.0) & okb
            t_u = jnp.where(use_uv, iu, t_u)
            t_v = jnp.where(use_uv, iv, t_v)
        factor = sample_textures(
            textures, hitrow[:, 19].astype(jnp.int32), t_u, t_v)
        albedo = albedo * factor

    # Ray-offset origins keep the geometric front-face normal; smooth
    # shading swaps the interpolated vertex normal into every shading
    # direction (see RenderConfig.smooth_shading).
    nl_off = nl
    if cfg.smooth_shading and scene.has_normals:
        nrm = shade.smooth_normal(v0, v1, v2, hitrow[:, 21:24],
                                  hitrow[:, 24:27], hitrow[:, 27:30],
                                  x_hit, nrm)
        nl = jnp.where((vec.dot(nrm, d, jnp) < 0.0)[..., None], nrm, -nrm)

    # Emission accounting (renderer.cu:486-499): add only when the
    # previous bounce was specular/refractive (NEE double-count guard);
    # any emitter terminates the path.
    rad = rad + jnp.where((alive & prev_spec)[..., None], tp * emission, 0.0)
    is_emitter = (emission > cfg.emitter_stop_threshold).any(axis=-1)
    alive = alive & ~is_emitter

    # Branch probabilities (renderer.cu:502-556).
    p_spec, p_trans, fres = shade.pbr_weights(
        albedo, metallic, roughness, transmission, nl, d)

    base = rng.CAMERA_DRAWS + depth * rng.DRAWS_PER_BOUNCE

    # Russian roulette after depth 3 (renderer.cu:559-565).
    u_rr = rng.uniform(seed, pixel_idx, base + rng.SLOT_RR, jnp)
    rr_on = depth > cfg.rr_threshold
    p_live = jnp.maximum(albedo.max(axis=-1), cfg.rr_min_p)
    survive = u_rr < p_live
    tp = jnp.where((rr_on & alive & survive)[..., None],
                   tp * (1.0 / p_live)[..., None], tp)
    alive = alive & (~rr_on | survive)

    # Exclusive branch selection (renderer.cu:567-571,592,651).
    u_b = rng.uniform(seed, pixel_idx, base + rng.SLOT_BRANCH, jnp)
    m_spec = alive & (u_b < p_spec)
    m_trans = alive & ~m_spec & (u_b < p_spec + p_trans)
    m_diff = alive & ~m_spec & ~m_trans

    u_d1 = rng.uniform(seed, pixel_idx, base + rng.SLOT_DIR_R1, jnp)
    u_d2 = rng.uniform(seed, pixel_idx, base + rng.SLOT_DIR_R2, jnp)

    # --- Branch A: specular (renderer.cu:571-589) ---
    perfect = shade.reflect(d, nrm)
    d_spec = shade.rough_perturb(perfect, roughness, u_d1, u_d2)
    kill_spec = vec.dot(d_spec, nl, jnp) <= 0.0  # below-surface -> die
    # Unguarded 1/p like the reference (renderer.cu:584): a zero
    # probability on a *selected* lane yields inf and the sample is
    # dropped by the NaN/Inf filter; unselected lanes are discarded.
    tp_spec = tp * fres * (1.0 / p_spec)[..., None]
    o_spec = x_hit + nl_off * np.float32(cfg.shadow_eps)

    # --- Branch B: transmission (renderer.cu:592-648) ---
    d_trans, _tir = shade.refract_branch(d, nrm, nl, ior, roughness, u_d1, u_d2)
    p_branch = (1.0 - p_spec) * transmission
    tp_trans = jnp.where(
        (p_branch > 1e-4)[..., None],
        tp * albedo / jnp.where(p_branch > 1e-4, p_branch, 1.0)[..., None],
        tp,
    )
    o_trans = x_hit + d_trans * np.float32(cfg.refr_offset)

    # --- Branch C: diffuse + NEE (renderer.cu:651-733) ---
    n_shadow = jnp.zeros((), jnp.float32)
    if scene.num_lights > 0:
        nee_rad, n_shadow = _nee_contribution(
            scene, seed, pixel_idx, base, x_hit, nl, albedo, tp, m_diff,
            cfg, nl_off=nl_off)
        rad = rad + nee_rad
    d_diff = shade.cosine_hemisphere(nl, u_d1, u_d2)
    p_diff = 1.0 - p_spec - (1.0 - p_spec) * transmission  # renderer.cu:727
    tp_diff = (tp * (albedo * (1.0 - metallic)[..., None])
               * (1.0 / p_diff)[..., None])  # unguarded, renderer.cu:728
    o_diff = x_hit + nl_off * np.float32(cfg.shadow_eps)

    # --- Select ---
    m_spec3 = m_spec[..., None]
    m_trans3 = m_trans[..., None]
    m_diff3 = m_diff[..., None]
    d = jnp.where(m_spec3, d_spec, jnp.where(m_trans3, d_trans, d_diff))
    o = jnp.where(m_spec3, o_spec, jnp.where(m_trans3, o_trans, o_diff))
    tp = jnp.where(m_spec3, tp_spec,
                   jnp.where(m_trans3, tp_trans,
                             jnp.where(m_diff3, tp_diff, tp)))
    alive = alive & ~(m_spec & kill_spec)
    prev_spec = jnp.where(m_spec | m_trans, True,
                          jnp.where(m_diff, False, prev_spec))
    return o, d, tp, rad, alive, prev_spec, n_shadow


def _nee_contribution(scene, seed, pixel_idx, base, x_hit, nl, albedo, tp,
                      m_diff, cfg: RenderConfig, nl_off=None):
    """Next-event estimation for diffuse lanes (renderer.cu:657-711).

    Shadow rays form their own any-hit wave.  Preserved quirks: the
    dist_sq >= 5 floor (renderer.cu:674) and that L_dir is computed
    from the *unclamped* to-light vector over the clamped distance.
    """
    lcount = scene.num_lights
    u4 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_PICK, jnp)
    u5 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_R1, jnp)
    u6 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_R2, jnp)

    pick = (u4 * (lcount - 0.001)).astype(jnp.int32)
    pick = jnp.clip(pick, 0, lcount - 1)
    li = scene.light_indices[pick]
    lrow = scene.trimat[li]
    lv0 = lrow[:, 0:3]
    lv1 = lrow[:, 3:6]
    lv2 = lrow[:, 6:9]

    light_pos = shade.sample_triangle(lv0, lv1, lv2, u5, u6)
    to_light = light_pos - x_hit
    dist_sq = vec.dot(to_light, to_light, jnp)
    if cfg.nee_dist_floor_enabled:
        dist_sq = jnp.maximum(dist_sq, cfg.nee_dist_sq_floor)
    dist = jnp.sqrt(dist_sq)
    l_dir = to_light * (1.0 / dist)[..., None]

    cos_theta = vec.dot(nl, l_dir, jnp)
    light_n = vec.norm(vec.cross(lv1 - lv0, lv2 - lv0, jnp), jnp)
    cos_light = -vec.dot(light_n, l_dir, jnp)
    geo_ok = m_diff & (cos_theta > 0.0) & (cos_light > 0.0)

    shadow_o = x_hit + (nl if nl_off is None else nl_off) \
        * np.float32(cfg.shadow_eps)
    occluded = any_hit_packed(
        scene.node_table, scene.leaf_size, shadow_o, l_dir,
        dist - np.float32(cfg.shadow_max_dist_eps), geo_ok,
        fmt=scene.leaf_fmt,
    )
    lit = geo_ok & ~occluded

    area = lrow[:, 20]  # precomputed triangle_area (renderer.cu:188-192)
    pdf = 1.0 / (area * lcount)
    g_term = (cos_theta * cos_light) / dist_sq
    brdf = albedo * (1.0 / PI)
    contrib = lrow[:, 12:15] * brdf * (g_term / pdf)[..., None]
    return (jnp.where(lit[..., None], tp * contrib, 0.0),
            geo_ok.sum().astype(jnp.float32))


def _sanitize(rad, cfg: RenderConfig):
    """Sample sanitation before accumulation (renderer.cu:737-756):
    NaN/Inf drops the whole sample, negatives clamp to 0, luminance
    fireflies rescale to 100."""
    bad = (jnp.isnan(rad) | jnp.isinf(rad)).any(axis=-1)
    rad = jnp.where(bad[..., None], 0.0, rad)
    rad = jnp.maximum(rad, 0.0)
    if cfg.clamp_fireflies:
        lum = (rad[..., 0] * np.float32(0.21)
               + rad[..., 1] * np.float32(0.71)
               + rad[..., 2] * np.float32(0.07))
        over = lum > cfg.firefly_clamp
        scale = jnp.where(over, cfg.firefly_clamp / jnp.where(over, lum, 1.0), 1.0)
        rad = rad * scale[..., None]
    return rad


def render_frame(scene, textures, cam, frame_seed, width: int, height: int,
                 cfg: RenderConfig, spp: int | None = None, pixel_idx=None,
                 with_stats: bool = False, sample_offset: int = 0,
                 seed_spp: int | None = None, pixel_affine_base=None):
    """One frame's radiance sum over ``spp`` samples -> [N, 3].

    ``pixel_affine_base`` (optional, scalar): the caller's promise
    that ``pixel_idx[j] == pixel_affine_base + j`` (e.g. a mesh
    shard's contiguous row block).  It lets the persistent engine's
    quota schedule claim pixels elementwise in its inline per-step
    program (render_frame_persistent pixel_pool_fn) instead of
    gathering from the pool array.

    The reference accumulates one sample per kernel launch with the
    frame counter as the seed (main.cpp:181, renderer.cu:326); seeds
    here are ``1984 + frame*seed_spp + (sample_offset + s)`` so any
    (frame, spp) tiling of the same total sample count yields the same
    set of RNG streams -- ``sample_offset``/``seed_spp`` let a
    sample-parallel mesh shard render its slice of the frame's sample
    set with bit-identical streams.  The persistent engine renders all
    spp in one regenerating wave; the bounce engine loops samples.
    Identical images either way.
    """
    spp = cfg.spp if spp is None else spp
    seed_spp = spp if seed_spp is None else seed_spp
    frame_seed = jnp.asarray(frame_seed).astype(jnp.uint32)
    n = width * height if pixel_idx is None else pixel_idx.shape[0]
    affine_base = (jnp.int32(0) if pixel_idx is None
                   else (None if pixel_affine_base is None
                         else jnp.asarray(pixel_affine_base, jnp.int32)))

    if cfg.engine == "persistent":
        from tryraytrace_tpu.engine.persistent import render_frame_persistent

        # Oversize frames render in sequential chunks: the owner
        # scheduler chunks at the wave width; the pool scheduler
        # chunks at pool_span (several pixels of work-stealing
        # headroom per lane, straggler tail paid once per span).
        mw = cfg.max_wave_lanes
        if cfg.scheduler in ("pool", "quota"):
            mw = cfg.pool_span
        if mw and n > mw:
            # Pad the pixel space so every chunk has the same static
            # width (duplicate last-pixel lanes in the tail chunk write
            # past n and are sliced off -- exact for the real pixels).
            # Applies to explicit pixel_idx too (e.g. a shard's rows
            # under shard_map), so sharded renders keep the measured
            # ~65k-lane wave optimum instead of one full-width wave.
            chunks = _cdiv(n, mw)
            # pool/quota chunks stay exactly pool_span wide (only the
            # tail chunk pads): the quota one-hot flush requires
            # n_items to divide by the wave width, and pool_span is a
            # multiple of max_wave_lanes.  Owner chunks balance.
            if cfg.scheduler in ("pool", "quota"):
                chunk = mw
            else:
                chunk = _cdiv(n, chunks)
            padded = chunks * chunk
            pad_pos = jnp.minimum(jnp.arange(padded, dtype=jnp.int32),
                                  n - 1)
            all_pix = (pad_pos if pixel_idx is None
                       else pixel_idx[pad_pos])

            def body(c, carry):
                acc, tr_all, sh_all = carry
                pix = jax.lax.dynamic_slice(all_pix, (c * chunk,), (chunk,))
                # With an affine pixel space (implicit arange, or an
                # explicit block with pixel_affine_base) the chunk's
                # pool is affine-with-clamp -- hand the engine the
                # elementwise map so quota's in-step refill needs no
                # gather (render_frame_persistent pixel_pool_fn).
                pool_fn = ((lambda j: affine_base + jnp.minimum(
                    jnp.int32(c * chunk) + j, jnp.int32(n - 1)))
                    if affine_base is not None else None)
                rad, (tr, sh) = render_frame_persistent(
                    scene, textures, cam, frame_seed, width, height, cfg,
                    spp, pixel_idx=pix, with_stats=True,
                    sample_offset=sample_offset, seed_spp=seed_spp,
                    pixel_pool_fn=pool_fn)
                acc = jax.lax.dynamic_update_slice(acc, rad, (c * chunk, 0))
                return acc, tr_all + tr, sh_all + sh

            zero = jnp.float32(0)
            acc, tr, sh = jax.lax.fori_loop(
                0, chunks, body,
                (jnp.zeros((padded, 3), jnp.float32), zero, zero))
            acc = acc[:n]
            return (acc, (tr, sh)) if with_stats else acc

        return render_frame_persistent(scene, textures, cam, frame_seed,
                                       width, height, cfg, spp,
                                       pixel_idx=pixel_idx,
                                       with_stats=with_stats,
                                       sample_offset=sample_offset,
                                       seed_spp=seed_spp,
                                       pixel_pool_fn=(
                                           (lambda j: affine_base + j)
                                           if affine_base is not None
                                           else None))
    if cfg.engine != "bounce":
        raise ValueError(f"unknown engine {cfg.engine!r}")

    def body(s, carry):
        acc, tr_all, sh_all = carry
        seed = rng.sample_seed(frame_seed, seed_spp,
                               jnp.uint32(sample_offset) + jnp.uint32(s),
                               jnp)
        rad, (tr, sh) = render_sample(scene, textures, cam, seed,
                                      width, height, cfg, pixel_idx,
                                      with_stats=True)
        return acc + rad, tr_all + tr, sh_all + sh

    zero = jnp.float32(0)
    carry0 = (jnp.zeros((n, 3), jnp.float32), zero, zero)
    if spp == 1:
        acc, tr, sh = body(0, carry0)
    else:
        acc, tr, sh = jax.lax.fori_loop(0, spp, body, carry0)
    if with_stats:
        return acc, (tr, sh)
    return acc


def frame_ray_stats(scene, textures, cam, frame_seed, width: int,
                    height: int, cfg: RenderConfig, spp: int):
    """Total (path rays, shadow rays) traced for one frame -- the ray
    count that, divided by frame time, gives Mrays/s (BASELINE.md)."""
    _, stats = render_frame(scene, textures, cam, frame_seed, width,
                            height, cfg, spp=spp, with_stats=True)
    return stats
