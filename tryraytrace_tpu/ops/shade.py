"""PBR shading math: Fresnel, branch weights, direction sampling.

Parity targets in the reference megakernel:
  - fresnel_schlick                renderer.cu:201-204
  - sample_rough_reflection        renderer.cu:207-227
  - energy-weight branch selection renderer.cu:502-556
  - specular branch                renderer.cu:571-589
  - refraction + TIR               renderer.cu:592-648
  - cosine-hemisphere diffuse      renderer.cu:713-733

Everything is branch-free masked math over the whole ray wave; the
three exclusive BSDF branches are all evaluated and selected by mask
(the measured-cheap default for TPU; per-branch compaction is a later
optimization, SURVEY.md hard-part #3).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import vec

PI = np.float32(np.pi)


def fresnel_schlick(cosine, f0, xp=jnp):
    """F = F0 + (1-F0) * (1-cos)^5  [renderer.cu:201-204]."""
    return f0 + (1.0 - f0) * xp.power(1.0 - cosine, 5.0)[..., None]


def pbr_weights(albedo, metallic, roughness, transmission, nl, r_d, xp=jnp):
    """Energy-based branch probabilities (renderer.cu:509-556).

    Returns (p_spec, p_trans, F) with the reference's exact heuristics:
    metallic^2 diffuse suppression, (1-r^2) specular attenuation,
    albedo-luminance scaling of the diffuse weight, and the
    sum<1e-5 -> force-diffuse fallback.
    """
    diffuse_suppression = xp.power(1.0 - metallic, 2.0)
    spec_attenuation = xp.maximum(1.0 - roughness * roughness, 0.0)

    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    cos_theta = xp.maximum(vec.dot(nl, -r_d, xp), 0.0)
    f = fresnel_schlick(cos_theta, f0, xp)
    f_avg = f.mean(axis=-1)

    albedo_lum = albedo.max(axis=-1)
    w_spec = f_avg * spec_attenuation
    w_trans = (1.0 - f_avg) * transmission
    w_diff = (1.0 - f_avg) * (1.0 - transmission) * diffuse_suppression * albedo_lum

    total = w_spec + w_trans + w_diff
    # Degenerate fallback (renderer.cu:550-553): w_diff = 1, sum = 1 --
    # note w_spec/w_trans keep their tiny values, so p_spec/p_trans
    # become the tiny raw weights rather than exactly zero.
    degenerate = total < 1e-5
    total = xp.where(degenerate, 1.0, total)

    p_spec = w_spec / total
    p_trans = w_trans / total
    return p_spec, p_trans, f


def sample_unit_sphere(u1, u2, xp=jnp):
    """Uniform unit sphere direction from two uniforms (the random
    sphere vector of sample_rough_reflection, renderer.cu:222-224)."""
    r1 = u1 * (2.0 * PI)
    z = 1.0 - 2.0 * u2
    r = xp.sqrt(xp.maximum(1.0 - z * z, 0.0))
    return xp.stack([r * xp.cos(r1), r * xp.sin(r1), z], axis=-1)


def rough_perturb(direction, roughness, u1, u2, xp=jnp):
    """(direction + sphere * roughness).norm()  [renderer.cu:226]."""
    sphere = sample_unit_sphere(u1, u2, xp)
    return vec.norm(direction + sphere * roughness[..., None], xp)


def reflect(d, n, xp=jnp):
    """Mirror reflection r = d - 2 n (n.d)  [renderer.cu:573]."""
    return d - n * (2.0 * vec.dot(n, d, xp))[..., None]


def refract_branch(r_d, n, nl, ior, roughness, u1, u2, xp=jnp):
    """Transmission branch geometry (renderer.cu:592-636).

    Returns (new_dir [N,3], tir [N]).  TIR lanes reflect-and-perturb;
    refracting lanes apply Snell's law then, when roughness > 0, the
    same sphere perturbation.  Both sub-paths consume the same two
    uniforms, matching the reference's sequential draw count.
    """
    into = vec.dot(n, nl, xp) > 0.0
    nnt = xp.where(into, 1.0 / ior, ior)  # nc=1 / nt=ior
    ddn = vec.dot(r_d, nl, xp)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0

    # TIR: mirror + rough perturb (renderer.cu:603-608).
    refl = reflect(r_d, n, xp)
    dir_tir = rough_perturb(refl, roughness, u1, u2, xp)

    # Refraction: Snell (renderer.cu:613).
    sign = xp.where(into, 1.0, -1.0)
    coeff = sign * (ddn * nnt + xp.sqrt(xp.maximum(cos2t, 0.0)))
    tdir = vec.norm(r_d * nnt[..., None] - n * coeff[..., None], xp)
    # Rough transmission perturbs only when roughness > 0
    # (renderer.cu:617-630); the perturbed result equals tdir when
    # roughness == 0, but the reference's guard is preserved because
    # the unperturbed path skips a normalize.
    tdir_rough = rough_perturb(tdir, roughness, u1, u2, xp)
    tdir = xp.where((roughness > 0.0)[..., None], tdir_rough, tdir)

    return xp.where(tir[..., None], dir_tir, tdir), tir


def cosine_hemisphere(nl, u1, u2, xp=jnp):
    """Cosine-weighted hemisphere around nl (renderer.cu:716-723),
    including the reference's exact |w.x| > 0.1 tangent pick."""
    r1 = 2.0 * PI * u1
    r2 = u2
    r2s = xp.sqrt(r2)
    w = nl
    pick = (xp.abs(w[..., 0]) > 0.1)[..., None]
    temp = xp.where(
        pick,
        xp.asarray([0.0, 1.0, 0.0], dtype=xp.float32),
        xp.asarray([1.0, 0.0, 0.0], dtype=xp.float32),
    )
    u_axis = vec.norm(vec.cross(temp, w, xp), xp)
    v_axis = vec.cross(w, u_axis, xp)
    d = (
        u_axis * (xp.cos(r1) * r2s)[..., None]
        + v_axis * (xp.sin(r1) * r2s)[..., None]
        + w * xp.sqrt(xp.maximum(1.0 - r2, 0.0))[..., None]
    )
    return vec.norm(d, xp)


def triangle_area(v0, v1, v2, xp=jnp):
    """0.5 * |e1 x e2|  [renderer.cu:188-192]."""
    return vec.length(vec.cross(v1 - v0, v2 - v0, xp), xp) * 0.5


def sample_triangle(v0, v1, v2, u1, u2, xp=jnp):
    """Uniform point on a triangle (renderer.cu:663-669):
    sqr1 = sqrt(u1); a = 1-sqr1; b = sqr1*(1-u2); p = a v0 + b v1 + (1-a-b) v2."""
    sqr1 = xp.sqrt(u1)
    a = 1.0 - sqr1
    b = sqr1 * (1.0 - u2)
    c = 1.0 - a - b
    return v0 * a[..., None] + v1 * b[..., None] + v2 * c[..., None]


def barycentric(v0, v1, v2, x_hit, xp=jnp):
    """Barycentric coordinates (b1, b2, ok) of ``x_hit`` in the
    triangle; the hit point is b0*v0 + b1*v1 + b2*v2 with
    b0 = 1-b1-b2.  ``ok`` is False for ill-conditioned (near-sliver)
    triangles: den = d11*d22*sin^2(angle between edges), so 1-ULP
    drift in x_hit amplifies into visibly different interpolants
    between independently-compiled programs -- callers must fall back
    to a barycentric-free quantity there (geometric normal, planar
    UV)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = x_hit - v0
    d11 = vec.dot(e1, e1, xp)
    d12 = vec.dot(e1, e2, xp)
    d22 = vec.dot(e2, e2, xp)
    dp1 = vec.dot(p, e1, xp)
    dp2 = vec.dot(p, e2, xp)
    den = d11 * d22 - d12 * d12
    ok_den = den > 1e-6 * d11 * d22
    inv = 1.0 / xp.where(ok_den, den, 1.0)
    b1 = (d22 * dp1 - d12 * dp2) * inv
    b2 = (d11 * dp2 - d12 * dp1) * inv
    return b1, b2, ok_den


def smooth_normal(v0, v1, v2, n0, n1, n2, x_hit, nrm_geo, xp=jnp):
    """Barycentric-interpolated vertex normal at ``x_hit`` (smooth
    shading -- beyond-reference feature, see RenderConfig).

    The interpolated normal is oriented into the geometric normal's
    hemisphere; triangles without vertex normals (all-zero rows) or
    with a degenerate barycentric basis fall back to ``nrm_geo``
    exactly, so scenes without normals are bit-identical with the
    flag on.
    """
    b1, b2, ok_den = barycentric(v0, v1, v2, x_hit, xp)
    b0 = 1.0 - b1 - b2
    ns = n0 * b0[..., None] + n1 * b1[..., None] + n2 * b2[..., None]
    ns = xp.where(vec.dot(ns, nrm_geo, xp)[..., None] < 0.0, -ns, ns)
    len2 = vec.dot(ns, ns, xp)
    ok = ok_den & (len2 > 1e-12)
    ns = ns / xp.sqrt(xp.where(ok, len2, 1.0))[..., None]
    return xp.where(ok[..., None], ns, nrm_geo)
