"""Primitive intersection math (device-side, branch-free).

TPU-native counterparts of the reference's Taichi intersectors
(``kernels.py:208-362``: hit_sphere / hit_triangle / hit_quad) and the slab
AABB test (``kernels.py:600-621``).  Everything here is scalar-per-ray pure
math built from ``jnp`` select ops — it is used both unvmapped (oracle tests)
and under ``vmap`` over ray batches, and is differentiable w.r.t. geometry.

Every ``hit_*`` returns ``(hit, t, point, outward_normal, u, v)``; the caller
derives ``front_face``/shading normal (hittable.py:21-31 ``set_face_normal``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils import vec

INF = 1e30


def hit_sphere(c0, c1, radius, ro, rd, time, t_min, t_max):
    """Quadratic sphere intersection with motion-lerped center.

    Matches sphere.py:35-64 (``center.at(r.time)`` lerp + nearest-root
    selection) and the spherical UV of sphere.py:66-74.
    """
    center = vec.lerp(c0, c1, time)
    oc = center - ro
    a = vec.vdot(rd, rd)
    h = vec.vdot(rd, oc)
    c = vec.vdot(oc, oc) - radius * radius
    disc = h * h - a * c
    # Clamped sqrt keeps gradients finite for tangent/miss lanes whose
    # results are masked out downstream.
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    # Nearest root in range, else the far root.
    root0 = (h - sq) / a
    root1 = (h + sq) / a
    in0 = (root0 > t_min) & (root0 < t_max)
    in1 = (root1 > t_min) & (root1 < t_max)
    t = jnp.where(in0, root0, root1)
    hit = (disc > 0.0) & (in0 | in1)
    p = ro + t[..., None] * rd
    # Guard: padded/garbage lanes carry radius 0; an inf/nan primal here
    # would poison backward-pass residuals even though the lane is masked.
    safe_r = jnp.where(jnp.abs(radius) > 1e-12, radius, 1.0)
    n_out = (p - center) / safe_r
    # UV (sphere.py:66-74): theta from -y, phi from atan2(-z, x) + pi.
    theta = jnp.arccos(jnp.clip(-n_out[..., 1], -1.0 + 1e-7, 1.0 - 1e-7))
    phi = jnp.arctan2(-n_out[..., 2], n_out[..., 0]) + jnp.pi
    u = phi / (2.0 * jnp.pi)
    v = theta / jnp.pi
    return hit, t, p, n_out, u, v


def hit_quad(q, edge_u, edge_v, normal, w, d, ro, rd, t_min, t_max):
    """Parallelogram: plane hit + planar-coordinate interior test.

    Matches quad.py:34-68: ``alpha = w · (hit × v)``, ``beta = w · (u × hit)``
    with cached ``w = n_raw / (n_raw · n_raw)``; UV = (alpha, beta).
    """
    denom = vec.vdot(normal, rd)
    parallel = jnp.abs(denom) < 1e-8
    t = (d - vec.vdot(normal, ro)) / jnp.where(parallel, 1.0, denom)
    p = ro + t[..., None] * rd
    planar = p - q
    alpha = vec.vdot(w, vec.cross(planar, edge_v))
    beta = vec.vdot(w, vec.cross(edge_u, planar))
    interior = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    hit = (~parallel) & (t > t_min) & (t < t_max) & interior
    return hit, t, p, normal, alpha, beta


def hit_triangle(v0, e1, e2, normal, ro, rd, t_min, t_max):
    """Möller–Trumbore (triangle.py:54-100); UV = barycentric (u, v)."""
    pvec = vec.cross(rd, e2)
    det = vec.vdot(e1, pvec)
    parallel = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    tvec = ro - v0
    u = vec.vdot(tvec, pvec) * inv_det
    qvec = vec.cross(tvec, e1)
    v = vec.vdot(rd, qvec) * inv_det
    t = vec.vdot(e2, qvec) * inv_det
    inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    hit = (~parallel) & inside & (t > t_min) & (t < t_max)
    p = ro + t[..., None] * rd
    return hit, t, p, normal, u, v


def hit_prim_row(row, ro, rd, time, t_min, t_max):
    """Hit test against one packed 12-float prim row → (hit, t).

    The traversal hot path (PackedBVH.prims layout): all three primitive
    types are evaluated from the same gathered row and selected by type —
    the lean counterpart of :func:`hit_sphere`/`hit_quad`/`hit_triangle`
    that skips point/normal/UV work (shading recomputes those once per
    bounce via refine_hit).  Quad plane data is recomputed in-flight from
    Q/u/v (~20 flops) instead of gathering 9 more floats.
    """
    ptype = row[0]
    a = row[2:5]
    b = row[5:8]
    c = row[8:11]

    # --- sphere: a=c0, b=c1, row[8]=radius ---
    center = a + (b - a) * time
    radius = row[8]
    oc = center - ro
    ra = jnp.sum(rd * rd)
    h = jnp.sum(rd * oc)
    cc = jnp.sum(oc * oc) - radius * radius
    disc = h * h - ra * cc
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    r0 = (h - sq) / ra
    r1 = (h + sq) / ra
    in0 = (r0 > t_min) & (r0 < t_max)
    in1 = (r1 > t_min) & (r1 < t_max)
    t_s = jnp.where(in0, r0, r1)
    hit_s = (disc > 0.0) & (in0 | in1)

    # --- quad: a=Q, b=u, c=v; plane from cross(u, v) ---
    n_raw = jnp.cross(b, c)
    nn2 = jnp.sum(n_raw * n_raw)
    denom = jnp.sum(n_raw * rd)
    # Scale-invariant parallel test matching quad.py:41 (|unit_n . d| < 1e-8).
    parallel = denom * denom < 1e-16 * nn2 * jnp.sum(rd * rd)
    t_q = (jnp.sum(n_raw * a) - jnp.sum(n_raw * ro)) / jnp.where(parallel, 1.0, denom)
    planar = ro + t_q * rd - a
    w = n_raw / jnp.maximum(nn2, 1e-30)
    alpha = jnp.sum(w * jnp.cross(planar, c))
    beta = jnp.sum(w * jnp.cross(b, planar))
    interior = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    hit_q = (~parallel) & (t_q > t_min) & (t_q < t_max) & interior

    # --- triangle: a=v0, b=e1, c=e2 (Möller–Trumbore) ---
    pvec = jnp.cross(rd, c)
    det = jnp.sum(b * pvec)
    par_t = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(par_t, 1.0, det)
    tvec = ro - a
    uu = jnp.sum(tvec * pvec) * inv_det
    qvec = jnp.cross(tvec, b)
    vv = jnp.sum(rd * qvec) * inv_det
    t_t = jnp.sum(c * qvec) * inv_det
    hit_t = (~par_t) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & \
        (t_t > t_min) & (t_t < t_max)

    is_s = ptype < 0.5
    is_q = (ptype >= 0.5) & (ptype < 1.5)
    hit = jnp.where(is_s, hit_s, jnp.where(is_q, hit_q, hit_t))
    t = jnp.where(is_s, t_s, jnp.where(is_q, t_q, t_t))
    return hit, t


def hit_aabb(bb_min, bb_max, ro, inv_rd, t_min, t_max):
    """Vectorised slab test (kernels.py:600-621); returns (hit, t_near).

    ``inv_rd`` is the precomputed reciprocal direction.  Handles the
    axis-parallel-ray case through IEEE inf semantics.
    """
    t0 = (bb_min - ro) * inv_rd
    t1 = (bb_max - ro) * inv_rd
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tsm, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tbg, axis=-1), t_max)
    return t_near <= t_far, t_near
