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
