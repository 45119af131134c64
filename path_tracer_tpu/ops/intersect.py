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
    """Hit test against one packed 16-float prim row → (hit, t).

    The traversal hot path (PackedBVH.prims layout): all present primitive
    types are evaluated from the same gathered row and selected by type —
    the lean counterpart of :func:`hit_sphere`/`hit_quad`/`hit_triangle`
    that skips point/normal/UV work (shading recomputes those once per
    bounce via refine_hit).  Quad plane/planar-basis data is PRECOMPUTED at
    pack time (row = [n̂, A, B, d, A·Q, B·Q]) so the in-flight test is three
    dot products and two fmas — the interior coordinates are affine in t:
    ``alpha(t) = (A·ro − A·Q) + t (A·rd)`` (and likewise beta), because
    ``alpha = w·((p−Q)×v) = (v×w)·(p−Q)`` with ``p = ro + t rd``.
    """
    ptype = row[0]
    a = row[2:5]
    b = row[5:8]
    c = row[8:11]

    # --- sphere: a=c0, b=(c1-c0), row[8]=radius² ---
    center = a + b * time
    r2 = row[8]
    oc = center - ro
    ra = jnp.sum(rd * rd)
    h = jnp.sum(rd * oc)
    cc = jnp.sum(oc * oc) - r2
    disc = h * h - ra * cc
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    r0 = (h - sq) / ra
    r1 = (h + sq) / ra
    in0 = (r0 > t_min) & (r0 < t_max)
    in1 = (r1 > t_min) & (r1 < t_max)
    t_s = jnp.where(in0, r0, r1)
    hit_s = (disc > 0.0) & (in0 | in1)

    # --- quad: a=n̂, b=A=v×w, c=B=w×u, row[11]=d, row[12]=A·Q, row[13]=B·Q ---
    denom = jnp.sum(a * rd)
    # Scale-invariant parallel test matching quad.py:41 (|unit_n . d| < 1e-8).
    parallel = denom * denom < 1e-16 * ra
    t_q = (row[11] - jnp.sum(a * ro)) / jnp.where(parallel, 1.0, denom)
    alpha = (jnp.sum(b * ro) - row[12]) + t_q * jnp.sum(b * rd)
    beta = (jnp.sum(c * ro) - row[13]) + t_q * jnp.sum(c * rd)
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


# ---------------------------------------------------------------------------
# Scalar-component ("SoA") variants for the traversal hot path.
#
# TPU layout reality: under vmap, math on (..., 3) vectors becomes ops on
# (N, 3) arrays whose minor dimension maps to the VPU's 128 hardware lanes —
# 3/128 = 2.3% lane utilisation.  The functions below take/return plain
# scalars per component, so vmap produces (N,) ops at full vector width
# (measured: the traversal step dropped from ~300 ns to ~10 ns per lane).
# ---------------------------------------------------------------------------


def hit_aabb_s(bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
               rox, roy, roz, ivx, ivy, ivz, t_min, t_max):
    """Slab test on scalar components → (hit, t_near)."""
    tx0 = (bmnx - rox) * ivx
    tx1 = (bmxx - rox) * ivx
    ty0 = (bmny - roy) * ivy
    ty1 = (bmxy - roy) * ivy
    tz0 = (bmnz - roz) * ivz
    tz1 = (bmxz - roz) * ivz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.maximum(jnp.minimum(tz0, tz1), t_min))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.minimum(jnp.maximum(tz0, tz1), t_max))
    return tn <= tf, tn


def hit_prim_row_s(r, rox, roy, roz, rdx, rdy, rdz, rr, time, t_min, t_max,
                   mask=(True, True, True)):
    """Scalar-component packed-row hit test → (hit, t).

    ``r`` is a list/tuple of the row's 16 scalars (layout in
    types.PackedBVH); ``rr = rd·rd`` is hoisted by the caller (shared across
    the node's four children).  ``mask`` is the STATIC (spheres, quads,
    triangles) scene-presence tuple: absent families compile out entirely
    (masked SIMD pays for every computed family on every lane).

    Quad planes are precomputed at pack time (see :func:`hit_prim_row`):
    the test is ``t = (d − n̂·ro)/(n̂·rd)`` plus two affine planar
    coordinates ``alpha = (A·ro − A·Q) + t (A·rd)`` — three dot products
    and two fmas instead of two cross products + plane reconstruction.
    """
    ptype = r[0]
    a0, a1, a2 = r[2], r[3], r[4]
    b0, b1, b2 = r[5], r[6], r[7]
    c0, c1, c2 = r[8], r[9], r[10]

    results = []

    if mask[0]:
        # --- sphere: a=c0, b=(c1-c0), r[8]=radius² ---
        cx = a0 + b0 * time
        cy = a1 + b1 * time
        cz = a2 + b2 * time
        ocx = cx - rox
        ocy = cy - roy
        ocz = cz - roz
        h = rdx * ocx + rdy * ocy + rdz * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - c0
        disc = h * h - rr * cc
        sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
        root0 = (h - sq) / rr
        root1 = (h + sq) / rr
        in0 = (root0 > t_min) & (root0 < t_max)
        in1 = (root1 > t_min) & (root1 < t_max)
        t_s = jnp.where(in0, root0, root1)
        hit_s = (disc > 0.0) & (in0 | in1)
        results.append((ptype < 0.5, hit_s, t_s))

    if mask[1]:
        # --- quad: a=n̂, b=A, c=B, r[11]=d, r[12]=A·Q, r[13]=B·Q ---
        denom = a0 * rdx + a1 * rdy + a2 * rdz
        parallel = denom * denom < 1e-16 * rr
        t_q = ((r[11] - (a0 * rox + a1 * roy + a2 * roz))
               / jnp.where(parallel, 1.0, denom))
        alpha = ((b0 * rox + b1 * roy + b2 * roz) - r[12]) + \
            t_q * (b0 * rdx + b1 * rdy + b2 * rdz)
        beta = ((c0 * rox + c1 * roy + c2 * roz) - r[13]) + \
            t_q * (c0 * rdx + c1 * rdy + c2 * rdz)
        interior = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & \
            (beta <= 1.0)
        hit_q = (~parallel) & (t_q > t_min) & (t_q < t_max) & interior
        results.append(((ptype >= 0.5) & (ptype < 1.5), hit_q, t_q))

    if mask[2]:
        # --- triangle: a=v0, b=e1, c=e2 (Möller–Trumbore) ---
        pvx = rdy * c2 - rdz * c1
        pvy = rdz * c0 - rdx * c2
        pvz = rdx * c1 - rdy * c0
        det = b0 * pvx + b1 * pvy + b2 * pvz
        par_t = jnp.abs(det) < 1e-9
        inv_det = 1.0 / jnp.where(par_t, 1.0, det)
        tvx = rox - a0
        tvy = roy - a1
        tvz = roz - a2
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * b2 - tvz * b1
        qvy = tvz * b0 - tvx * b2
        qvz = tvx * b1 - tvy * b0
        vv = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
        t_t = (c0 * qvx + c1 * qvy + c2 * qvz) * inv_det
        hit_t = (~par_t) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & \
            (t_t > t_min) & (t_t < t_max)
        results.append((ptype >= 1.5, hit_t, t_t))

    if not results:  # no primitive family present (defensive: empty scene)
        shape = jnp.broadcast_shapes(jnp.shape(ptype), jnp.shape(rox))
        return jnp.zeros(shape, bool), jnp.broadcast_to(t_max, shape)
    sel, hit, t = results[-1]
    for sel_i, hit_i, t_i in reversed(results[:-1]):
        hit = jnp.where(sel_i, hit_i, hit)
        t = jnp.where(sel_i, t_i, t)
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
