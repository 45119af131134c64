"""Fully tile-batched wavefront shading (zero per-lane vmap).

Round-1 measurement (docs/PERFORMANCE.md): after the traversal went
tile-aligned, the wavefront control step still cost ~350 ns/lane, almost all
of it the per-lane ``vmap(bounce_shade)`` — every gathered table component
paid a cross-lane relayout and every (3,)-vector op used 3 of 128 VPU lanes.
This module is the same shading math as :mod:`.shade` / :mod:`.integrator`
(the reference's ``scatter``/``emitted``/texture kernels,
kernels.py:766-1017), rewritten batch-major:

* **Packed gather tables.**  Gathers *from 1-D tables* lower to cross-lane
  relayouts; row gathers from 2-D tables are fast.  So the per-type geometry
  + material-id + medium-id tables are concatenated once into a single
  ``(P, 18)`` row table (:func:`make_tables`) — ONE row gather serves the
  whole differentiable hit refinement — and the 8 material scalars into an
  ``(M, 8)`` row table for the scatter dispatch.
* **Component-major math.**  Every (3,) vector lives as three full-width
  ``(R/128, 128)``-tiled component arrays; every op is a whole-tile VPU op.
* **Batched RNG only.**  The threefry bit generation is inherently
  full-width; uniforms are drawn per-lane under a tiny vmap (int ops batch
  perfectly) and transposed once into component tiles.

Every function mirrors its per-lane counterpart op-for-op (same association
order, same guards) so the wavefront engine keeps integrating the *same*
sample set as the megakernel: the mega-vs-wave equivalence oracle
(docs/WAVEFRONT_USAGE.md:146-150) still holds to float accumulation order,
and ``tests/test_shade_tiled.py`` asserts batched == vmapped lane-for-lane.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.rng import TWO_PI
from . import shade as shade_mod
from .types import (MAT_DIELECTRIC, MAT_EMISSIVE, MAT_ISOTROPIC,
                    MAT_LAMBERTIAN, MAT_METAL, MAT_SSS_SIMPLE,
                    MAT_SSS_VOLUMETRIC, SceneArrays)

F32 = jnp.float32


def grid_shape(R: int):
    """The (R/128, 128) lane grid (free bitcast of the (R,) view)."""
    return (R // 128, 128) if (R % 128 == 0 and R >= 128) else (R,)


class ShadeTables(NamedTuple):
    """Row-gather tables derived from :class:`SceneArrays` (loop-invariant:
    XLA hoists the concats out of the render while-loop)."""

    prim: jax.Array   # (Ns+Nq+Nt, 18): [mat, medium, a(3), b(3), c(3), n(3), w(3), d]
    mat: jax.Array    # (M, 8): [type, tex, fuzz, ir, g, sigma_s, sigma_a, scatter_dist]
    med: jax.Array    # (Mv, 2): [density, tex]
    n_sph: int        # static row offsets (= padded table sizes)
    n_qd: int


def make_tables(scene: SceneArrays) -> ShadeTables:
    ns = scene.sph_rad.shape[0]
    nq = scene.qd_d.shape[0]
    nt = scene.tr_mat.shape[0]
    z = lambda n, k: jnp.zeros((n, k), F32)  # noqa: E731
    col = lambda x: x.astype(F32)[:, None]  # noqa: E731

    sph = jnp.concatenate(
        [col(scene.sph_mat), col(scene.sph_medium),
         scene.sph_c0, scene.sph_c1, col(scene.sph_rad), z(ns, 2),
         z(ns, 7)], axis=1)
    qd = jnp.concatenate(
        [col(scene.qd_mat), col(scene.qd_medium),
         scene.qd_q, scene.qd_u, scene.qd_v,
         scene.qd_n, scene.qd_w, col(scene.qd_d)], axis=1)
    tr = jnp.concatenate(
        [col(scene.tr_mat), col(scene.tr_medium),
         scene.tr_v0, scene.tr_e1, scene.tr_e2, scene.tr_n, z(nt, 4)],
        axis=1)
    prim = jnp.concatenate([sph, qd, tr], axis=0)

    mat = jnp.stack(
        [col(scene.mat_type)[:, 0], col(scene.mat_tex)[:, 0],
         scene.mat_fuzz, scene.mat_ir, scene.mat_g, scene.mat_sigma_s,
         scene.mat_sigma_a, scene.mat_scatter_dist], axis=1)
    med = jnp.stack([scene.med_density, scene.med_tex.astype(F32)], axis=1)
    return ShadeTables(prim=prim, mat=mat, med=med, n_sph=ns, n_qd=nq)


def _prim_rows(tabs: ShadeTables, ptype, pidx):
    """Gather the 18-float shade rows for (ptype, pidx) lanes → (18,)+shape."""
    off = jnp.where(ptype == 0, 0,
                    jnp.where(ptype == 1, tabs.n_sph, tabs.n_sph + tabs.n_qd))
    uid = jnp.clip(pidx + off, 0, tabs.prim.shape[0] - 1)
    uid = jnp.where(ptype >= 0, uid, 0)
    return jnp.moveaxis(tabs.prim[uid], -1, 0)


small_rows = shade_mod.small_rows


class HitT(NamedTuple):
    """Component-major hit record (the tiled :class:`~.traverse.Hit`)."""

    hit: jax.Array
    t: jax.Array
    p: tuple            # (px, py, pz)
    n: tuple            # shading normal components (flipped toward the ray)
    front: jax.Array
    u: jax.Array
    v: jax.Array
    mat: jax.Array      # int32
    medium: jax.Array   # int32


def prim_medium_t(tabs: ShadeTables, ptype, pidx):
    """Tiled ``prim_medium_of`` (integrator.py): medium index or -1."""
    row = _prim_rows(tabs, ptype, pidx)
    med = row[1].astype(jnp.int32)
    return jnp.where(ptype >= 0, med, -1)


def front_face_t(tabs: ShadeTables, ptype, pidx, ox, oy, oz, dx, dy, dz,
                 time, t):
    """Tiled ``prim_front_face``: sign of rd · outward_normal at o + t·d."""
    row = _prim_rows(tabs, ptype, pidx)
    return _front_from_row(row, ptype, ox, oy, oz, dx, dy, dz, time, t)


def _front_from_row(row, ptype, ox, oy, oz, dx, dy, dz, time, t):
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    # Sphere: unnormalised p - lerp(c0, c1, time); quad/tri: stored unit n.
    cx = row[2] + (row[5] - row[2]) * time
    cy = row[3] + (row[6] - row[3]) * time
    cz = row[4] + (row[7] - row[4]) * time
    is_s = ptype == 0
    nx = jnp.where(is_s, px - cx, row[11])
    ny = jnp.where(is_s, py - cy, row[12])
    nz = jnp.where(is_s, pz - cz, row[13])
    return dx * nx + dy * ny + dz * nz < 0.0


def prim_medium_front_t(tabs: ShadeTables, ptype, pidx, ox, oy, oz,
                        dx, dy, dz, time, t):
    """``(prim_medium_t, front_face_t)`` from ONE shared prim-row gather —
    the wavefront control's medium transition needs both, and the two
    separate gathers were ~2 ms/sample on the flagship (r5 profile)."""
    row = _prim_rows(tabs, ptype, pidx)
    med = jnp.where(ptype >= 0, row[1].astype(jnp.int32), -1)
    return med, _front_from_row(row, ptype, ox, oy, oz, dx, dy, dz, time, t)


def refine_hit_t(tabs: ShadeTables, ptype, pidx, ox, oy, oz, dx, dy, dz,
                 time, t_min) -> HitT:
    """Tiled :func:`~.traverse.refine_hit`: full hit record from one row
    gather, all three families computed and selected by type (masked lanes,
    kernels.py:672-717)."""
    row = _prim_rows(tabs, ptype, pidx)
    a0, a1, a2 = row[2], row[3], row[4]
    b0, b1, b2 = row[5], row[6], row[7]
    c0, c1, c2 = row[8], row[9], row[10]
    sn0, sn1, sn2 = row[11], row[12], row[13]
    w0, w1, w2 = row[14], row[15], row[16]
    pd = row[17]
    INF = 1e30

    # --- sphere (intersect.hit_sphere) ---
    cx = a0 + (b0 - a0) * time
    cy = a1 + (b1 - a1) * time
    cz = a2 + (b2 - a2) * time
    ocx, ocy, ocz = cx - ox, cy - oy, cz - oz
    ra = dx * dx + dy * dy + dz * dz
    h = dx * ocx + dy * ocy + dz * ocz
    radius = c0
    cc = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
    disc = h * h - ra * cc
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    r0_ = (h - sq) / ra
    r1_ = (h + sq) / ra
    in0 = (r0_ > t_min) & (r0_ < INF)
    in1 = (r1_ > t_min) & (r1_ < INF)
    t_s = jnp.where(in0, r0_, r1_)
    hit_s = (disc > 0.0) & (in0 | in1)
    spx = ox + t_s * dx
    spy = oy + t_s * dy
    spz = oz + t_s * dz
    safe_r = jnp.where(jnp.abs(radius) > 1e-12, radius, 1.0)
    snx = (spx - cx) / safe_r
    sny = (spy - cy) / safe_r
    snz = (spz - cz) / safe_r
    theta = jnp.arccos(jnp.clip(-sny, -1.0 + 1e-7, 1.0 - 1e-7))
    phi_s = jnp.arctan2(-snz, snx) + jnp.pi
    u_s = phi_s / (2.0 * jnp.pi)
    v_s = theta / jnp.pi

    # --- quad (intersect.hit_quad; stored unit n, cached w, plane d) ---
    denom = sn0 * dx + sn1 * dy + sn2 * dz
    parallel = jnp.abs(denom) < 1e-8
    t_q = (pd - (sn0 * ox + sn1 * oy + sn2 * oz)) / jnp.where(parallel, 1.0, denom)
    qpx = ox + t_q * dx
    qpy = oy + t_q * dy
    qpz = oz + t_q * dz
    plx, ply, plz = qpx - a0, qpy - a1, qpz - a2
    # alpha = w · (planar × v_edge); beta = w · (u_edge × planar)
    cvx = ply * c2 - plz * c1
    cvy = plz * c0 - plx * c2
    cvz = plx * c1 - ply * c0
    alpha = w0 * cvx + w1 * cvy + w2 * cvz
    cux = b1 * plz - b2 * ply
    cuy = b2 * plx - b0 * plz
    cuz = b0 * ply - b1 * plx
    beta = w0 * cux + w1 * cuy + w2 * cuz
    interior = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    hit_q = (~parallel) & (t_q > t_min) & (t_q < INF) & interior

    # --- triangle (intersect.hit_triangle: Möller–Trumbore, stored n) ---
    pvx = dy * c2 - dz * c1
    pvy = dz * c0 - dx * c2
    pvz = dx * c1 - dy * c0
    det = b0 * pvx + b1 * pvy + b2 * pvz
    par_t = jnp.abs(det) < 1e-9
    inv_det = 1.0 / jnp.where(par_t, 1.0, det)
    tvx, tvy, tvz = ox - a0, oy - a1, oz - a2
    u_t = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * b2 - tvz * b1
    qvy = tvz * b0 - tvx * b2
    qvz = tvx * b1 - tvy * b0
    v_t = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t_t = (c0 * qvx + c1 * qvy + c2 * qvz) * inv_det
    inside = (u_t >= 0.0) & (v_t >= 0.0) & (u_t + v_t <= 1.0)
    hit_t = (~par_t) & inside & (t_t > t_min) & (t_t < INF)

    is_s = ptype == 0
    is_q = ptype == 1

    def sel(a, b, c):
        return jnp.where(is_s, a, jnp.where(is_q, b, c))

    hit = sel(hit_s, hit_q, hit_t) & (ptype >= 0)
    t = sel(t_s, t_q, t_t)
    px = sel(spx, qpx, ox + t_t * dx)
    py = sel(spy, qpy, oy + t_t * dy)
    pz = sel(spz, qpz, oz + t_t * dz)
    nox = sel(snx, sn0, sn0)
    noy = sel(sny, sn1, sn1)
    noz = sel(snz, sn2, sn2)
    uu = sel(u_s, alpha, u_t)
    vv = sel(v_s, beta, v_t)

    front = dx * nox + dy * noy + dz * noz < 0.0
    flip = jnp.where(front, 1.0, -1.0)
    return HitT(hit=hit, t=t, p=(px, py, pz),
                n=(flip * nox, flip * noy, flip * noz), front=front,
                u=uu, v=vv, mat=row[0].astype(jnp.int32),
                medium=jnp.where(ptype >= 0, row[1].astype(jnp.int32), -1))


# ---------------------------------------------------------------------------
# Component-major sampling helpers (mirror utils/rng.py op-for-op).
# ---------------------------------------------------------------------------


def _unit_vector_t(u0, u1):
    """rng.random_unit_vector on components."""
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u1
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _normalize_t(x, y, z):
    """vec.normalize on components (EPS = 1e-8)."""
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-16))
    return x * inv, y * inv, z * inv


def _onb_t(wx, wy, wz):
    """vec.onb_from_w on components → (u, v, w) component triples."""
    wx, wy, wz = _normalize_t(wx, wy, wz)
    use_y = (jnp.abs(wx) > 0.9).astype(wx.dtype)
    ax = 1.0 - use_y
    ay = use_y
    vx = wy * 0.0 - wz * ay          # cross(w, a) with a = (ax, ay, 0)
    vy = wz * ax - wx * 0.0
    vz = wx * ay - wy * ax
    vx, vy, vz = _normalize_t(vx, vy, vz)
    ux = wy * vz - wz * vy           # u = cross(w, v)
    uy = wz * vx - wx * vz
    uz = wx * vy - wy * vx
    return (ux, uy, uz), (vx, vy, vz), (wx, wy, wz)


def _cosine_direction_t(u0, u1, nx, ny, nz):
    """rng.random_cosine_direction on components."""
    r = jnp.sqrt(u0)
    phi = TWO_PI * u1
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))
    (ux, uy, uz), (vx, vy, vz), (wx, wy, wz) = _onb_t(nx, ny, nz)
    return (x * ux + y * vx + z * wx,
            x * uy + y * vy + z * wy,
            x * uz + y * vz + z * wz)


def _near_zero_t(x, y, z):
    return (jnp.abs(x) < 1e-8) & (jnp.abs(y) < 1e-8) & (jnp.abs(z) < 1e-8)


def _sample_hg_t(u, g):
    """rng.sample_henyey_greenstein on components."""
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u)
    cos_hg = (1.0 + safe_g * safe_g - sq * sq) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * u
    return jnp.clip(jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_hg), -1.0, 1.0)


def _direction_from_cos_t(u_phi, cos_theta, ax, ay, az):
    """rng.direction_from_cos on components."""
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 1e-12, 1.0))
    phi = TWO_PI * u_phi
    (ux, uy, uz), (vx, vy, vz), (wx, wy, wz) = _onb_t(ax, ay, az)
    sc = sin_theta * jnp.cos(phi)
    ss = sin_theta * jnp.sin(phi)
    return (sc * ux + ss * vx + cos_theta * wx,
            sc * uy + ss * vy + cos_theta * wy,
            sc * uz + ss * vz + cos_theta * wz)


def get_rays_t(cam, px, py, u5):
    """Tiled :func:`~.camera.get_ray`: (origin, direction, time) components.

    ``u5`` is the (5,)+shape uniform stack (jitter, defocus disk, time).
    """
    sx = px + u5[0] - 0.5
    sy = py + u5[1] - 0.5
    smx = cam.pixel00[0] + sx * cam.du[0] + sy * cam.dv[0]
    smy = cam.pixel00[1] + sx * cam.du[1] + sy * cam.dv[1]
    smz = cam.pixel00[2] + sx * cam.du[2] + sy * cam.dv[2]
    r = jnp.sqrt(u5[2])
    phi = TWO_PI * u5[3]
    kx = r * jnp.cos(phi)
    ky = r * jnp.sin(phi)
    no_dof = cam.defocus_angle <= 0.0
    ox = jnp.where(no_dof, cam.origin[0],
                   cam.origin[0] + kx * cam.defocus_u[0] + ky * cam.defocus_v[0])
    oy = jnp.where(no_dof, cam.origin[1],
                   cam.origin[1] + kx * cam.defocus_u[1] + ky * cam.defocus_v[1])
    oz = jnp.where(no_dof, cam.origin[2],
                   cam.origin[2] + kx * cam.defocus_u[2] + ky * cam.defocus_v[2])
    return (ox, oy, oz), (smx - ox, smy - oy, smz - oz), u5[4]


def background_t(cam, dx, dy, dz):
    """Tiled :func:`~.camera.background_color` → 3 color components."""
    n = jnp.sqrt(dx * dx + dy * dy + dz * dz).clip(1e-12)
    a = 0.5 * (dy / n + 1.0)
    is_grad = cam.bg_type == 1
    return (jnp.where(is_grad, (1.0 - a) + a * 0.5, cam.bg_color[0]),
            jnp.where(is_grad, (1.0 - a) + a * 0.7, cam.bg_color[1]),
            jnp.where(is_grad, (1.0 - a) + a * 1.0, cam.bg_color[2]))


# ---------------------------------------------------------------------------
# Scatter + emission (mirror shade.scatter / shade.emitted).
# ---------------------------------------------------------------------------


def _eval_tex_t(scene, flags, tex_idx, u, v, px, py, pz, allow_noise, valid,
                allow_image=True):
    """Grid-component wrapper over :func:`~.shade.eval_texture_batched`."""
    R = tex_idx.size
    out = shade_mod.eval_texture_batched(
        scene, flags, tex_idx.reshape(R), u.reshape(R), v.reshape(R),
        jnp.stack([px.reshape(R), py.reshape(R), pz.reshape(R)], axis=-1),
        allow_noise=allow_noise, allow_image=allow_image,
        valid=None if valid is None else valid.reshape(R))
    c = jnp.moveaxis(out, -1, 0)
    sh = tex_idx.shape
    return c[0].reshape(sh), c[1].reshape(sh), c[2].reshape(sh)


def scatter_t(scene, flags, sss_steps, tabs: ShadeTables, rec: HitT,
              dx, dy, dz, u8, sss_keys, albedo, live=None):
    """Tiled :func:`~.shade.scatter`: all material families on whole tiles.

    ``u8`` is the (8,)+shape uniform stack (same draws as the per-lane
    ``uniform(k_scatter, (8,))``); ``sss_keys`` the per-lane (R, 2) uint32
    walk-key data (only materialised when ``flags.has_sss`` — the walk
    uniforms themselves are drawn lazily, see the compaction below);
    ``albedo`` the precomputed texture components.  Returns (scattered,
    origin, direction, attenuation) with vector outputs as component
    triples.
    """
    mi = jnp.clip(rec.mat, 0, tabs.mat.shape[0] - 1)
    mrow = small_rows(tabs.mat, mi)
    mtype = mrow[0].astype(jnp.int32)
    nx, ny, nz = rec.n
    hpx, hpy, hpz = rec.p
    ax, ay, az = albedo

    uix, uiy, uiz = _normalize_t(dx, dy, dz)

    # --- Lambertian (material.py:32-45) ---
    lx, ly, lz = _cosine_direction_t(u8[0], u8[1], nx, ny, nz)
    lam_deg = _near_zero_t(lx, ly, lz)
    lx = jnp.where(lam_deg, nx, lx)
    ly = jnp.where(lam_deg, ny, ly)
    lz = jnp.where(lam_deg, nz, lz)

    # --- Metal (material.py:52-60) ---
    fuzz = mrow[2]
    vdn = uix * nx + uiy * ny + uiz * nz
    rx = uix - 2.0 * vdn * nx
    ry = uiy - 2.0 * vdn * ny
    rz = uiz - 2.0 * vdn * nz
    fx, fy, fz = _unit_vector_t(u8[2], u8[3])
    mx = rx + fuzz * fx
    my = ry + fuzz * fy
    mz = rz + fuzz * fz

    # --- Dielectric (material.py:66-93) ---
    ir = mrow[3]
    ratio = jnp.where(rec.front, 1.0 / ir, ir)
    cos_theta = jnp.minimum(-uix * nx + -uiy * ny + -uiz * nz, 1.0)
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 1e-12, 1.0))
    cannot_refract = ratio * sin_theta > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    choose_reflect = jax.lax.stop_gradient(
        cannot_refract | (reflectance > u8[4]))
    # vec.refract on components (recomputes the same cos_theta).
    ppx = ratio * (uix + cos_theta * nx)
    ppy = ratio * (uiy + cos_theta * ny)
    ppz = ratio * (uiz + cos_theta * nz)
    par = -jnp.sqrt(jnp.maximum(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz),
                                1e-12))
    gx = jnp.where(choose_reflect, rx, ppx + par * nx)
    gy = jnp.where(choose_reflect, ry, ppy + par * ny)
    gz = jnp.where(choose_reflect, rz, ppz + par * nz)

    # --- Isotropic (material.py:134-141) ---
    ix, iy, iz = _unit_vector_t(u8[5], u8[6])

    is_lam = mtype == MAT_LAMBERTIAN
    is_met = mtype == MAT_METAL
    is_die = mtype == MAT_DIELECTRIC
    is_emit = mtype == MAT_EMISSIVE

    def sel(a, b, c, d):
        return jnp.where(is_lam, a, jnp.where(is_met, b,
                                              jnp.where(is_die, c, d)))

    ddx = sel(lx, mx, gx, ix)
    ddy = sel(ly, my, gy, iy)
    ddz = sel(lz, mz, gz, iz)
    atx = jnp.where(is_die, 1.0, ax)
    aty = jnp.where(is_die, 1.0, ay)
    atz = jnp.where(is_die, 1.0, az)
    sox, soy, soz = hpx, hpy, hpz
    scattered = ~is_emit

    if flags.has_sss:
        is_ss = mtype == MAT_SSS_SIMPLE
        is_sv = mtype == MAT_SSS_VOLUMETRIC

        # SSS-simple (material.py:153-174): 50% displaced exit point.
        sd = mrow[7]
        displace = u8[7] >= 0.5
        amp = sd * u8[4]
        spx_ = jnp.where(displace, hpx + ix * amp, hpx)
        spy_ = jnp.where(displace, hpy + iy * amp, hpy)
        spz_ = jnp.where(displace, hpz + iz * amp, hpz)
        sdx = nx + fx
        sdy = ny + fy
        sdz = nz + fz
        sdeg = _near_zero_t(sdx, sdy, sdz)
        sdx = jnp.where(sdeg, nx, sdx)
        sdy = jnp.where(sdeg, ny, sdy)
        sdz = jnp.where(sdeg, nz, sdz)
        sox = jnp.where(is_ss, spx_, sox)
        soy = jnp.where(is_ss, spy_, soy)
        soz = jnp.where(is_ss, spz_, soz)
        ddx = jnp.where(is_ss, sdx, ddx)
        ddy = jnp.where(is_ss, sdy, ddy)
        ddz = jnp.where(is_ss, sdz, ddz)

        # SSS-volumetric HG random walk (material.py:198-249).
        #
        # The 64-trip walk is the most expensive shading family by an order
        # of magnitude, and live SSS lanes are typically sparse (one waxy
        # object among thousands of prims) — but masked SIMD pays full width
        # for a single live lane.  Same treatment as the marble texture
        # (eval_texture_batched): rank the SSS lanes with a prefix sum,
        # gather their walk inputs into a small fixed buffer, run the walk
        # (AND draw its (steps, 6) uniforms — the dominant cost) only
        # there, scatter the results back.  On overflow a lax.cond falls
        # back to the full-width walk; either path draws the per-lane
        # ``uniform(fold_in(k_scatter, 1), (steps, 6))`` stream, so both
        # match the per-lane oracle exactly.
        sigma_s = mrow[5]
        sigma_a = mrow[6]
        sigma_t = jnp.maximum(sigma_s + sigma_a, 1e-6)
        g_hg = mrow[4]

        def draw_usss(key_data2):
            """(N, 2) uint32 → (steps, 6, N) walk uniforms."""
            u = jax.vmap(lambda kd: jax.random.uniform(
                jax.random.wrap_key_data(kd), (sss_steps, 6)))(key_data2)
            return jnp.moveaxis(u, 0, -1)

        def run_walk(usss, hx, hy, hz, wnx, wny, wnz, wux, wuy, wuz,
                     wax, way, waz, wst, wsa, wg):
            """The walk on an arbitrary lane grid; usss is (steps, 6)+grid.

            Also returns per-lane *walking* step counts (trips where the
            lane was still status==0) — the honest work counter the ladder
            reports (VERDICT r4 #2: walk steps are real executed work but
            not "traced segments", so they get their own stats channel)."""
            def step(i, st):
                (posx, posy, posz, wdx, wdy, wdz, thx, thy, thz, status,
                 opx, opy, opz, odx, ody, odz, nst) = st
                uu = usss[i]
                t = -jnp.log(jnp.maximum(uu[0], 1e-10)) / wst
                p2x = posx + wdx * t
                p2y = posy + wdy * t
                p2z = posz + wdz * t
                ex_ = p2x - hx
                ey_ = p2y - hy
                ez_ = p2z - hz
                dist = jnp.sqrt(ex_ * ex_ + ey_ * ey_ + ez_ * ez_)
                exit_prob = 1.0 - jnp.exp(-dist * 0.5)
                walking = status == 0
                do_exit = walking & (uu[1] < exit_prob)
                evx, evy, evz = _unit_vector_t(uu[2], uu[3])
                edx = wnx + evx
                edy = wny + evy
                edz = wnz + evz
                edeg = _near_zero_t(edx, edy, edz)
                edx = jnp.where(edeg, wnx, edx)
                edy = jnp.where(edeg, wny, edy)
                edz = jnp.where(edeg, wnz, edz)
                do_absorb = walking & ~do_exit & (uu[4] < wsa / wst)
                cos_hg = _sample_hg_t(uu[5], wg)
                ndx, ndy, ndz = _direction_from_cos_t(uu[2], cos_hg,
                                                      wdx, wdy, wdz)
                status = jnp.where(do_exit, 1,
                                   jnp.where(do_absorb, 2, status))
                opx = jnp.where(do_exit, p2x, opx)
                opy = jnp.where(do_exit, p2y, opy)
                opz = jnp.where(do_exit, p2z, opz)
                odx = jnp.where(do_exit, edx, odx)
                ody = jnp.where(do_exit, edy, ody)
                odz = jnp.where(do_exit, edz, odz)
                keep = walking & ~do_exit & ~do_absorb
                wdx = jnp.where(keep, ndx, wdx)
                wdy = jnp.where(keep, ndy, wdy)
                wdz = jnp.where(keep, ndz, wdz)
                posx = jnp.where(keep, p2x, posx)
                posy = jnp.where(keep, p2y, posy)
                posz = jnp.where(keep, p2z, posz)
                thx = jnp.where(keep, thx * wax, thx)
                thy = jnp.where(keep, thy * way, thy)
                thz = jnp.where(keep, thz * waz, thz)
                nst = nst + jnp.where(walking, 1.0, 0.0)
                return (posx, posy, posz, wdx, wdy, wdz, thx, thy, thz,
                        status, opx, opy, opz, odx, ody, odz, nst)

            ones = jnp.ones_like(hx)
            init = (hx - wnx * 1e-3, hy - wny * 1e-3, hz - wnz * 1e-3,
                    wux, wuy, wuz, ones, ones, ones,
                    jnp.zeros(hx.shape, jnp.int32), hx, hy, hz,
                    wnx, wny, wnz, jnp.zeros_like(hx))
            out = jax.lax.fori_loop(0, sss_steps, step, init)
            return out[6:]  # (thx, thy, thz, status, op*, od*, nsteps)

        shape = hpx.shape
        R = 1
        for s in shape:
            R *= int(s)
        budget = 256
        while budget * 8 < R:  # keep the fallback rare on huge pools
            budget *= 2
        # Rung ladder (r5): the walk cost — (steps, 6, buffer) uniform
        # draws + the 64-trip masked loop — scales with the BUFFER size,
        # while live SSS lanes per control are typically a few dozen (the
        # config-4 ablation measured ~60 walking lanes/ctrl in a 4096-lane
        # fixed buffer, ~7 ms/sample of pure overdraw).  Tightest rung per
        # control; each extra rung costs a lax.cond branch.
        rungs = sorted({max(budget // 16, 256), max(budget // 4, 256),
                        budget})

        def dense_walk(_):
            usss = draw_usss(sss_keys).reshape((sss_steps, 6) + shape)
            return run_walk(usss, hpx, hpy, hpz, nx, ny, nz, uix, uiy, uiz,
                            ax, ay, az, sigma_t, sigma_a, g_hg)

        # Lanes the caller will keep (see bounce_shade_t ``live``): only
        # they count against the compaction budget.
        is_sv_live = is_sv if live is None else (is_sv & live)

        if R <= budget or len(shape) == 1:
            (thx, thy, thz, status,
             opx, opy, opz, odx, ody, odz, wk_nst) = dense_walk(None)
        else:
            sv_flat = is_sv_live.reshape(R)
            rank = jnp.cumsum(sv_flat.astype(jnp.int32)) - 1
            n_sv = jnp.sum(sv_flat.astype(jnp.int32))

            # ONE direct (w, 15) row scatter packs every walk input
            # (per-component 1-D packs were a cross-lane relayout each; a
            # pos-gather pack pays an extra row gather over this — the
            # same progression measured on the texture compaction).  The
            # walk KEYS still pack via `pos` (uint32 key data must not
            # round-trip through f32).
            walk_in = jnp.stack(
                [a.reshape(R) for a in
                 (hpx, hpy, hpz, nx, ny, nz, uix, uiy, uiz, ax, ay, az,
                  sigma_t, sigma_a, g_hg)], axis=-1)  # (R, 15)

            def sparse_walk_w(w):
                slot = jnp.where(sv_flat, rank, w)  # w = dropped
                bgrid = (w // 128, 128)
                # ONE position scatter; the walk inputs pack with the row
                # scatter below (scatters are ~an order costlier on TPU).
                pos = jnp.zeros((w,), jnp.int32).at[slot].set(
                    jnp.arange(R, dtype=jnp.int32), mode="drop")

                def go(_):
                    usss = draw_usss(sss_keys[pos]).reshape(
                        (sss_steps, 6) + bgrid)
                    pk = jnp.moveaxis(
                        jnp.zeros((w, 15), walk_in.dtype).at[slot].set(
                            walk_in, mode="drop"), -1, 0)  # (15, w)
                    outs = run_walk(usss, *(pk[j].reshape(bgrid)
                                            for j in range(15)))
                    # Unpack all 11 outputs with ONE (w, 11) row gather —
                    # eleven 1-D gathers each pay a cross-lane relayout.
                    rows = jnp.stack([o.reshape(w).astype(jnp.float32)
                                      for o in outs], axis=-1)
                    got = jnp.moveaxis(rows[jnp.clip(rank, 0, w - 1)],
                                       -1, 0)
                    res = [g.reshape(shape) for g in got]
                    res[3] = res[3].astype(jnp.int32)  # status
                    return tuple(res)

                return go

            def chain(i):
                if i == len(rungs):
                    return dense_walk
                w = rungs[i]
                return lambda _: jax.lax.cond(n_sv <= w, sparse_walk_w(w),
                                              chain(i + 1), None)

            (thx, thy, thz, status,
             opx, opy, opz, odx, ody, odz, wk_nst) = chain(0)(None)
        exited = status == 1
        # Walking-lane walk steps actually executed for lanes the caller
        # keeps — the stats channel (garbage/buffer lanes masked out).
        walk_steps = jnp.sum(jnp.where(is_sv_live, wk_nst, 0.0))

        sox = jnp.where(is_sv, opx, sox)
        soy = jnp.where(is_sv, opy, soy)
        soz = jnp.where(is_sv, opz, soz)
        ddx = jnp.where(is_sv, odx, ddx)
        ddy = jnp.where(is_sv, ody, ddy)
        ddz = jnp.where(is_sv, odz, ddz)
        atx = jnp.where(is_sv, thx * ax, atx)
        aty = jnp.where(is_sv, thy * ay, aty)
        atz = jnp.where(is_sv, thz * az, atz)
        scattered = jnp.where(is_sv, exited, scattered)
    else:
        walk_steps = jnp.zeros(())

    return (scattered, (sox, soy, soz), (ddx, ddy, ddz), (atx, aty, atz),
            mrow, walk_steps)


def emitted_t(scene, flags, mrow, u, v, px, py, pz):
    """Tiled :func:`~.shade.emitted` (the mat row is already gathered)."""
    is_em = mrow[0].astype(jnp.int32) == MAT_EMISSIVE
    er, eg, eb = _eval_tex_t(scene, flags, mrow[1].astype(jnp.int32), u, v,
                             px, py, pz,
                             allow_noise=flags.has_noise_emission,
                             allow_image=flags.has_image_emission,
                             valid=is_em)
    zero = jnp.zeros_like(er)
    return (jnp.where(is_em, er, zero), jnp.where(is_em, eg, zero),
            jnp.where(is_em, eb, zero))


# ---------------------------------------------------------------------------
# The full tiled bounce (mirror integrator.bounce_shade).
# ---------------------------------------------------------------------------


def wave_rng(base_key, smp, pix, iters, has_sss: bool, sss_steps: int):
    """Per-lane uniforms for one bounce, drawn exactly as the per-lane
    ``bounce_shade`` key discipline (fold base → sample → pixel → iters →
    stream) so the wavefront keeps integrating the megakernel's sample set.
    The threefry bit generation batches perfectly under vmap (full-width
    uint32 ops); only the draws are vmapped, never the shading math."""

    def one(s, p, it):
        key_p = jax.random.fold_in(jax.random.fold_in(base_key, s), p)
        key_it = jax.random.fold_in(key_p, it)
        ks = jax.random.fold_in(key_it, 0)
        km = jax.random.fold_in(key_it, 1)
        kr = jax.random.fold_in(key_it, 2)
        out = {
            "u8": jax.random.uniform(ks, (8,)),
            "umed": jax.random.uniform(km),
            "uiso": jax.random.uniform(jax.random.fold_in(km, 1), (2,)),
            "urr": jax.random.uniform(kr),
        }
        if has_sss:
            # Only the walk KEY is materialised per lane; the (steps, 6)
            # uniforms are drawn inside scatter_t — for the few compacted
            # SSS lanes only, not full width (VERDICT r2 #5).
            out["sss_key"] = jax.random.key_data(jax.random.fold_in(ks, 1))
        return out

    return jax.vmap(one)(smp, pix, iters)


def spawn_rng(base_key, smp, pix):
    """Camera-jitter uniforms: ``uniform(fold_in(key_p, 7), (5,))`` per lane
    (mirrors wavefront ``spawn``'s per-lane draw)."""

    def one(s, p):
        key_p = jax.random.fold_in(jax.random.fold_in(base_key, s), p)
        return jax.random.uniform(jax.random.fold_in(key_p, 7), (5,))

    return jax.vmap(one)(smp, pix)


def spawn_paths(cam, cfg, base_key, smp, pix_g):
    """Batched primary-ray spawn → fresh (R,)-batched PathState.

    THE single implementation of the camera-generation block shared by the
    forward wavefront, the differentiable wavefront and the tiled
    integrator: their RNG draws and normalization must stay byte-identical
    or the engines stop integrating the same sample set (the equivalence
    the whole oracle chain rests on).  Only the uniform draws run under a
    vmap (threefry batches perfectly); ray math runs on component tiles.
    """
    from .integrator import PathState

    R = pix_g.shape[0]
    shape = grid_shape(R)
    g = lambda x: x.reshape(shape)  # noqa: E731
    px = (pix_g % cfg.width).astype(jnp.float32)
    py = (pix_g // cfg.width).astype(jnp.float32)
    u5 = jnp.moveaxis(spawn_rng(base_key, smp, pix_g), -1, 0)
    o_c, d_c, t_c = get_rays_t(cam, g(px), g(py),
                               [g(u5[k]) for k in range(5)])
    # _init_state's vec.normalize, component-mirrored (EPS = 1e-8).
    ninv = jax.lax.rsqrt(jnp.maximum(
        d_c[0] * d_c[0] + d_c[1] * d_c[1] + d_c[2] * d_c[2], 1e-16))
    flat3 = lambda c: jnp.stack(  # noqa: E731
        [x.reshape(R) for x in c], axis=-1)
    return PathState(
        origin=flat3(o_c), direction=flat3([d * ninv for d in d_c]),
        time=t_c.reshape(R), color=jnp.zeros((R, 3)),
        throughput=jnp.ones((R, 3)), depth=jnp.zeros((R,), jnp.int32),
        iters=jnp.zeros((R,), jnp.int32), alive=jnp.ones((R,), bool))


def bounce_shade_t(scene, flags, cam, cfg, tabs: ShadeTables, path,
                   found, ptype, pidx, exit_found, t_exit, exit_is_medium,
                   rngs, rec: HitT | None = None, live=None,
                   aux: bool = False):
    """Tiled :func:`~.integrator.bounce_shade` over an (R,)-batched
    :class:`~.integrator.PathState` — emission, medium free-flight, material
    scatter, Russian roulette, all on (8,128)-tiled component arrays.

    ``rngs`` is the :func:`wave_rng` dict.  Returns a new (R,)-batched
    PathState; lane-for-lane equal to ``vmap(bounce_shade)`` with the same
    keys (tested in tests/test_shade_tiled.py).

    ``rec``: optionally inject a precomputed (R,)-flat :class:`HitT` instead
    of refining from ``(ptype, pidx)`` against the local tables.  The
    pipeline-parallel mode needs this: the hit primitive's geometry lives on
    whichever ring stage owns it, so the record is refined there and carried
    to the home stage (``parallel/pipeline.py``); materials/textures/media —
    everything this function reads — are replicated on every stage.

    ``live``: optional (R,) mask of lanes whose outputs the caller will
    actually KEEP (the wavefront passes its ``ready`` mask; every other
    caller keeps all lanes).  Purely a performance hint: it shrinks the
    valid sets of the sparse-compacted families (marble turbulence, SSS
    walk) so in-flight-but-not-ready lanes don't force the dense fallback.
    Outputs on non-live lanes are unspecified.

    ``aux=True`` additionally returns ``{"walk_steps": scalar}`` — SSS
    walking-lane steps executed for kept lanes (the wavefront's stats
    channel; walk steps are real work but not traced segments).
    """
    from .integrator import PathState

    R = found.shape[0]
    shape = grid_shape(R)
    g = lambda x: jnp.asarray(x).reshape(shape)  # noqa: E731
    live_g = None if live is None else g(live)

    o3 = jnp.moveaxis(path.origin, -1, 0)
    d3 = jnp.moveaxis(path.direction, -1, 0)
    c3 = jnp.moveaxis(path.color, -1, 0)
    t3 = jnp.moveaxis(path.throughput, -1, 0)
    ox, oy, oz = g(o3[0]), g(o3[1]), g(o3[2])
    dx, dy, dz = g(d3[0]), g(d3[1]), g(d3[2])
    col = [g(c3[0]), g(c3[1]), g(c3[2])]
    thr = [g(t3[0]), g(t3[1]), g(t3[2])]
    time = g(path.time)
    depth = g(path.depth)
    iters = g(path.iters)
    alive = g(path.alive)
    found = g(found)
    ptype = g(ptype)
    pidx = g(pidx)
    exit_found = g(exit_found)
    t_exit = g(t_exit)
    exit_is_medium = g(exit_is_medium)

    u8v = jnp.moveaxis(rngs["u8"], -1, 0)
    u8 = [g(u8v[k]) for k in range(8)]
    umed = g(rngs["umed"])
    urr = g(rngs["urr"])
    uisov = jnp.moveaxis(rngs["uiso"], -1, 0)
    uiso = (g(uisov[0]), g(uisov[1]))
    sss_keys = rngs["sss_key"] if flags.has_sss else None  # (R, 2) uint32

    # --- miss: background (kernels.py:1162-1167) ---
    bg = background_t(cam, dx, dy, dz)
    miss = [col[k] + thr[k] * bg[k] for k in range(3)]

    if rec is None:
        rec = refine_hit_t(tabs, ptype, pidx, ox, oy, oz, dx, dy, dz,
                           time, cfg.t_min)
    else:
        rec = jax.tree.map(g, rec)  # (R,)-flat leaves → lane-grid leaves
    # Mirror bounce_shade exactly: the chord endpoints are zero-gradient by
    # the visibility convention (t2 comes from the stop-gradiented exit
    # traversal; letting t1 carry gradient would leak a biased half-term
    # through the medium chord — caught by review, regression-tested).
    t_hit = jax.lax.stop_gradient(rec.t)

    # --- constant medium (integrator.bounce_shade semantics) ---
    if flags.has_medium:
        in_medium = found & (rec.medium >= 0)
        entering = in_medium & rec.front
        exiting = in_medium & ~rec.front
        t1 = jnp.where(entering, t_hit, 0.0)
        t2 = jnp.where(entering, t_exit, t_hit)
        region_ok = jnp.where(entering, exit_found, exiting)
        # _medium_sample on components.
        mi = jnp.clip(rec.medium, 0, tabs.med.shape[0] - 1)
        medrow = small_rows(tabs.med, mi)
        density = medrow[0]
        t1c = jnp.maximum(jnp.maximum(t1, cfg.t_min), 0.0)
        t2c = jnp.minimum(t2, cfg.t_max)
        ray_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        distance_inside = (t2c - t1c) * ray_len
        hit_distance = -jnp.log(jnp.maximum(umed, 1e-10)) / density
        med_scatter = (region_ok & (t1c < t2c)
                       & (hit_distance < distance_inside))
        t_scatter = t1c + hit_distance / ray_len
        psx = ox + t_scatter * dx
        psy = oy + t_scatter * dy
        psz = oz + t_scatter * dz
        med_albedo = _eval_tex_t(scene, flags, medrow[1].astype(jnp.int32),
                                 jnp.zeros_like(psx), jnp.zeros_like(psx),
                                 psx, psy, psz,
                                 allow_noise=flags.has_noise_medium,
                                 allow_image=flags.has_image_medium,
                                 valid=in_medium)
        med_scatter = in_medium & med_scatter
        stop_short = entering & exit_found & ~exit_is_medium
        hop_t = jnp.where(exiting, t_hit, t_exit)
        cont_t = jnp.maximum(
            jnp.where(stop_short, t2 - 2.0 * cfg.t_min, hop_t + 1e-3),
            cfg.t_min)
        escape = entering & ~exit_found
        passthrough = in_medium & ~med_scatter & ~escape
        found = found & ~escape
    else:
        med_scatter = jnp.zeros(shape, bool)
        passthrough = jnp.zeros(shape, bool)
        t_scatter = jnp.zeros(shape)
        cont_t = jnp.zeros(shape)
        med_albedo = (jnp.zeros(shape),) * 3

    # --- surface shading ---
    surface = found & ~med_scatter & ~passthrough
    albedo_valid = found if live_g is None else (found & live_g)
    albedo = _eval_tex_t(
        scene, flags,
        small_rows(tabs.mat,
                   jnp.clip(rec.mat, 0,
                            tabs.mat.shape[0] - 1))[1].astype(jnp.int32),
        rec.u, rec.v, *rec.p, allow_noise=True, valid=albedo_valid)
    scat_ok, s_o, s_d, s_at, mrow, walk_steps = scatter_t(
        scene, flags, cfg.sss_max_steps, tabs, rec, dx, dy, dz, u8, sss_keys,
        albedo, live=live_g)
    emit = emitted_t(scene, flags, mrow, rec.u, rec.v, *rec.p)

    surf_f = jnp.where(surface, 1.0, 0.0)
    color = [jnp.where(found, col[k] + surf_f * thr[k] * emit[k], miss[k])
             for k in range(3)]

    iso = _unit_vector_t(uiso[0], uiso[1])
    medp = (ox + t_scatter * dx, oy + t_scatter * dy, oz + t_scatter * dz)

    scattered = jnp.where(med_scatter, True,
                          jnp.where(surface, scat_ok, False))
    orig = [ox, oy, oz]
    dirc = [dx, dy, dz]
    n_o = [jnp.where(med_scatter, medp[k], s_o[k]) for k in range(3)]
    n_d = [jnp.where(med_scatter, iso[k], s_d[k]) for k in range(3)]
    at = [jnp.where(med_scatter, med_albedo[k], s_at[k]) for k in range(3)]

    pass_o = [orig[k] + dirc[k] * cont_t for k in range(3)]
    next_o = [jnp.where(passthrough, pass_o[k],
                        jnp.where(scattered, n_o[k], orig[k]))
              for k in range(3)]
    keep_dir = passthrough | ~scattered
    next_d = [jnp.where(keep_dir, dirc[k], n_d[k]) for k in range(3)]
    thr = [jnp.where(scattered, thr[k] * at[k], thr[k]) for k in range(3)]
    depth = depth + jnp.where(scattered, 1, 0)
    alive = alive & (passthrough | scattered) & (depth < cfg.max_depth)

    # --- Russian roulette (kernels.py:1145-1157) ---
    if cfg.use_russian_roulette:
        rr_active = scattered & (depth >= cfg.rr_min_depth)
        survival = jnp.minimum(
            jnp.maximum(jnp.maximum(thr[0], thr[1]), thr[2]),
            cfg.rr_max_prob)
        killed = rr_active & (urr > survival)
        boost = jnp.where(rr_active & ~killed,
                          1.0 / jnp.maximum(survival, 1e-6), 1.0)
        boost = jax.lax.stop_gradient(boost)
        thr = [t * boost for t in thr]
        alive = alive & ~killed

    flat = lambda comps: jnp.stack(  # noqa: E731
        [c.reshape(R) for c in comps], axis=-1)
    out = PathState(
        origin=flat(next_o), direction=flat(next_d), time=path.time,
        color=flat(color), throughput=flat(thr),
        depth=depth.reshape(R), iters=iters.reshape(R) + 1,
        alive=alive.reshape(R))
    if aux:
        return out, {"walk_steps": walk_steps}
    return out
