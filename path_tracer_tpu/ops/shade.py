"""Texture evaluation + material sample-and-shade (device-side).

Replaces the reference's Taichi ``eval_texture`` 4-way dispatch
(kernels.py:924-1017), ``emitted`` (kernels.py:789-814) and the 5-way
``scatter`` branch (kernels.py:817-917) — extended with the two subsurface
materials that the reference only supports on CPU (material.py:145-276).

Dispatch strategy: every material family is evaluated on every lane and the
result selected by material type (masked lanes).  On the TPU VPU this is
cheaper than divergent branching, and it is what makes the shader a single
fused XLA computation.  Expensive optional families (noise texture, image
texture, volumetric SSS random walk) are gated by *static* scene flags so
simple scenes compile to small programs.

All color math is differentiable w.r.t. material/texture tables.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils import perlin, rng, vec
from .types import (MAT_DIELECTRIC, MAT_EMISSIVE, MAT_ISOTROPIC,
                    MAT_LAMBERTIAN, MAT_METAL, MAT_SSS_SIMPLE,
                    MAT_SSS_VOLUMETRIC, TEX_CHECKER, TEX_IMAGE, TEX_NOISE,
                    SceneArrays)

# Sparse-compaction switch for the expensive texture families in
# eval_texture_batched (A/B measurement hook).  Two on-chip measurements
# DISAGREE and the in-context one wins: a standalone eval microbenchmark
# (R=16384, vol2_final textures) says dense is 0.70-0.79 ms vs compacted
# 1.18-1.66 ms — but inside the real wavefront render the whole sample is
# 263 ms/sample compacted vs 394 dense.  Fused into the wave loop, the
# compaction's cumsum/scatter overlaps fine while the full-width turbulence
# + atlas gathers do not.  Trust the end-to-end number.
SPARSE_COMPACT = True


@dataclass(frozen=True)
class SceneFlags:
    """Static capability flags — jit-specialisation switches.

    Derived once per compiled scene on the host; passing them as static lets
    XLA drop entire shading families the scene never uses (the reference pays
    for its full megakernel on every scene).
    """

    has_noise: bool = True
    has_image: bool = True
    has_medium: bool = True
    has_sss: bool = True
    # Fine-grained noise flags: the 7-octave Perlin turbulence is by far the
    # most expensive texture family (~100 gathers/lane/eval), and in masked
    # SIMD it runs on EVERY lane of every eval_texture call whose call site
    # admits it.  Emissive and medium textures are almost never noise, so
    # those call sites get their own flags and usually compile it out.
    has_noise_emission: bool = True
    has_noise_medium: bool = True
    # Same per-call-site gating for image textures: the atlas gather costs
    # ~0.25 ms per full-width eval (r3 profile) and emission/medium albedos
    # are almost never image-textured.
    has_image_emission: bool = True
    has_image_medium: bool = True

    @classmethod
    def from_scene(cls, scene: SceneArrays) -> "SceneFlags":
        import numpy as np

        tex_t = np.asarray(scene.tex_type)
        mat_t = np.asarray(scene.mat_type)
        mat_tex = np.asarray(scene.mat_tex)
        med_tex = np.asarray(scene.med_tex)
        emissive_tex = mat_tex[mat_t == MAT_EMISSIVE]
        return cls(
            has_noise=bool((tex_t == TEX_NOISE).any()),
            has_image=bool((tex_t == TEX_IMAGE).any()),
            has_medium=bool(
                (np.asarray(scene.sph_medium) >= 0).any()
                or (np.asarray(scene.qd_medium) >= 0).any()
                or (np.asarray(scene.tr_medium) >= 0).any()),
            has_sss=bool(((mat_t == MAT_SSS_SIMPLE) | (mat_t == MAT_SSS_VOLUMETRIC)).any()),
            has_noise_emission=bool((tex_t[emissive_tex] == TEX_NOISE).any())
            if emissive_tex.size else False,
            has_noise_medium=bool((tex_t[med_tex] == TEX_NOISE).any())
            if med_tex.size else False,
            has_image_emission=bool((tex_t[emissive_tex] == TEX_IMAGE).any())
            if emissive_tex.size else False,
            has_image_medium=bool((tex_t[med_tex] == TEX_IMAGE).any())
            if med_tex.size else False,
        )


def sample_image(scene: SceneArrays, img_idx, u, v):
    """Nearest-texel image lookup (texture.py:61-80): clamp UV, flip V."""
    ii = jnp.clip(img_idx, 0, scene.img_data.shape[0] - 1)
    h = scene.img_hw[ii, 0]
    w = scene.img_hw[ii, 1]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    x = jnp.clip((uu * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((vv * h).astype(jnp.int32), 0, h - 1)
    return _atlas_rows(scene, ii, y, x)


def _atlas_rows(scene: SceneArrays, ii, y, x):
    """Atlas texel fetch as a ROW gather from the flat (N*H*W, 3) view.

    The 3-axis gather ``img_data[ii, y, x]`` makes XLA stage the whole
    atlas into VMEM first (r4 profile: a 54 µs copy-done per control step
    — 6.5 ms/sample — for ~1k texels actually read); the flat view is
    loop-invariant (hoisted) and the row gather reads just the rows.
    """
    H, W = scene.img_data.shape[1], scene.img_data.shape[2]
    flat = scene.img_data.reshape(-1, 3)
    return flat[(ii * H + y) * W + x]


def eval_texture(scene: SceneArrays, flags: SceneFlags, tex_idx, u, v, p,
                 allow_noise: bool = True, allow_image: bool = True):
    """Texture table dispatch (kernels.py:924-1017) → (3,) color.

    Unlike the reference, image textures work on *all* primitive types (the
    reference renders magenta off-sphere, kernels.py:1007-1009).
    ``allow_noise``/``allow_image`` let call sites that statically never see
    those texture families (emission, medium albedo) compile the expensive
    Perlin turbulence / atlas gather out.
    """
    ti = jnp.clip(tex_idx, 0, scene.tex_type.shape[0] - 1)
    ttype = scene.tex_type[ti]
    c1 = scene.tex_c1[ti]
    c2 = scene.tex_c2[ti]
    scale = scene.tex_scale[ti]

    out = c1  # TEX_SOLID

    # Checker: 3-D integer lattice parity (texture.py:50-57).
    lattice = jnp.floor(scale[..., None] * p)
    even = (jnp.sum(lattice, axis=-1).astype(jnp.int32) % 2) == 0
    out = jnp.where((ttype == TEX_CHECKER)[..., None],
                    jnp.where(even[..., None], c1, c2), out)

    if flags.has_image and allow_image:
        img = sample_image(scene, scene.tex_img[ti], u, v)
        out = jnp.where((ttype == TEX_IMAGE)[..., None], img, out)

    if flags.has_noise and allow_noise:
        # Marble: 0.5*(1+sin(scale*z + 10*turb(p,7))) (texture.py:84-90).
        turbv = perlin.turb_s(scene.perlin_vec, scene.perlin_perm,
                              p[..., 0], p[..., 1], p[..., 2], depth=7)
        # value = color(.5,.5,.5) * (1 + sin) — i.e. 0.5*(1+sin) per channel.
        marble = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turbv))
        out = jnp.where((ttype == TEX_NOISE)[..., None],
                        jnp.broadcast_to(marble[..., None], marble.shape + (3,)),
                        out)
    return out


def small_rows(table, idx):
    """``moveaxis(table[idx], -1, 0)`` via one-hot MXU matmul for SMALL tables.

    A full-width gather costs ~19 µs at 12288 lanes regardless of table
    size (per-row issue-bound — r4 profile: 2.1 ms/sample went to gathering
    a TWO-row medium table).  For tables up to 64 rows a one-hot matmul is
    ~10× cheaper and exact for f32 (one unit product per output; the r3
    ``bench_gather`` one-hot equivalence).  The r5 Perlin result
    (utils/perlin._rows_256) showed the crossover extends to 256-row
    tables; this helper keeps the conservative 64 cap because the only
    larger tables it ever sees are the per-scene prim tables (thousands
    of rows, where the one-hot's K dim genuinely loses).
    """
    rows = table.shape[0]
    if rows > 64:
        return jnp.moveaxis(table[idx], -1, 0)
    oh = (idx[..., None] == jnp.arange(rows, dtype=idx.dtype)).astype(
        table.dtype)
    # HIGHEST precision: the MXU's default f32 path truncates operands to
    # bf16 — table values came back rounded (observed: the bench scene's
    # measured ray count shifted, i.e. RR decisions moved).  With exact
    # one-hot rows the higher-precision product reconstructs the f32 value
    # bit-exactly, keeping engine parity with the per-lane gather path.
    out = jnp.tensordot(oh, table, axes=1,
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, 0)


def eval_texture_batched(scene: SceneArrays, flags: SceneFlags, tex_idx,
                         u, v, p, allow_noise: bool = True,
                         allow_image: bool = True, valid=None):
    """Tile-batched texture eval for (R,)-batched hits → (R, 3) colors.

    Semantics of :func:`eval_texture`, written batch-major over the
    (R/128, 128) lane grid: row gathers + one transpose each, all arithmetic
    on whole (8,128) tiles, and the Perlin marble through
    :func:`~..utils.perlin.turb_t`.  The wavefront engine precomputes the
    scatter albedo here, OUTSIDE its per-lane shade vmap, because the vmapped
    form pays a cross-lane relayout per gathered component (the marble
    texture alone was ~90% of wave shading cost on v5e).  Bit-compatible
    with the per-lane form up to fusion-level float reassociation.

    Contract: when ``valid`` is given, outputs on lanes with ``valid=False``
    are UNSPECIFIED (the expensive-family write-back masks with the raw
    family mask, so excluded lanes may hold gathered garbage) — callers must
    mask such lanes downstream, exactly as ``bounce_shade_t`` does with
    ``live``.
    """
    R = tex_idx.shape[0]
    shape = (R // 128, 128) if (R % 128 == 0 and R >= 128) else (R,)
    ti = jnp.clip(tex_idx, 0, scene.tex_type.shape[0] - 1).reshape(shape)
    u = u.reshape(shape)
    v = v.reshape(shape)
    px = p[..., 0].reshape(shape)
    py = p[..., 1].reshape(shape)
    pz = p[..., 2].reshape(shape)

    # One packed row gather for the whole texture record: per-component
    # gathers from 1-D tables each lower to a cross-lane relayout (the
    # make_tables lesson, shade_tiled.py) — 5 of them dominated this
    # function's fixed cost.  The concat is loop-invariant; XLA hoists it.
    tex_tab = jnp.concatenate(
        [scene.tex_type.astype(jnp.float32)[:, None], scene.tex_c1,
         scene.tex_c2, scene.tex_scale[:, None],
         scene.tex_img.astype(jnp.float32)[:, None]], axis=1)  # (T, 9)
    row = small_rows(tex_tab, ti)               # (9,) + shape
    ttype = row[0].astype(jnp.int32)
    c1 = row[1:4]                                 # (3,) + shape
    c2 = row[4:7]
    scale = row[7]
    img_idx = row[8].astype(jnp.int32)

    out = [c1[0], c1[1], c1[2]]  # TEX_SOLID

    # Checker: 3-D integer lattice parity (texture.py:50-57).
    lat = (jnp.floor(scale * px) + jnp.floor(scale * py)
           + jnp.floor(scale * pz))
    even = (lat.astype(jnp.int32) % 2) == 0
    is_ck = ttype == TEX_CHECKER
    for k in range(3):
        out[k] = jnp.where(is_ck, jnp.where(even, c1[k], c2[k]), out[k])

    # --- expensive families: image atlas + Perlin marble -----------------
    # Both are sparse in practice (a couple of textured objects among
    # thousands of prims) while masked SIMD pays full width for one live
    # lane, so both families share ONE compaction: a prefix-sum rank over
    # the live expensive lanes, one position scatter, packed evaluation in
    # a small budget buffer, and a single (budget, 3) ROW-gather unpack.
    # (r3 profile: per-family conds cost 0.49 + 0.40 ms/ctrl, most of it
    # four 1-D unpack gathers at ~0.12 ms each — 1-D gathers lower to
    # cross-lane relayouts; row gathers are ~20x cheaper.)  On overflow a
    # lax.cond falls back to full-width evaluation; both paths are exact
    # on the selected lanes.
    need_img = flags.has_image and allow_image
    need_nz = flags.has_noise and allow_noise
    if need_img or need_nz:
        budget = 256
        while budget * 8 < R:  # keep the fallback rare on huge pools
            budget *= 2
        # Rung ladder: the marble/atlas eval cost scales with the BUFFER
        # size (7-octave turbulence = 77 gather rows/lane), not the live
        # count — a fixed R/8 buffer paid 4096 lanes of turbulence for a
        # few hundred live marble lanes (r5 config-4 ablation: the marble
        # ground was >50% of the whole sample).  Pick the tightest rung per
        # control step; each extra rung costs only a lax.cond branch.
        rungs = sorted({max(budget // 16, 256), max(budget // 4, 256),
                        budget})
        zero = jnp.zeros_like(px)
        fal = zero.astype(bool)
        is_img = (ttype == TEX_IMAGE) if need_img else fal
        is_nz = (ttype == TEX_NOISE) if need_nz else fal

        def eval_expensive(qt, qu, qv, qpx, qpy, qpz, qs, qi):
            """Image + marble colors for one lane grid → 3 components."""
            co = [jnp.zeros_like(qpx) for _ in range(3)]
            if need_img:
                ii = jnp.clip(qi, 0, scene.img_data.shape[0] - 1)
                hw = jnp.moveaxis(scene.img_hw[ii], -1, 0)
                h, w = hw[0], hw[1]
                x = jnp.clip((jnp.clip(qu, 0.0, 1.0) * w).astype(jnp.int32),
                             0, w - 1)
                y = jnp.clip(((1.0 - jnp.clip(qv, 0.0, 1.0)) * h)
                             .astype(jnp.int32), 0, h - 1)
                tex = jnp.moveaxis(_atlas_rows(scene, ii, y, x), -1, 0)
                qm = qt == TEX_IMAGE
                for k in range(3):
                    co[k] = jnp.where(qm, tex[k], co[k])
            if need_nz:
                turbv = perlin.turb_t(scene.perlin_vec, scene.perlin_perm,
                                      qpx, qpy, qpz, depth=7)
                # texture.py:90: color(.5,.5,.5)*(1+sin) = 0.5*(1+sin)/chan.
                marble = 0.5 * (1.0 + jnp.sin(qs * qpz + 10.0 * turbv))
                qm = qt == TEX_NOISE
                for k in range(3):
                    co[k] = jnp.where(qm, marble, co[k])
            return co

        exp_mask = is_img | is_nz
        ev = exp_mask if valid is None else (exp_mask & valid.reshape(shape))
        if R <= budget or shape == (R,) or not SPARSE_COMPACT:
            col = eval_expensive(ttype, u, v, px, py, pz, scale, img_idx)
        elif need_img and need_nz:
            # Both families live: give each HALF the buffer (disjoint slot
            # ranges) so the turbulence runs only on the noise half and the
            # atlas gather only on the image half — a lane is exactly one
            # family, so one position scatter still packs both.
            nz_flat = (is_nz if valid is None
                       else (is_nz & valid.reshape(shape))).reshape(R)
            im_flat = (is_img if valid is None
                       else (is_img & valid.reshape(shape))).reshape(R)
            rank_n = jnp.cumsum(nz_flat.astype(jnp.int32)) - 1
            rank_i = jnp.cumsum(im_flat.astype(jnp.int32)) - 1
            n_nz = jnp.sum(nz_flat.astype(jnp.int32))
            n_im = jnp.sum(im_flat.astype(jnp.int32))

            # ONE direct row scatter packs all 7 components: the previous
            # position scatter + row gather paid the same per-update-row
            # scatter cost (~4.6 ns x R on v5e, ~57 us/ctrl) PLUS the
            # gather; scattering the (R, 7) stack itself needs no pos at
            # all.  (Per-component 1-D packs before that were worse still —
            # a cross-lane relayout each.)
            stacked = jnp.stack(
                [u, v, px, py, pz, scale, img_idx.astype(jnp.float32)],
                axis=-1).reshape(R, 7)

            def sparse_w(w):
                half = w // 2
                h_rows = half // 128
                # Overflowing lanes in EITHER family map to the dropped
                # slot (w) — never into the other family's half.
                # Unreachable while the (n_nz<=half)&(n_im<=half) guard
                # routes overflow to a bigger rung/dense, but a drifted
                # guard must degrade to dropped lanes, not silently stomp
                # the image half's slots.
                slot = jnp.where(nz_flat,
                                 jnp.where(rank_n < half, rank_n, w),
                                 jnp.where(im_flat,
                                           half + jnp.minimum(rank_i, half),
                                           w))
                bgrid = (w // 128, 128)

                def go(_):
                    packed = jnp.moveaxis(
                        jnp.zeros((w, 7), jnp.float32).at[slot].set(
                            stacked, mode="drop"), -1, 0)  # (7, w)
                    names = ("u", "v", "px", "py", "pz", "s", "i")
                    p = {k: packed[j].reshape(bgrid)
                         for j, k in enumerate(names)}
                    p["i"] = p["i"].astype(jnp.int32)
                    # noise half: rows [0, h_rows)
                    turbv = perlin.turb_t(scene.perlin_vec,
                                          scene.perlin_perm,
                                          p["px"][:h_rows], p["py"][:h_rows],
                                          p["pz"][:h_rows], depth=7)
                    marble = 0.5 * (1.0 + jnp.sin(
                        p["s"][:h_rows] * p["pz"][:h_rows] + 10.0 * turbv))
                    # image half: rows [h_rows, ...)
                    ii = jnp.clip(p["i"][h_rows:], 0,
                                  scene.img_data.shape[0] - 1)
                    hw = jnp.moveaxis(scene.img_hw[ii], -1, 0)
                    h, wd = hw[0], hw[1]
                    x = jnp.clip((jnp.clip(p["u"][h_rows:], 0.0, 1.0) * wd)
                                 .astype(jnp.int32), 0, wd - 1)
                    y = jnp.clip(((1.0 - jnp.clip(p["v"][h_rows:], 0.0, 1.0))
                                  * h).astype(jnp.int32), 0, h - 1)
                    tex = jnp.moveaxis(_atlas_rows(scene, ii, y, x), -1, 0)
                    rows = jnp.stack(
                        [jnp.concatenate([marble.reshape(half),
                                          tex[k].reshape(w - half)])
                         for k in range(3)], axis=-1)
                    idx = jnp.where(nz_flat, jnp.clip(rank_n, 0, half - 1),
                                    half + jnp.clip(rank_i, 0, half - 1))
                    got = rows[idx]                      # (R, 3) row gather
                    gc = jnp.moveaxis(got, -1, 0)
                    return [gc[k].reshape(shape) for k in range(3)]

                return go

            def dense(_):
                return eval_expensive(ttype, u, v, px, py, pz, scale,
                                      img_idx)

            def chain(i):
                if i == len(rungs):
                    return dense
                w = rungs[i]
                return lambda _: jax.lax.cond(
                    (n_nz <= w // 2) & (n_im <= w // 2),
                    sparse_w(w), chain(i + 1), None)

            col = chain(0)(None)
        else:
            ev_flat = ev.reshape(R)
            rank = jnp.cumsum(ev_flat.astype(jnp.int32)) - 1
            n_ev = jnp.sum(ev_flat.astype(jnp.int32))

            # ONE direct row scatter packs all 8 components (see the
            # split-family branch above for the why).
            stacked = jnp.stack(
                [ttype.astype(jnp.float32), u, v, px, py, pz, scale,
                 img_idx.astype(jnp.float32)], axis=-1).reshape(R, 8)

            def sparse_w(w):
                slot = jnp.where(ev_flat, rank, w)  # w = dropped
                bgrid = (w // 128, 128)

                def go(_):
                    packed = jnp.moveaxis(
                        jnp.zeros((w, 8), jnp.float32).at[slot].set(
                            stacked, mode="drop"), -1, 0)  # (8, w)
                    pk = [packed[j].reshape(bgrid) for j in range(8)]
                    pc = eval_expensive(pk[0].astype(jnp.int32), pk[1],
                                        pk[2], pk[3], pk[4], pk[5], pk[6],
                                        pk[7].astype(jnp.int32))
                    rows = jnp.stack([c.reshape(w) for c in pc], axis=-1)
                    got = rows[jnp.clip(rank, 0, w - 1)]  # (R, 3) row gather
                    gc = jnp.moveaxis(got, -1, 0)
                    return [gc[k].reshape(shape) for k in range(3)]

                return go

            def dense(_):
                return eval_expensive(ttype, u, v, px, py, pz, scale,
                                      img_idx)

            def chain(i):
                if i == len(rungs):
                    return dense
                w = rungs[i]
                return lambda _: jax.lax.cond(n_ev <= w, sparse_w(w),
                                              chain(i + 1), None)

            col = chain(0)(None)
        for k in range(3):
            out[k] = jnp.where(exp_mask, col[k], out[k])

    return jnp.stack([o.reshape(R) for o in out], axis=-1)


def emitted(scene: SceneArrays, flags: SceneFlags, mat_idx, u, v, p):
    """Emission lookup (material.py:111-112; kernels.py:789-814)."""
    mi = jnp.clip(mat_idx, 0, scene.mat_type.shape[0] - 1)
    is_emissive = scene.mat_type[mi] == MAT_EMISSIVE
    return jnp.where(is_emissive[..., None],
                     eval_texture(scene, flags, scene.mat_tex[mi], u, v, p,
                                  allow_noise=flags.has_noise_emission,
                                  allow_image=flags.has_image_emission),
                     jnp.zeros(3))


def scatter(scene: SceneArrays, flags: SceneFlags, cfg_sss_steps: int,
            hit_mat, hit_p, hit_n, hit_front, hit_u, hit_v, ray_dir, key,
            albedo=None):
    """Sample the BSDF / phase function for one hit; all families masked.

    Returns (scattered?, new_origin, new_direction, attenuation), matching
    kernels.py:817-917 plus the SSS families.  ``albedo`` lets the wavefront
    engine pass a precomputed (tile-batched) texture color; when None it is
    evaluated here (the megakernel path).
    """
    mi = jnp.clip(hit_mat, 0, scene.mat_type.shape[0] - 1)
    mtype = scene.mat_type[mi]
    unit_in = vec.normalize(ray_dir)
    u = jax.random.uniform(key, (8,))

    if albedo is None:
        albedo = eval_texture(scene, flags, scene.mat_tex[mi], hit_u, hit_v,
                              hit_p)

    # --- Lambertian: cosine-weighted about the shading normal
    # (material.py:32-45), degenerate direction snaps to the normal.
    lam_dir = rng.random_cosine_direction(u[0:2], hit_n)
    lam_dir = jnp.where(vec.near_zero(lam_dir)[..., None], hit_n, lam_dir)

    # --- Metal: mirror + fuzz sphere (material.py:52-60).
    fuzz = scene.mat_fuzz[mi]
    met_dir = vec.reflect(unit_in, hit_n) + fuzz[..., None] * rng.random_unit_vector(u[2:4])

    # --- Dielectric: Schlick + Snell with refract/reflect coin
    # (material.py:66-93).  The discrete choice is stop-gradiented; gradient
    # flows through the chosen direction's smooth math.
    ir = scene.mat_ir[mi]
    ratio = jnp.where(hit_front, 1.0 / ir, ir)
    cos_theta = jnp.minimum(vec.vdot(-unit_in, hit_n), 1.0)
    # Guarded sqrt: this runs on EVERY lane (masked dispatch), and
    # d/dx sqrt(0) = inf would poison other materials' gradients through the
    # where-select (the classic jnp.where NaN trap).
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 1e-12, 1.0))
    cannot_refract = ratio * sin_theta > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    choose_reflect = jax.lax.stop_gradient(
        cannot_refract | (reflectance > u[4]))
    die_dir = jnp.where(choose_reflect[..., None],
                        vec.reflect(unit_in, hit_n),
                        vec.refract(unit_in, hit_n, ratio[..., None]))

    # --- Isotropic: uniform sphere (material.py:134-141).
    iso_dir = rng.random_unit_vector(u[5:7])

    # Assemble by type.
    is_lam = mtype == MAT_LAMBERTIAN
    is_met = mtype == MAT_METAL
    is_die = mtype == MAT_DIELECTRIC
    is_emit = mtype == MAT_EMISSIVE
    is_iso = mtype == MAT_ISOTROPIC

    direction = jnp.where(is_lam[..., None], lam_dir,
                 jnp.where(is_met[..., None], met_dir,
                  jnp.where(is_die[..., None], die_dir, iso_dir)))
    attenuation = jnp.where(is_die[..., None], jnp.ones(3), albedo)
    origin = hit_p
    scattered = ~is_emit

    if flags.has_sss:
        is_sss_s = mtype == MAT_SSS_SIMPLE
        is_sss_v = mtype == MAT_SSS_VOLUMETRIC

        # SSS-simple (material.py:153-174): 50% chance the exit point is
        # displaced by a random offset scaled by scatter_distance.
        sd = scene.mat_scatter_dist[mi]
        displace = (u[7] >= 0.5)
        disp_vec = rng.random_unit_vector(u[5:7]) * (sd * u[4])[..., None]
        simple_origin = jnp.where(displace[..., None], hit_p + disp_vec, hit_p)
        simple_dir = hit_n + rng.random_unit_vector(u[2:4])
        simple_dir = jnp.where(vec.near_zero(simple_dir)[..., None], hit_n, simple_dir)

        origin = jnp.where(is_sss_s[..., None], simple_origin, origin)
        direction = jnp.where(is_sss_s[..., None], simple_dir, direction)

        # SSS-volumetric random walk (material.py:198-249).
        sigma_s = scene.mat_sigma_s[mi]
        sigma_a = scene.mat_sigma_a[mi]
        sigma_t = jnp.maximum(sigma_s + sigma_a, 1e-6)
        g = scene.mat_g[mi]
        walk_key = jax.random.fold_in(key, 1)
        us = jax.random.uniform(walk_key, (cfg_sss_steps, 6))
        start = hit_p - hit_n * 1e-3  # just inside (material.py:200)

        def step(i, st):
            pos, d, thr, status, out_p, out_dir = st
            uu = us[i]
            t = -jnp.log(jnp.maximum(uu[0], 1e-10)) / sigma_t
            pos2 = pos + d * t
            dist = vec.length(pos2 - hit_p)
            exit_prob = 1.0 - jnp.exp(-dist * 0.5)
            walking = status == 0
            do_exit = walking & (uu[1] < exit_prob)
            exit_dir = hit_n + rng.random_unit_vector(uu[2:4])
            exit_dir = jnp.where(vec.near_zero(exit_dir)[..., None], hit_n, exit_dir)
            do_absorb = walking & ~do_exit & (uu[4] < sigma_a / sigma_t)
            cos_hg = rng.sample_henyey_greenstein(uu[5], g)
            new_dir = rng.direction_from_cos(uu[2], cos_hg, d)
            status = jnp.where(do_exit, 1, jnp.where(do_absorb, 2, status))
            out_p = jnp.where(do_exit[..., None], pos2, out_p)
            out_dir = jnp.where(do_exit[..., None], exit_dir, out_dir)
            keep = walking & ~do_exit & ~do_absorb
            d = jnp.where(keep[..., None], new_dir, d)
            pos = jnp.where(keep[..., None], pos2, pos)
            thr = jnp.where(keep[..., None], thr * albedo, thr)
            return pos, d, thr, status, out_p, out_dir

        init = (start, unit_in, jnp.ones(3), jnp.asarray(0, jnp.int32),
                hit_p, hit_n)
        _pos, _d, thr, status, out_p, out_dir = jax.lax.fori_loop(
            0, cfg_sss_steps, step, init)
        exited = status == 1

        origin = jnp.where(is_sss_v[..., None], out_p, origin)
        direction = jnp.where(is_sss_v[..., None], out_dir, direction)
        attenuation = jnp.where(is_sss_v[..., None], thr * albedo, attenuation)
        # Absorbed / max-steps walks terminate the path (material.py:233-249).
        scattered = jnp.where(is_sss_v, exited, scattered)

    return scattered, origin, direction, attenuation
