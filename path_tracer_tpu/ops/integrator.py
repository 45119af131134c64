"""Megakernel path-tracing integrator (depth-first, per-ray loop).

The TPU-native re-design of the reference's Taichi megakernel
(``kernels.py:1024-1202`` ``trace_ray`` / ``render_sample``): one jitted XLA
computation traces a ray through bounce after bounce — BVH traversal, volume
scattering, emission, material scatter, Russian roulette — vmapped over ray
batches.  Two drivers share one bounce body:

* :func:`trace_ray` — ``lax.while_loop``; fastest forward rendering (rays
  drop out as they die).
* :func:`trace_ray_scan` — fixed-trip ``lax.scan`` over the same body; this
  is the **differentiable** path (reverse-mode AD cannot transpose a
  while-loop), used for gradient rendering.  Same keys → identical image.

Depth semantics match the reference: volume passthrough does not consume a
scatter bounce (kernels.py:1105-1110), so the loop is budgeted by
``cfg.iters`` while scatter depth is tracked separately.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import rng as rng_mod
from ..utils import vec
from . import camera as cam_ops
from . import shade
from .traverse import refine_hit, traverse_bvh
from .types import CameraArrays, PackedBVH, RenderConfig, SceneArrays


class PathState(NamedTuple):
    origin: jax.Array       # (3,)
    direction: jax.Array    # (3,)
    time: jax.Array         # ()
    color: jax.Array        # (3,) accumulated radiance
    throughput: jax.Array   # (3,)
    depth: jax.Array        # () int32 — scatter bounces taken
    iters: jax.Array        # () int32 — loop trips (incl. passthrough)
    alive: jax.Array        # () bool


def prim_front_face(scene, ptype, pidx, origin, direction, time, t):
    """Cheap front-face test for a known hit (no full refine):
    sign of rd · outward_normal (hittable.py:21-31)."""
    p = origin + t[..., None] * direction if jnp.ndim(t) else origin + t * direction
    si = jnp.clip(pidx, 0, scene.sph_rad.shape[0] - 1)
    qi = jnp.clip(pidx, 0, scene.qd_n.shape[0] - 1)
    ti = jnp.clip(pidx, 0, scene.tr_n.shape[0] - 1)
    center = vec.lerp(scene.sph_c0[si], scene.sph_c1[si], time)
    n_sph = p - center  # unnormalised: only the sign matters
    n = jnp.where((ptype == 0)[..., None], n_sph,
                  jnp.where((ptype == 1)[..., None], scene.qd_n[qi],
                            scene.tr_n[ti]))
    return jnp.sum(direction * n, axis=-1) < 0.0


def prim_medium_of(scene, ptype, pidx):
    """Constant-medium index of a primitive id (or -1)."""
    si = jnp.clip(pidx, 0, scene.sph_medium.shape[0] - 1)
    qi = jnp.clip(pidx, 0, scene.qd_medium.shape[0] - 1)
    ti = jnp.clip(pidx, 0, scene.tr_medium.shape[0] - 1)
    med = jnp.where(ptype == 0, scene.sph_medium[si],
                    jnp.where(ptype == 1, scene.qd_medium[qi],
                              scene.tr_medium[ti]))
    return jnp.where(ptype >= 0, med, -1)


def _medium_sample(scene, flags, cfg, st, t1, t2, medium_idx, region_ok, key):
    """Constant-medium free-flight sampling over the chord [t1, t2]
    (constant_medium.py:31-56 semantics: exponential distance vs. the chord
    length, memoryless per segment).
    Returns (scatter_in_medium, t_scatter, albedo).
    """
    mi = jnp.clip(medium_idx, 0, scene.med_density.shape[0] - 1)
    density = scene.med_density[mi]

    t1 = jnp.maximum(jnp.maximum(t1, cfg.t_min), 0.0)
    t2 = jnp.minimum(t2, cfg.t_max)
    ray_len = vec.length(st.direction)
    distance_inside = (t2 - t1) * ray_len

    u = jax.random.uniform(key)
    hit_distance = -jnp.log(jnp.maximum(u, 1e-10)) / density
    scatter_in = region_ok & (t1 < t2) & (hit_distance < distance_inside)
    t_scatter = t1 + hit_distance / ray_len

    p_scatter = st.origin + t_scatter[..., None] * st.direction
    albedo = shade.eval_texture(scene, flags, scene.med_tex[mi],
                                jnp.zeros(()), jnp.zeros(()), p_scatter,
                                allow_noise=flags.has_noise_medium,
                                allow_image=flags.has_image_medium)
    return scatter_in, t_scatter, albedo


def bounce_body(scene: SceneArrays, flags: shade.SceneFlags, bvh: PackedBVH,
                cam: CameraArrays, cfg: RenderConfig, st: PathState,
                ray_key) -> PathState:
    """One loop trip of the megakernel (kernels.py:1054-1168):
    traverse (+ volume-exit traverse) then shade."""
    found, ptype, pidx, t_hit = traverse_bvh(
        bvh, st.origin, st.direction, st.time,
        cfg.t_min, cfg.t_max, cfg.stack_depth)

    if flags.has_medium:
        # Volume exit: next surface past the entry (kernels.py:417-421).
        exit_found, e_pt, e_pi, t_exit = traverse_bvh(
            bvh, st.origin, st.direction, st.time,
            jax.lax.stop_gradient(t_hit) + 1e-4, cfg.t_max, cfg.stack_depth)
        exit_is_medium = prim_medium_of(scene, e_pt, e_pi) >= 0
    else:
        exit_found = jnp.zeros((), bool)
        t_exit = jnp.zeros(())
        exit_is_medium = jnp.zeros((), bool)

    return bounce_shade(scene, flags, cam, cfg, st, found, ptype, pidx,
                        exit_found, t_exit, exit_is_medium, ray_key)


def bounce_shade(scene: SceneArrays, flags: shade.SceneFlags,
                 cam: CameraArrays, cfg: RenderConfig, st: PathState,
                 found, ptype, pidx, exit_found, t_exit, exit_is_medium,
                 ray_key, rec=None, albedo=None) -> PathState:
    """The traversal-free half of a bounce: emission, medium sampling,
    material scatter, Russian roulette.  Shared verbatim by the megakernel
    and the wavefront engine, which is what keeps the two engines
    bit-identical for the same keys (the mega-vs-wave oracle,
    docs/WAVEFRONT_USAGE.md:146-150).

    ``rec``/``albedo`` let the wavefront engine inject the hit record and
    scatter albedo it computed tile-batched outside its per-lane vmap (the
    vmapped texture eval pays per-component relayouts); when None they are
    computed here — the megakernel path."""
    key_it = jax.random.fold_in(ray_key, st.iters)
    k_scatter = jax.random.fold_in(key_it, 0)
    k_medium = jax.random.fold_in(key_it, 1)
    k_rr = jax.random.fold_in(key_it, 2)

    # --- miss: background, terminate (kernels.py:1162-1167) ---
    bg = cam_ops.background_color(cam, st.direction)
    miss_color = st.color + st.throughput * bg

    if rec is None:
        rec = refine_hit(scene, ptype, pidx, st.origin, st.direction,
                         st.time, cfg.t_min)
    t_hit = jax.lax.stop_gradient(rec.t)

    # --- constant medium (optional static family) ---
    # Book-correct per-segment semantics (constant_medium.py:31-56):
    #   entering hit (front_face): the medium chord is [t_hit, next surface]
    #   exiting hit (origin inside the medium): chord is [ray start, t_hit]
    #     — the CPU oracle gets this via its universe-interval negative-root
    #     trick; it is what makes the global fog apply to rays born inside.
    # No scatter → the boundary is TRANSPARENT.  Continuation never tunnels
    # through a real surface: if the chord's far end is a non-medium
    # surface, the ray resumes just in front of it and interacts with it in
    # the next segment.  (The reference GPU hops past whatever the next
    # surface is — tunneling — and re-samples chords after interior
    # scattering, which double-counts the medium: its white cornell smoke
    # renders dark.)
    if flags.has_medium:
        in_medium = found & (rec.medium >= 0)
        entering = in_medium & rec.front_face
        exiting = in_medium & ~rec.front_face
        t1 = jnp.where(entering, t_hit, 0.0)
        t2 = jnp.where(entering, t_exit, t_hit)
        region_ok = jnp.where(entering, exit_found, exiting)
        med_scatter, t_scatter, med_albedo = _medium_sample(
            scene, flags, cfg, st, t1, t2, rec.medium, region_ok, k_medium)
        med_scatter = in_medium & med_scatter
        # Transparent-boundary continuation for the no-scatter case:
        stop_short = entering & exit_found & ~exit_is_medium
        hop_t = jnp.where(exiting, t_hit, t_exit)
        # stop-short places the origin 2*t_min before the real surface so
        # the next segment's t_min window still reaches it.
        cont_t = jnp.maximum(
            jnp.where(stop_short, t2 - 2.0 * cfg.t_min, hop_t + 1e-3),
            cfg.t_min)
        # Entering with nothing behind: the ray provably escapes → background
        # now (the reference GPU instead scatters off the invisible shell's
        # surface material, kernels.py:1113-1121 — an artifact).
        escape = entering & ~exit_found
        passthrough = in_medium & ~med_scatter & ~escape
        found = found & ~escape
    else:
        in_medium = med_scatter = passthrough = jnp.zeros((), bool)
        t_scatter = jnp.zeros(())
        cont_t = jnp.zeros(())
        med_albedo = jnp.zeros(3)

    # --- surface shading (also the fallback for medium with no exit,
    # kernels.py:1113-1121) ---
    surface = found & ~med_scatter & ~passthrough
    emit = shade.emitted(scene, flags, rec.mat, rec.u, rec.v, rec.p)
    scat_ok, s_origin, s_dir, s_atten = shade.scatter(
        scene, flags, cfg.sss_max_steps, rec.mat, rec.p, rec.normal,
        rec.front_face, rec.u, rec.v, st.direction, k_scatter,
        albedo=albedo)

    # --- combine the three hit outcomes ---
    color = jnp.where(found, st.color + jnp.where(surface, 1.0, 0.0) * st.throughput * emit,
                      miss_color)

    iso_dir = rng_mod.random_unit_vector(
        jax.random.uniform(jax.random.fold_in(k_medium, 1), (2,)))
    med_point = st.origin + t_scatter[..., None] * st.direction

    scattered = jnp.where(med_scatter, True, jnp.where(surface, scat_ok, False))
    new_origin = jnp.where(med_scatter, med_point, s_origin)
    new_dir = jnp.where(med_scatter, iso_dir, s_dir)
    atten = jnp.where(med_scatter, med_albedo, s_atten)

    # Passthrough: transparent-boundary continuation at cont_t (same scatter
    # depth; the iteration budget cfg.iters bounds the loop).
    pass_origin = st.origin + st.direction * cont_t

    next_origin = jnp.where(passthrough, pass_origin,
                            jnp.where(scattered, new_origin, st.origin))
    next_dir = jnp.where(passthrough | ~scattered, st.direction, new_dir)
    throughput = jnp.where(scattered, st.throughput * atten, st.throughput)
    depth = st.depth + jnp.where(scattered, 1, 0)

    alive = st.alive & (passthrough | scattered) & (depth < cfg.max_depth)

    # --- Russian roulette (kernels.py:1145-1157) ---
    if cfg.use_russian_roulette:
        rr_active = scattered & (depth >= cfg.rr_min_depth)
        survival = jnp.minimum(jnp.max(throughput, axis=-1), cfg.rr_max_prob)
        u_rr = jax.random.uniform(k_rr)
        killed = rr_active & (u_rr > survival)
        boost = jnp.where(rr_active & ~killed,
                          1.0 / jnp.maximum(survival, 1e-6), 1.0)
        throughput = throughput * jax.lax.stop_gradient(boost)
        alive = alive & ~killed

    return PathState(
        origin=next_origin, direction=next_dir, time=st.time,
        color=color, throughput=throughput, depth=depth,
        iters=st.iters + 1, alive=alive)


def _init_state(origin, direction, time) -> PathState:
    return PathState(
        origin=origin, direction=vec.normalize(direction), time=time,
        color=jnp.zeros(3), throughput=jnp.ones(3),
        depth=jnp.zeros((), jnp.int32), iters=jnp.zeros((), jnp.int32),
        alive=jnp.ones((), bool))


def trace_ray(scene, flags, bvh, cam, cfg: RenderConfig, origin, direction,
              time, ray_key, full_state: bool = False):
    """Forward-only megakernel trace (lax.while_loop driver)."""
    st = _init_state(origin, direction, time)

    def cond(s):
        return s.alive & (s.iters < cfg.iters)

    def body(s):
        return bounce_body(scene, flags, bvh, cam, cfg, s, ray_key)

    out = jax.lax.while_loop(cond, body, st)
    return out if full_state else out.color


def trace_ray_scan(scene, flags, bvh, cam, cfg: RenderConfig, origin,
                   direction, time, ray_key, full_state: bool = False):
    """Differentiable trace: same bounce body under a fixed-trip scan.

    Finished lanes freeze via the ``alive`` mask inside the body, so with the
    same keys this produces bit-identical radiance to :func:`trace_ray` —
    that equivalence is a unit test.
    """
    st = _init_state(origin, direction, time)

    def step(s, _):
        nxt = bounce_body(scene, flags, bvh, cam, cfg, s, ray_key)
        keep = s.alive
        frozen = jax.tree.map(lambda new, old: jnp.where(keep, new, old), nxt, s)
        return frozen, None

    out, _ = jax.lax.scan(step, st, None, length=cfg.iters)
    return out if full_state else out.color


def render_sample(scene, flags, bvh, cam, cfg: RenderConfig, sample_idx,
                  base_key, differentiable: bool = False,
                  chunk_size: int = 2048, with_stats: bool = False):
    """Trace one sample for every pixel → (H, W, 3) radiance.

    Pixels are traced in fixed-size chunks (lax.map) so the lock-step
    while-loop drains over a chunk, not the whole frame — the TPU analogue of
    launching the megakernel over thread blocks (kernels.py:1177-1202).

    With ``with_stats`` also returns ``{"rays", "depth_sum", "depth_hist"}``
    from the per-lane loop-trip/depth counters — the megakernel's measured
    segment count, engine-parity with the wavefront ``stats["rays"]`` (the
    reference left these counters compiled out, kernels.py:1189-1202).
    """
    W, H = cfg.width, cfg.height
    n = W * H
    tracer = trace_ray_scan if differentiable else trace_ray
    key_s = jax.random.fold_in(base_key, sample_idx)

    def one_pixel(pix_idx):
        px = (pix_idx % W).astype(jnp.float32)
        py = (pix_idx // W).astype(jnp.float32)
        key_p = jax.random.fold_in(key_s, pix_idx)
        origin, direction, time = cam_ops.get_ray(cam, px, py,
                                                  jax.random.fold_in(key_p, 7))
        out = tracer(scene, flags, bvh, cam, cfg, origin, direction, time,
                     key_p, full_state=True)
        return out.color, out.iters, out.depth

    chunk = min(chunk_size, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    idxs = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, chunk)
    colors, iters, depth = jax.lax.map(jax.vmap(one_pixel), idxs)
    image = colors.reshape(n_pad, 3)[:n].reshape(H, W, 3)
    if not with_stats:
        return image
    iters = iters.reshape(n_pad)[:n]
    depth = jnp.clip(depth.reshape(n_pad)[:n], 0, cfg.max_depth)
    stats = {
        "rays": jnp.sum(iters),
        "depth_sum": jnp.sum(depth),
        "depth_hist": jnp.zeros(cfg.max_depth + 1, jnp.int32).at[depth].add(1),
    }
    return image, stats


@partial(jax.jit, static_argnames=("flags", "cfg", "differentiable", "spp"))
def render(scene, flags, bvh, cam, cfg: RenderConfig, base_key,
           differentiable: bool = False, spp: int | None = None):
    """Accumulate ``spp`` samples → (H, W, 3) mean radiance."""
    spp = spp if spp is not None else cfg.samples_per_pixel

    def body(s, acc):
        return acc + render_sample(scene, flags, bvh, cam, cfg, s, base_key,
                                   differentiable)

    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32))
    return acc / spp
