"""Pipeline-parallel rendering: scene-shard stages on an ICI ring.

The PP strategy from SURVEY.md §2.7 ("stage the wavefront passes across
devices"), in the form that makes TPU sense.  The reference's wavefront
stages (gen → intersect → shade, renderer.py:313-332) are heterogeneous
passes over one GPU; a literal port would leave S-1 chips idle per pass.
Here the *intersect* pass — the only one that touches the big data — is
split into S stages, each owning 1/S of the scene (its own SAH BVH over a
primitive subset, from :func:`~.scene_shard.shard_scene`), arranged on the
mesh's ICI ring:

* Every stage spawns and owns the ray pool for its pixel block (gen and
  shade are home-stage work — they read only the small replicated
  material/texture/medium tables).
* Per bounce, each pool flows through all S intersection stages via
  neighbor ``ppermute`` hops.  At each hop the resident stage runs its
  local closest-hit query and, where it beats the carried best, refines the
  full differentiable hit record from its local geometry
  (:func:`~..ops.shade_tiled.refine_hit_t`) and swaps it into the bundle.
  After S hops the bundle is home with the *global* closest hit.
* The home stage shades (:func:`~..ops.shade_tiled.bounce_shade_t` with the
  carried record injected), exactly as the replicated engines do.

All S pools are in flight at once — one per stage, each at a different
stage of its intersection pass — which is GPipe's microbatch pipelining
with a closed ring instead of a warmup/drain ramp.  Versus the
tensor-parallel mode (:mod:`.scene_shard`): same 1/S scene memory, but
communication is point-to-point neighbor traffic (the textbook PP pattern,
one ~60 B/ray bundle per hop) instead of per-bounce ``pmin`` + full-state
``psum`` broadcasts, and each stage traverses a *different* ray pool per
hop, so a straggler pool only stalls its own ring slot.

No reference counterpart: the reference has no distributed code
(SURVEY.md §2.8); its closest analogue is the in-device pass pipeline
renderer.py:313-332.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import intersect as isect
from ..ops import shade_tiled as st_mod
from ..ops.integrator_tiled import closest_hit_batched
from ..ops.shade import SceneFlags
from ..ops.types import PackedBVH, RenderConfig
from .render_dist import _shard_map


def _empty_rec(R):
    """Carried best-hit record before any stage has intersected."""
    zf = jnp.zeros((R,), jnp.float32)
    zb = jnp.zeros((R,), bool)
    zi = jnp.zeros((R,), jnp.int32)
    return st_mod.HitT(hit=zb, t=jnp.full((R,), isect.INF, jnp.float32),
                       p=(zf, zf, zf), n=(zf, zf, zf), front=zb, u=zf, v=zf,
                       mat=zi, medium=zi - 1)


def _ring_closest_hit(bvh_l: PackedBVH, tabs_l, cfg: RenderConfig, axis: str,
                      n_stage: int, ro, rd, time, t_min, active):
    """Global closest hit via S ``ppermute`` hops around the stage ring.

    Each hop: local BVH walk (lock-step, tile-batched) + local hit-record
    refinement, folded into the carried best by traversal ``t`` (the same
    winner the replicated engine picks), then the whole bundle moves to the
    next stage.  After ``n_stage`` hops the bundle is back home carrying the
    global best.  Returns ``(found, t_trav, rec)`` — ``t_trav`` is the
    traversal-reported hit distance ((R,), INF on miss) and ``rec`` the
    (R,)-flat refined :class:`~..ops.shade_tiled.HitT` of the winner.
    """
    R = ro.shape[0]
    sh = st_mod.grid_shape(R)
    g = lambda x: x.reshape(sh)  # noqa: E731
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def hop(_, bundle):
        ro, rd, time, t_min, act, fnd, tbest, rec = bundle
        found, pt, pi, t = closest_hit_batched(
            bvh_l, ro, rd, time, t_min, cfg.t_max, cfg.stack_depth,
            active=act)
        o3 = jnp.moveaxis(ro, -1, 0)
        d3 = jnp.moveaxis(rd, -1, 0)
        loc = st_mod.refine_hit_t(
            tabs_l, g(pt), g(pi), g(o3[0]), g(o3[1]), g(o3[2]),
            g(d3[0]), g(d3[1]), g(d3[2]), g(time), g(t_min))
        loc = jax.tree.map(lambda x: x.reshape(R), loc)
        better = found & (t < tbest)
        fnd = fnd | better
        tbest = jnp.where(better, t, tbest)
        rec = jax.tree.map(lambda n, o: jnp.where(better, n, o), loc, rec)
        bundle = (ro, rd, time, t_min, act, fnd, tbest, rec)
        # Neighbor hop over the ring (ICI point-to-point; bools ride as the
        # backend's native pred type).
        return jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis, perm), bundle)

    bundle = (ro, rd, time, t_min, active,
              jnp.zeros((R,), bool), jnp.full((R,), isect.INF), _empty_rec(R))
    out = jax.lax.fori_loop(0, n_stage, hop, bundle)
    _, _, _, _, _, fnd, tbest, rec = out
    return fnd, tbest, rec._replace(hit=fnd)


def _trace_rays_pp(scene_l, flags: SceneFlags, bvh_l, cam,
                   cfg: RenderConfig, path0, smp, pix, base_key, axis: str,
                   n_stage: int):
    """Trace the home pool to completion with ring-pipelined intersection.

    Mirrors :func:`~..ops.integrator_tiled.trace_rays_tiled` bounce-for-
    bounce (same keys, same shading) with the two closest-hit queries (main
    + volume exit) each replaced by a ring pass; shading stays home-local —
    zero collectives outside the rings.
    """
    R = path0.origin.shape[0]
    tabs = st_mod.make_tables(scene_l)
    t_min_v = jnp.full((R,), cfg.t_min)
    sg = jax.lax.stop_gradient

    def step(s, _):
        found, t_hit, rec = _ring_closest_hit(
            bvh_l, tabs, cfg, axis, n_stage, s.origin, s.direction, s.time,
            t_min_v, s.alive)
        if flags.has_medium:
            e_found, t_exit, e_rec = _ring_closest_hit(
                bvh_l, tabs, cfg, axis, n_stage, s.origin, s.direction,
                s.time, sg(t_hit) + 1e-4, s.alive & found)
            exit_is_medium = e_found & (e_rec.medium >= 0)
        else:
            e_found = jnp.zeros((R,), bool)
            t_exit = jnp.zeros((R,))
            exit_is_medium = jnp.zeros((R,), bool)

        rngs = st_mod.wave_rng(base_key, smp, pix, s.iters, flags.has_sss,
                               cfg.sss_max_steps)
        zi = jnp.zeros((R,), jnp.int32)
        nxt = st_mod.bounce_shade_t(scene_l, flags, cam, cfg, tabs, s,
                                    found, zi, zi, e_found, t_exit,
                                    exit_is_medium, rngs, rec=rec)
        keep = s.alive
        frozen = jax.tree.map(
            lambda new, old: jnp.where(
                keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            nxt, s)
        return frozen, None

    out, _ = jax.lax.scan(step, path0, None, length=cfg.iters)
    return out.color


@partial(jax.jit, static_argnames=("flags", "cfg", "mesh", "spp", "axis"))
def render_pp(scene_pp, flags: SceneFlags, bvh_pp, cam, cfg: RenderConfig,
              base_key, mesh: Mesh, spp: int = 1, axis: str = "p"):
    """Pipeline-parallel render over a 1-D stage ring → (H, W, 3).

    ``scene_pp``/``bvh_pp`` come from :func:`~.scene_shard.shard_scene`
    (leading shard axis = stage id).  Each stage owns both a scene shard
    (1/S of the geometry + BVH) AND a contiguous pixel block — pixel
    parallelism and scene-memory scaling on the same axis, with per-bounce
    neighbor-only communication.  Equal to the replicated single-device
    render up to refine-vs-traversal float identity (tested on the virtual
    8-device CPU mesh).
    """
    npix = cfg.width * cfg.height
    n_stage = mesh.shape[axis]
    if n_stage != scene_pp.sph_c0.shape[0]:
        raise ValueError(
            f"scene is sharded {scene_pp.sph_c0.shape[0]}-way but mesh axis "
            f"{axis!r} has {n_stage} devices; reshard with "
            f"shard_scene(scene, {n_stage})")
    per = -(-npix // n_stage)  # ceil; padded tail pixels traced + dropped
    idxs = jnp.arange(per * n_stage, dtype=jnp.int32).reshape(n_stage, per)

    def device_fn(scene_op, nodes, prims, root, idx_block):
        scene_l = jax.tree.map(lambda x: x[0], scene_op)
        bvh_l = PackedBVH(nodes=nodes[0], prims=prims[0], root=root[0],
                          prim_mask=bvh_pp.prim_mask,
                          max_stack=bvh_pp.max_stack,
                          branching=bvh_pp.branching)
        local = idx_block[0]

        def sample_body(smp_i, acc):
            smp = jnp.full((local.shape[0],), smp_i, jnp.int32)
            path0 = st_mod.spawn_paths(cam, cfg, base_key, smp, local)
            return acc + _trace_rays_pp(scene_l, flags, bvh_l, cam, cfg,
                                        path0, smp, local, base_key, axis,
                                        n_stage)

        acc = jax.lax.fori_loop(0, spp, sample_body,
                                jnp.zeros((local.shape[0], 3), jnp.float32))
        return (acc / spp)[None]

    specs = jax.tree.map(lambda _: P(axis), scene_pp)
    colors = _shard_map(
        device_fn, mesh,
        (specs, P(axis), P(axis), P(axis), P(axis, None)),
        P(axis, None))(scene_pp, bvh_pp.nodes, bvh_pp.prims, bvh_pp.root,
                       idxs)
    return colors.reshape(-1, 3)[:npix].reshape(cfg.height, cfg.width, 3)
