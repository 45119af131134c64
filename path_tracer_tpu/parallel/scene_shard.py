"""Tensor-parallel (primitive-sharded) scene mode.

The optional TP strategy from SURVEY.md §2.7: when a scene outgrows one
chip's HBM, shard the *geometry* (and its BVH) by primitive across a mesh
axis while replicating the small material/texture/medium tables and the ray
batch.  Each device traverses only its local sub-scene; the global closest
hit is a ``pmin`` reduction over the ray's per-shard candidates, and the
winning shard (the only one holding that primitive's data) computes the
bounce — its new path state is broadcast with a masked ``psum``.  Rays stay
in lock-step across the axis, so the collectives ride ICI once per bounce
(two for medium scenes: main + volume-exit query).

This is the renderer's analogue of tensor parallelism: the "weights" (scene
arrays + BVH) are sharded, activations (rays) replicated.  Default mode
remains full replication (``render_dist``) — TP only pays when the scene
does not fit.

No reference counterpart: the reference has no distributed code at all
(SURVEY.md §2.8); its closest analogue is the per-primitive-type field
layout (fields.py:25-63).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import intersect as isect
from ..ops import shade_tiled as st_mod
from ..ops.bvh_build import build_from_scene
from ..ops.integrator import PathState
from ..ops.shade import SceneFlags
from ..ops.types import (PackedBVH, RenderConfig, SceneArrays, bvh_layout)
from .render_dist import _shard_map

_GEOM_FIELDS = {
    "sphere": ["sph_c0", "sph_c1", "sph_rad", "sph_mat", "sph_valid",
               "sph_medium"],
    "quad": ["qd_q", "qd_u", "qd_v", "qd_n", "qd_w", "qd_d", "qd_mat",
             "qd_valid", "qd_medium"],
    "triangle": ["tr_v0", "tr_e1", "tr_e2", "tr_n", "tr_mat", "tr_valid",
                 "tr_medium"],
}
_VALID = {"sphere": "sph_valid", "quad": "qd_valid", "triangle": "tr_valid"}


def shard_scene(scene: SceneArrays, n_shards: int, branching: int = 4):
    """Partition a compiled scene into ``n_shards`` equal-shaped sub-scenes.

    Valid primitives are dealt round-robin per family (a cheap spatial mix —
    compile order follows the object graph); every other table (materials,
    textures, images, media, Perlin) is replicated.  Returns
    ``(scene_tp, bvh_tp)`` where every leaf carries a leading shard axis,
    ready for ``shard_map`` with ``P("t")``.
    """
    host = jax.tree.map(np.asarray, scene)
    fam_idx = {fam: np.nonzero(getattr(host, _VALID[fam]))[0]
               for fam in _GEOM_FIELDS}
    # The BVH builder needs >= 1 valid primitive per shard.  A shard left
    # empty by the round-robin deal gets a DUPLICATE of one primitive from
    # the first non-empty family: closest-hit visibility is idempotent
    # under duplication (same t; the cross-shard tie-break picks one
    # winner), so semantics are unchanged.
    donor_fam = next(f for f in _GEOM_FIELDS if len(fam_idx[f]))
    shards = []
    for s in range(n_shards):
        repl = {}
        empty = all(len(fam_idx[f][s::n_shards]) == 0 for f in _GEOM_FIELDS)
        for fam, fields in _GEOM_FIELDS.items():
            idx = fam_idx[fam]
            mine = idx[s::n_shards]
            if empty and fam == donor_fam:
                mine = idx[:1]
            # Equal shapes across shards: pad to the max shard size (>= 1).
            cap = max(1, -(-len(idx) // n_shards))
            for f in fields:
                a = getattr(host, f)
                rows = a[mine]
                pad = np.zeros((cap - len(mine),) + a.shape[1:], a.dtype)
                if f.endswith("_medium"):
                    pad = pad - 1
                repl[f] = np.concatenate([rows, pad], axis=0)
        shards.append(dataclasses.replace(host, **repl))

    bvhs = [build_from_scene(sh, branching=branching) for sh in shards]
    n_nodes = max(b.nodes.shape[0] for b in bvhs)
    n_prims = max(b.prims.shape[0] for b in bvhs)
    mask = tuple(any(b.prim_mask[i] for b in bvhs) for i in range(3))
    ptr_off, _, node_row = bvh_layout(branching)

    def padrows(a, n):
        a = np.asarray(a)
        if a.shape[0] == n:
            return a
        ext = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
        if a.ndim == 2 and a.shape[1] == node_row:
            # Never-hit inverted boxes + empty child pointers, matching
            # pack_bvh's empty-slot convention (offsets from bvh_layout —
            # the row is K-arity-dependent).
            ext[:, 0:6 * branching:6] = 1.0
            ext[:, 3:6 * branching:6] = -1.0
            ext[:, ptr_off:ptr_off + branching] = float(1 << 23)
        return np.concatenate([a, ext], axis=0)

    bvh_tp = PackedBVH(
        nodes=jnp.asarray(np.stack([padrows(b.nodes, n_nodes) for b in bvhs])),
        prims=jnp.asarray(np.stack([padrows(b.prims, n_prims) for b in bvhs])),
        root=jnp.asarray(np.stack([np.asarray(b.root) for b in bvhs])),
        prim_mask=mask,
        max_stack=max(b.max_stack for b in bvhs),
        branching=branching,
    )
    scene_tp = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *shards)
    return scene_tp, bvh_tp


def _traverse_tp(bvh, ro, rd, time, t_min, t_max, stack_depth, axis,
                 active=None):
    """Local closest hit + cross-shard ``pmin`` reduce ((R,)-batched).

    Returns ``(any_found, ptype, pidx, t_best, mine)`` where ``ptype``/
    ``pidx`` are the winner's *local* ids on the winning device and -1
    elsewhere, and ``mine`` marks the winning device (lowest shard id on
    exact ties).
    """
    from ..ops.integrator_tiled import closest_hit_batched

    found, pt, pi, t = closest_hit_batched(bvh, ro, rd, time, t_min, t_max,
                                           stack_depth, active=active)
    t_eff = jnp.where(found, t, isect.INF)
    t_best = jax.lax.pmin(t_eff, axis)
    me = jax.lax.axis_index(axis)
    is_cand = found & (t_eff <= t_best)
    winner = jax.lax.pmin(jnp.where(is_cand, me, jnp.int32(1 << 30)), axis)
    mine = is_cand & (me == winner)
    any_found = t_best < isect.INF
    return (any_found, jnp.where(mine, pt, -1), jnp.where(mine, pi, -1),
            t_best, mine)


def _bcast(axis, owner, tree):
    """Broadcast the owning device's values to the whole axis (masked psum).

    ``owner`` may be scalar or (R,) per-lane; it broadcasts against each
    leaf's leading axis.
    """
    def one(x):
        own = owner.reshape(owner.shape + (1,) * (x.ndim - owner.ndim))
        if x.dtype == jnp.bool_:
            v = jnp.where(own, x.astype(jnp.int32), 0)
            return jax.lax.psum(v, axis).astype(jnp.bool_)
        return jax.lax.psum(jnp.where(own, x, jnp.zeros_like(x)), axis)
    return jax.tree.map(one, tree)


def _trace_rays_tp(scene, flags: SceneFlags, bvh, cam, cfg: RenderConfig,
                   path0: PathState, smp, pix, base_key, axis):
    """Tile-batched trace with the scene sharded over ``axis`` → (R, 3).

    Mirrors :func:`~.ops.integrator_tiled.trace_rays_tiled`: per bounce,
    every device walks its local BVH (batched, lock-step), the global
    closest hit is a ``pmin`` reduce, the winner shard shades through the
    tile-batched :func:`~.ops.shade_tiled.bounce_shade_t`, and the path
    state is ``psum``-broadcast.  Ray state stays replicated, so the scan
    trip count is identical on every device.
    """
    from ..ops import shade_tiled as st_mod

    R = path0.origin.shape[0]
    tabs = st_mod.make_tables(scene)
    me = jax.lax.axis_index(axis)
    t_min_v = jnp.full((R,), cfg.t_min)

    def step(s: PathState, _):
        found, pt, pi, t_hit, mine = _traverse_tp(
            bvh, s.origin, s.direction, s.time, t_min_v, cfg.t_max,
            cfg.stack_depth, axis, active=s.alive)

        if flags.has_medium:
            e_found, e_pt, e_pi, t_exit, e_mine = _traverse_tp(
                bvh, s.origin, s.direction, s.time, t_hit + 1e-4, cfg.t_max,
                cfg.stack_depth, axis, active=s.alive & found)
            sh = st_mod.grid_shape(R)
            e_med_local = st_mod.prim_medium_t(
                tabs, e_pt.reshape(sh), e_pi.reshape(sh)).reshape(R) >= 0
            exit_is_medium = _bcast(axis, e_mine, e_med_local) & e_found
        else:
            e_found = jnp.zeros((R,), bool)
            t_exit = jnp.zeros((R,))
            exit_is_medium = jnp.zeros((R,), bool)

        rngs = st_mod.wave_rng(base_key, smp, pix, s.iters, flags.has_sss,
                               cfg.sss_max_steps)
        shaded = st_mod.bounce_shade_t(scene, flags, cam, cfg, tabs, s,
                                       found, pt, pi, e_found, t_exit,
                                       exit_is_medium, rngs)
        # The winner owns the bounce; device 0 owns misses (background).
        owner = mine | ((me == 0) & ~found)
        nxt = _bcast(axis, owner, shaded)
        keep = s.alive
        frozen = jax.tree.map(
            lambda new, old: jnp.where(
                keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            nxt, s)
        return frozen, None

    out, _ = jax.lax.scan(step, path0, None, length=cfg.iters)
    return out.color


@partial(jax.jit, static_argnames=("flags", "cfg", "mesh", "spp", "axis"))
def render_tp(scene_tp, flags: SceneFlags, bvh_tp, cam, cfg: RenderConfig,
              base_key, mesh: Mesh, spp: int = 1, axis: str = "t"):
    """Render with the scene sharded by primitive over ``mesh`` → (H, W, 3).

    The output image is fully replicated (every device computes every pixel;
    the parallelism is across *scene data*, not pixels).  Compose with the
    DP pixel sharding of :mod:`.render_dist` on a 2-D mesh for both.
    """
    npix = cfg.width * cfg.height
    if mesh.shape[axis] != scene_tp.sph_c0.shape[0]:
        # Guard a silent wrong-image mode: shard_map over a smaller mesh
        # would hand each device SEVERAL shards and `x[0]` would drop all
        # but the first — rendering a fraction of the scene.
        raise ValueError(
            f"scene is sharded {scene_tp.sph_c0.shape[0]}-way but mesh axis "
            f"{axis!r} has {mesh.shape[axis]} devices; reshard with "
            f"shard_scene(scene, {mesh.shape[axis]})")

    def device_fn(scene_op, nodes, prims, root):
        scene_l = jax.tree.map(lambda x: x[0], scene_op)
        bvh_l = PackedBVH(nodes=nodes[0], prims=prims[0], root=root[0],
                          prim_mask=bvh_tp.prim_mask,
                          max_stack=bvh_tp.max_stack,
                          branching=bvh_tp.branching)

        pix = jnp.arange(npix, dtype=jnp.int32)

        def sample_body(smp_i, acc):
            smp = jnp.full((npix,), smp_i, jnp.int32)
            path0 = st_mod.spawn_paths(cam, cfg, base_key, smp, pix)
            return acc + _trace_rays_tp(scene_l, flags, bvh_l, cam, cfg,
                                        path0, smp, pix, base_key, axis)

        acc = jax.lax.fori_loop(0, spp, sample_body,
                                jnp.zeros((npix, 3), jnp.float32))
        return acc / spp

    specs = jax.tree.map(lambda _: P(axis), scene_tp)
    colors = _shard_map(device_fn, mesh,
                        (specs, P(axis), P(axis), P(axis)), P())(
        scene_tp, bvh_tp.nodes, bvh_tp.prims, bvh_tp.root)
    return colors.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("flags", "cfg", "mesh", "spp", "dp_axis",
                                   "tp_axis"))
def render_dp_tp(scene_tp, flags: SceneFlags, bvh_tp, cam,
                 cfg: RenderConfig, base_key, mesh: Mesh, spp: int = 1,
                 dp_axis: str = "d", tp_axis: str = "t"):
    """Composed DP×TP render over a 2-D mesh → (H, W, 3).

    Pixels shard over ``dp_axis`` (each row of the mesh owns a contiguous
    pixel block); the scene + BVH shard over ``tp_axis`` (each column owns a
    primitive subset).  A (d, t) device traces only its pixel block against
    its scene shard; per bounce the closest hit is ``pmin``-reduced and the
    winner's path state ``psum``-broadcast across ``tp_axis`` only — the DP
    axis needs zero collectives, exactly as in :mod:`.render_dist`.

    Cost model (the reason TP is opt-in): every device on a ``tp_axis`` of
    size T traces ALL of its pixel block's rays against 1/T of the scene —
    traversal work shrinks ~1/T per device but shading/control is
    duplicated T×, plus per bounce 2 ``pmin`` (4 B/ray each) and a ~100 B/ray
    PathState broadcast (×2 with volumes) over ICI.  TP pays only when the
    scene does not fit HBM; DP carries the scaling.
    """
    npix = cfg.width * cfg.height
    n_tp = mesh.shape[tp_axis]
    n_dp = mesh.shape[dp_axis]
    if n_tp != scene_tp.sph_c0.shape[0]:
        raise ValueError(
            f"scene is sharded {scene_tp.sph_c0.shape[0]}-way but mesh axis "
            f"{tp_axis!r} has {n_tp} devices; reshard with "
            f"shard_scene(scene, {n_tp})")
    per = -(-npix // n_dp)
    idxs = jnp.arange(per * n_dp, dtype=jnp.int32).reshape(n_dp, per)

    def device_fn(scene_op, nodes, prims, root, idx_block):
        scene_l = jax.tree.map(lambda x: x[0], scene_op)
        bvh_l = PackedBVH(nodes=nodes[0], prims=prims[0], root=root[0],
                          prim_mask=bvh_tp.prim_mask,
                          max_stack=bvh_tp.max_stack,
                          branching=bvh_tp.branching)
        local = idx_block[0]

        def sample_body(smp_i, acc):
            smp = jnp.full((local.shape[0],), smp_i, jnp.int32)
            path0 = st_mod.spawn_paths(cam, cfg, base_key, smp, local)
            return acc + _trace_rays_tp(scene_l, flags, bvh_l, cam, cfg,
                                        path0, smp, local, base_key, tp_axis)

        acc = jax.lax.fori_loop(0, spp, sample_body,
                                jnp.zeros((local.shape[0], 3), jnp.float32))
        return (acc / spp)[None]

    specs = jax.tree.map(lambda _: P(tp_axis), scene_tp)
    colors = _shard_map(
        device_fn, mesh,
        (specs, P(tp_axis), P(tp_axis), P(tp_axis), P(dp_axis, None)),
        P(dp_axis, None))(scene_tp, bvh_tp.nodes, bvh_tp.prims, bvh_tp.root,
                          idxs)
    return colors.reshape(-1, 3)[:npix].reshape(cfg.height, cfg.width, 3)
