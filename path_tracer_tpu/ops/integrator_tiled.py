"""Tile-batched differentiable integrator — the fast gradient engine.

Round 1's training path differentiated the per-lane megakernel
(``integrator.trace_ray_scan`` under vmap), which pays a cross-lane relayout
per gathered component — the slowest engine in the codebase (~10× the tiled
layout, docs/PERFORMANCE.md).  This module is the gradient-capable engine at
wavefront-layout speed:

* The bounce loop is a fixed-trip ``lax.scan`` (reverse-differentiable)
  whose body is the *tile-batched* shading (:func:`~.shade_tiled
  .bounce_shade_t` — component-major, packed gather tables) plus the
  lock-step batched traversal (:func:`~.traverse.traversal_steps_batched`).
* Traversal is wrapped in ``stop_gradient`` on every input and output: the
  discrete visibility query contributes no tangents (the differentiable-
  rendering convention, same as ``traverse.traverse_bvh``'s zero-grad
  custom_vjp), so reverse mode never has to transpose the traversal
  while-loop, and the scan saves only the tiny (hit, id, t) outputs as
  residuals — not the walk state.
* RNG keys fold exactly as the per-lane megakernel's
  (base → sample → pixel → iters), so colors — and therefore gradients of
  the same loss — match ``trace_ray_scan``'s lane for lane (unit-tested).

The backward pass is the scan's transpose over ``bounce_shade_t``: fully
tile-batched, psum-friendly (see ``parallel.render_dist.make_train_step``),
with the traversal replayed only as primal work.  This is the "backward
wavefront" the north star asks for, in the form that makes TPU sense: the
wavefront's compaction/regeneration machinery exists to keep *forward*
occupancy high under RR attrition; a gradient pass needs fixed shapes for
the transpose, so it keeps the tiled layout and drops the regeneration.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import camera as cam_ops
from . import shade_tiled as st_mod
from .integrator import PathState, _init_state
from .traverse import (_DONE, INNER_STEPS, traversal_init_batched,
                       traversal_steps_batched)
from .types import CameraArrays, PackedBVH, RenderConfig, SceneArrays


def closest_hit_batched(bvh: PackedBVH, ro, rd, time, t_min, t_max,
                        stack_depth: int, active=None):
    """Batched closest-hit query → ``(hit, prim_type, prim_idx, t)``, all
    (R,).  Zero-gradient by construction: every input is stop-gradiented so
    the traversal while-loop lives purely in the primal program (reverse
    mode neither transposes it nor saves its state).

    ``active`` masks lanes out of the walk entirely (their result is a
    miss).  The scan driver passes the liveness mask: without it a dead
    lane restarts from the root every remaining trip and, walking garbage
    rays, often becomes the straggler that stalls the whole lock-step
    batch (measured 1.8× on the forward pass).
    """
    bvh, ro, rd, time, t_min = jax.lax.stop_gradient(
        (bvh, ro, rd, time, t_min))
    st = traversal_init_batched(bvh, ro, rd, time, t_min, t_max, stack_depth)
    if active is not None:
        st = st._replace(cur=jnp.where(active, st.cur, _DONE))

    def cond(s):
        return jnp.any(s.cur != _DONE)

    def body(s):
        return traversal_steps_batched(bvh, s, ro, rd, time, t_min,
                                       INNER_STEPS)

    out = jax.lax.while_loop(cond, body, st)
    found = out.best_pt >= 0
    if active is not None:
        found = found & active
    return jax.lax.stop_gradient(
        (found, out.best_pt, out.best_pi, out.best_t))


def trace_rays_tiled(scene: SceneArrays, flags, bvh: PackedBVH,
                     cam: CameraArrays, cfg: RenderConfig, tabs,
                     path0: PathState, smp, pix, base_key):
    """Trace an (R,)-batched :class:`PathState` to completion → (R, 3).

    Differentiable w.r.t. scene/camera tensors.  Same keys ⇒ colors equal
    ``vmap(trace_ray_scan)`` lane for lane (tests/test_integrator_tiled.py).
    """
    R = path0.origin.shape[0]
    t_min_v = jnp.full((R,), cfg.t_min)

    def step(s: PathState, _):
        found, ptype, pidx, t_hit = closest_hit_batched(
            bvh, s.origin, s.direction, s.time, t_min_v, cfg.t_max,
            cfg.stack_depth, active=s.alive)
        if flags.has_medium:
            exit_found, e_pt, e_pi, t_exit = closest_hit_batched(
                bvh, s.origin, s.direction, s.time, t_hit + 1e-4, cfg.t_max,
                cfg.stack_depth, active=s.alive & found)
            sh = st_mod.grid_shape(R)
            e_med = st_mod.prim_medium_t(tabs, e_pt.reshape(sh),
                                         e_pi.reshape(sh)).reshape(R)
            exit_is_medium = e_med >= 0
        else:
            exit_found = jnp.zeros((R,), bool)
            t_exit = jnp.zeros((R,))
            exit_is_medium = jnp.zeros((R,), bool)

        rngs = st_mod.wave_rng(base_key, smp, pix, s.iters, flags.has_sss,
                               cfg.sss_max_steps)
        nxt = st_mod.bounce_shade_t(scene, flags, cam, cfg, tabs, s, found,
                                    ptype, pidx, exit_found, t_exit,
                                    exit_is_medium, rngs)
        keep = s.alive
        frozen = jax.tree.map(
            lambda new, old: jnp.where(
                keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            nxt, s)
        return frozen, None

    out, _ = jax.lax.scan(step, path0, None, length=cfg.iters)
    return out.color


def render_sample_tiled(scene, flags, bvh, cam, cfg: RenderConfig,
                        sample_idx, base_key, pix_idx=None,
                        chunk_size: int = 16384):
    """One sample for every pixel (or for ``pix_idx`` lanes) → radiance.

    The tiled counterpart of :func:`~.integrator.render_sample`: camera rays
    are generated component-major (:func:`~.shade_tiled.get_rays_t`) and
    traced in fixed-size chunks so the lock-step traversal drains per chunk.
    Returns (H, W, 3) for the full frame, or (len(pix_idx), 3) when an
    explicit pixel-index vector is given (the data-parallel shard case).
    """
    W, H = cfg.width, cfg.height
    tabs = st_mod.make_tables(scene)
    full_frame = pix_idx is None
    if full_frame:
        pix_idx = jnp.arange(W * H, dtype=jnp.int32)
    n = pix_idx.shape[0]

    def one_chunk(pix):
        R = pix.shape[0]
        smp = jnp.full((R,), sample_idx, jnp.int32)
        path0 = st_mod.spawn_paths(cam, cfg, base_key, smp, pix)
        return trace_rays_tiled(scene, flags, bvh, cam, cfg, tabs, path0,
                                smp, pix, base_key)

    chunk = min(chunk_size, max(n, 1))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    idxs = jnp.concatenate(
        [pix_idx, jnp.zeros((n_pad - n,), jnp.int32)]).reshape(-1, chunk)
    colors = jax.lax.map(one_chunk, idxs).reshape(n_pad, 3)[:n]
    if full_frame:
        return colors.reshape(H, W, 3)
    return colors


@partial(jax.jit, static_argnames=("flags", "cfg", "spp"))
def render_tiled(scene, flags, bvh, cam, cfg: RenderConfig, base_key,
                 spp: int | None = None):
    """Accumulate ``spp`` samples → (H, W, 3) mean radiance (differentiable;
    the drop-in fast replacement for ``integrator.render(differentiable=
    True)``)."""
    spp = spp if spp is not None else cfg.samples_per_pixel

    def body(s, acc):
        return acc + render_sample_tiled(scene, flags, bvh, cam, cfg, s,
                                         base_key)

    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32))
    return acc / spp
