"""Wavefront (breadth-first) engine: suspended traversal + path regeneration.

The TPU-native re-design of the reference's wavefront kernel suite
(``kernels.py:1219-1418``: generate_camera_rays → intersect_rays →
shade_miss → shade_and_scatter → swap buffers, with ``ti.atomic_add`` queue
appends and a host-side scalar readback per bounce, renderer.py:305-332).

Architecture (three ideas, all absent from the reference):

1. **Fixed-capacity slot pool with path regeneration.**  ``R`` path slots
   live in SoA arrays; when a path dies its radiance is scatter-added into
   the accumulation image and the slot immediately respawns the next
   (sample, pixel) primary ray — occupancy stays ~100% while the
   reference's wave shrinks as paths die.
2. **Suspended (bounded-step) traversal.**  Each wave advances every slot's
   BVH walk by at most ``steps_per_wave`` steps, carrying the traversal
   state (:class:`~.traverse.TravState`) across waves.  In lock-step SIMD a
   single straggler ray otherwise stalls the entire batch for hundreds of
   steps (measured: doubling the batch *quintupled* wall time on the
   1000-object scene); with suspension the straggler just takes more waves
   while every other lane keeps doing useful work — the TPU analogue of
   persistent-threads ray streaming.
3. **Compaction without atomics.**  Slot refill targets are ranked with a
   prefix-sum over the empty mask (replaces the reference's atomic
   ``next_ray_count`` append, kernels.py:1394) — deterministic and
   data-race-free by construction.  No host round-trips: the per-bounce
   ``active_ray_count`` readback (renderer.py:315) becomes the while-loop
   condition on-device.

Volume boundaries need a second traversal (exit finding, kernels.py:417);
slots run a tiny phase machine: MAIN traversal → (EXIT traversal if the hit
primitive carries a medium) → shade → next segment or retire.

ONE wave machine serves two drivers (:func:`_make_engine`):

* :func:`render_batch` — ``lax.while_loop``; the forward production engine.
* :func:`render_batch_diff` — the same machine under a fixed-trip
  ``lax.scan`` so reverse mode can transpose it: the **backward wavefront**.
  Traversal is stop-gradiented in and out (the visibility convention — a
  no-op for the forward path, and what keeps the walk state out of the
  transpose), each wave is ``jax.checkpoint``-ed, and drained waves
  short-circuit through ``lax.cond``.

RNG keys derive exactly as in the megakernel (fold base → sample → pixel →
bounce) and shading is :func:`~.shade_tiled.bounce_shade_t` — the
tile-batched mirror of the megakernel's :func:`~.integrator.bounce_shade`,
asserted lane-for-lane equal in tests/test_shade_tiled.py — so all engines
integrate the *same* sample set: images match to float accumulation order.
That equivalence is a unit test (tests/test_integrator.py,
tests/test_integrator_tiled.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import shade_tiled as st_mod
from .integrator import PathState
from .traverse import (_DONE, TravState, traversal_done,
                       traversal_init_batched, traversal_steps_batched)
from .types import RenderConfig

PH_MAIN = 0   # walking the main closest-hit query
PH_EXIT = 1   # walking the volume-exit query (medium scenes only)


class WaveState(NamedTuple):
    path: PathState          # (R, ...) batched path state
    trv: TravState           # (R, ...) suspended traversal state
    phase: jax.Array         # (R,) int32 PH_*
    hit_found: jax.Array     # (R,) bool — saved MAIN result during PH_EXIT
    hit_pt: jax.Array        # (R,) int32
    hit_pi: jax.Array        # (R,) int32
    hit_t: jax.Array         # (R,) f32
    pixel: jax.Array         # (R,) int32 flat pixel index
    sample: jax.Array        # (R,) int32 sample index
    last: jax.Array          # (R,) int32 last sample of the slot's window
                             #     (in-slot multi-sample accumulation)
    occupied: jax.Array      # (R,) bool — slot holds an unharvested path
    accum: jax.Array         # (H*W, 3) radiance sums
    spawned: jax.Array       # () int32 — work items issued ((pixel,
                             #     sample-window) units; = primary rays
                             #     when sample_stride == 1)
    done: jax.Array          # () int32 — paths finished
    rays: jax.Array          # () float32 — loop trips of finished paths
                             #     (TRUE traced-segment count, not the
                             #     reference's pix x depth upper bound).
                             #     float32, not int32: one render_batch call
                             #     can trace >2^31 segments (8M-pixel frame x
                             #     spp x depth) — int32 would wrap; float32 is
                             #     exact to 2^24 and ~1e-7 relative beyond.
    depth_sum: jax.Array     # () float32 — scatter depths of finished paths
    waves: jax.Array         # () int32 — total waves executed
    ctrls: jax.Array         # () int32 — waves that ran the control step
    occ_sum: jax.Array       # () float32 — Σ occupied slots over waves (mean
                             #     occupancy = occ_sum / (waves · R) — the
                             #     steps_per_wave / ctrl_den tuning signal)
    trav_steps: jax.Array    # () float32 — walking-lane traversal steps
                             #     (chunk-granular; /rays ≈ steps/segment,
                             #     incl. volume-exit queries)
    exec_steps: jax.Array    # () int32 — traversal steps the wave loops
                             #     actually executed (× R = paid lane-steps;
                             #     gap to trav_steps = intra-wave idle)
    depth_hist: jax.Array    # (max_depth+1,) int32 — finished paths by
                             #     scatter depth (base_renderer.py:102-119)
    walk_steps: jax.Array    # () float32 — SSS volumetric walking-lane
                             #     steps executed (real work, but not
                             #     traced segments — own channel so the
                             #     SSS ladder row is honest)


def tile_spawn_order(width: int, height: int, tile: int = 16):
    """(width·height,) int32 spawn-order permutation: consecutive spawn ids
    fill one ``tile``×``tile`` pixel block before moving to the next, so a
    batch of slots respawned together traces a compact 2-D neighbourhood of
    rays rather than a scanline run (the spawn-coherence lever; pass as
    ``render_batch(..., spawn_order=...)``).  Host-side, build-once."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    ys, xs = ys.ravel(), xs.ravel()
    order = np.lexsort((xs % tile, ys % tile, xs // tile, ys // tile))
    return jnp.asarray((ys[order] * width + xs[order]).astype(np.int32))


def _mask_tree(mask, new, old):
    sel = lambda n, o: jnp.where(  # noqa: E731
        mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
    return jax.tree.map(sel, new, old)


def _make_engine(scene, flags, bvh, cam, cfg: RenderConfig, accum,
                 start_sample, n_samples: int, base_key, queue_size: int,
                 steps_per_wave: int, ctrl_den: int, pix_offset, n_pix,
                 spawn_order=None, sample_stride=None):
    """Build the wave machine shared by both engines.

    Returns ``(initial WaveState, wave fn, live fn, R, npix, total)``.
    Traversal calls are stop-gradiented on the way in and out — a no-op for
    the (never-differentiated) forward while-loop, and exactly the
    zero-tangent visibility convention the differentiable scan requires.
    """
    npix = n_pix if n_pix is not None else cfg.width * cfg.height
    total = n_samples * npix
    R = min(queue_size, total)
    # In-slot multi-sample accumulation (r5): a slot owns a (pixel,
    # sample-window) work item and traces its ``stride`` samples
    # back-to-back, carrying the radiance sum in-slot — the accumulator
    # scatter-add (the r5 profile's single largest op, ~40 ns per update
    # row, paths × ~1.25 padding rows) then fires once per WINDOW instead
    # of once per path.  The integrated (sample, pixel) set is identical
    # (same RNG folds); only per-pixel float accumulation order changes.
    #
    # Gated on ≥ ~8 pool generations of PIXELS: serializing samples per
    # slot shrinks the work-item count, and when npix/R is small the drain
    # tail's occupancy collapses (measured: config-4 −25%, the 51k-tri
    # knot −62% at full stride with npix/R ≈ 2.7; intermediate strides
    # still −4%; the flagship at npix/R ≈ 11 gains +1.4%).
    if sample_stride is not None:
        stride = max(1, min(n_samples, sample_stride))
    else:
        # Default 4 on big frames (r5 flagship sweep: stride 1/2/3/4/6/9 →
        # 114.0/106.5/105.8/103.5/104.4/107.3 ms); small frames keep
        # per-path spawning.  Scene-dependent optima in between (config-4
        # prefers 2, the knot 1) belong to Renderer.autotune.
        stride = min(n_samples, 4) if npix >= 8 * R else 1
    n_windows = -(-n_samples // stride)
    multi = stride > 1
    items_total = npix * n_windows if multi else total
    # Row-gather tables (loop-invariant; XLA hoists the concats out of the
    # wave loop).  All shading runs tile-batched through ops/shade_tiled.
    tabs = st_mod.make_tables(scene)
    gshape = st_mod.grid_shape(R)
    grid = lambda x: jnp.asarray(x).reshape(gshape)  # noqa: E731
    sg = jax.lax.stop_gradient

    def fresh_trv(path: PathState, t_min):
        """Batched: start traversals for all R slots ((R,) leaves)."""
        return sg(traversal_init_batched(
            sg(bvh), sg(path.origin), sg(path.direction), sg(path.time),
            sg(t_min), cfg.t_max, cfg.stack_depth))

    # Dead initial pool.
    init_path = PathState(
        origin=jnp.zeros((R, 3)),
        direction=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3)),
        time=jnp.zeros((R,)), color=jnp.zeros((R, 3)),
        throughput=jnp.ones((R, 3)), depth=jnp.zeros((R,), jnp.int32),
        iters=jnp.zeros((R,), jnp.int32), alive=jnp.zeros((R,), bool))
    init_trv = fresh_trv(init_path, cfg.t_min)
    # Empty slots start with a finished traversal (nothing to walk).
    init_trv = init_trv._replace(cur=jnp.full((R,), _DONE, jnp.int32))
    zi = jnp.zeros((R,), jnp.int32)
    st = WaveState(
        path=init_path, trv=init_trv, phase=zi,
        hit_found=jnp.zeros((R,), bool), hit_pt=zi - 1, hit_pi=zi - 1,
        hit_t=jnp.zeros((R,)), pixel=zi, sample=zi, last=zi,
        occupied=jnp.zeros((R,), bool),
        accum=accum.reshape(npix, 3),
        spawned=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.int32),
        rays=jnp.zeros((), jnp.float32),
        depth_sum=jnp.zeros((), jnp.float32),
        waves=jnp.zeros((), jnp.int32),
        ctrls=jnp.zeros((), jnp.int32),
        occ_sum=jnp.zeros((), jnp.float32),
        trav_steps=jnp.zeros((), jnp.float32),
        exec_steps=jnp.zeros((), jnp.int32),
        depth_hist=jnp.zeros((cfg.max_depth + 1,), jnp.int32),
        walk_steps=jnp.zeros((), jnp.float32),
    )

    def spawn(s: WaveState, resample=None) -> WaveState:
        """Refill empty slots with the next primary rays (prefix-sum rank);
        ``resample`` lanes start their pixel's NEXT sample in place,
        carrying the slot's accumulated radiance (multi-sample mode)."""
        empty = ~s.occupied
        rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
        new_id = s.spawned + rank
        can = empty & (new_id < items_total)

        if multi:
            # Work item = (pixel, sample window): window ``g`` covers
            # samples [start + g*stride, start + min((g+1)*stride, n)).
            g = new_id // npix
            s_idx = start_sample + g * stride
            new_last = start_sample + jnp.minimum((g + 1) * stride,
                                                  n_samples) - 1
            pix = new_id % npix
        else:
            s_idx = start_sample + new_id // npix
            new_last = s_idx
            pix = new_id % npix            # local (accum) index
        if spawn_order is not None:
            # Spawn-coherence permutation: consecutive spawn ids land in a
            # compact 2-D tile instead of a scanline run, so lock-step
            # lanes trace similar rays and finish in similar step counts
            # (tightens the per-wave straggler tail the adaptive exit pays
            # for).  One (R,)-row gather per spawn, ctrl-step only.
            pix = spawn_order[pix]
        if resample is None:
            resample = jnp.zeros((R,), bool)
        renew = can | resample
        smp = jnp.where(can, s_idx, jnp.where(resample, s.sample + 1,
                                              s.sample))
        pix = jnp.where(can, pix, s.pixel)
        pix_g = pix_offset + pix       # global pixel id: camera + RNG
        fresh_path = st_mod.spawn_paths(cam, cfg, base_key, smp, pix_g)
        # Resampling lanes carry their pixel's radiance sum forward.
        fresh_path = fresh_path._replace(
            color=jnp.where(resample[:, None], s.path.color,
                            fresh_path.color))
        return s._replace(
            path=_mask_tree(renew, fresh_path, s.path),
            trv=_mask_tree(renew, fresh_trv(fresh_path, cfg.t_min), s.trv),
            phase=jnp.where(renew, PH_MAIN, s.phase),
            pixel=pix,
            sample=smp,
            last=jnp.where(can, new_last, s.last),
            occupied=s.occupied | can,
            spawned=s.spawned + jnp.minimum(
                jnp.sum(empty.astype(jnp.int32)),
                jnp.maximum(items_total - s.spawned, 0)))

    def control(s: WaveState) -> WaveState:
        """Phase transitions + shading + retire + respawn (the expensive,
        occasional part of a wave).  Entirely tile-batched: zero per-lane
        vmap (round 1 measured ~350 ns/lane for the vmapped form)."""
        trv = s.trv
        done = traversal_done(trv) & s.occupied

        if flags.has_medium:
            # MAIN finished: *entering* hits on a medium boundary start the
            # EXIT query (chord end = next surface).  Exiting hits (origin
            # inside the medium) need no exit query — their chord is
            # [ray start, hit] (see bounce_shade).
            main_done = done & (s.phase == PH_MAIN)
            m_found = trv.best_pt >= 0
            o3 = jnp.moveaxis(sg(s.path.origin), -1, 0)
            d3 = jnp.moveaxis(sg(s.path.direction), -1, 0)
            medium_g, front_g = st_mod.prim_medium_front_t(
                tabs, grid(trv.best_pt), grid(trv.best_pi),
                grid(o3[0]), grid(o3[1]), grid(o3[2]),
                grid(d3[0]), grid(d3[1]), grid(d3[2]),
                grid(sg(s.path.time)), grid(trv.best_t))
            medium = medium_g.reshape(R)
            front = front_g.reshape(R)
            need_exit = main_done & m_found & (medium >= 0) & front

            exit_trv = fresh_trv(s.path, trv.best_t + 1e-4)

            hit_found = jnp.where(main_done, m_found, s.hit_found)
            hit_pt = jnp.where(main_done, trv.best_pt, s.hit_pt)
            hit_pi = jnp.where(main_done, trv.best_pi, s.hit_pi)
            hit_t = jnp.where(main_done, trv.best_t, s.hit_t)

            exit_done = done & (s.phase == PH_EXIT)
            ready = (main_done & ~need_exit) | exit_done
            exit_found = exit_done & (trv.best_pt >= 0)
            t_exit = trv.best_t
            # Same (best_pt, best_pi) rows as `medium` above — reuse the
            # gather (during PH_EXIT the walk's best prim IS the exit hit).
            exit_is_medium = exit_done & (medium >= 0)

            phase = jnp.where(need_exit, PH_EXIT, s.phase)
            trv = _mask_tree(need_exit, exit_trv, trv)
            found, r_pt, r_pi = hit_found, hit_pt, hit_pi
        else:
            ready = done
            found = trv.best_pt >= 0
            r_pt, r_pi = trv.best_pt, trv.best_pi
            hit_found, hit_pt, hit_pi, hit_t = (s.hit_found, s.hit_pt,
                                                s.hit_pi, s.hit_t)
            exit_found = jnp.zeros((R,), bool)
            t_exit = jnp.zeros((R,))
            exit_is_medium = jnp.zeros((R,), bool)
            phase = s.phase

        # --- shade slots whose queries completed this wave (tile-batched;
        # only the RNG draws run under a vmap, see shade_tiled.wave_rng) ---
        rngs = st_mod.wave_rng(base_key, s.sample, pix_offset + s.pixel,
                               s.path.iters, flags.has_sss,
                               cfg.sss_max_steps)
        shaded, sh_aux = st_mod.bounce_shade_t(
            scene, flags, cam, cfg, tabs, s.path, found, r_pt, r_pi,
            exit_found, t_exit, exit_is_medium, rngs, live=ready, aux=True)
        path = _mask_tree(ready, shaded, s.path)

        # Continuing paths start the next segment's MAIN traversal.
        cont = ready & path.alive & (path.iters < cfg.iters)
        trv = _mask_tree(cont, fresh_trv(path, cfg.t_min), trv)
        phase = jnp.where(cont, PH_MAIN, phase)

        # Retire finished paths: harvest radiance, free the slot.  The
        # scatter-add into the (npix, 3) frame costs ~40 ns/lane (r3
        # profile: 0.66 ms/ctrl at R=16384 — the single most expensive op
        # in the control step), so retires are first compacted to half the
        # pool with one cheap position scatter; a full-width fallback
        # covers the rare wave where more than R/2 paths finish at once.
        # In multi-sample mode a finished path whose pixel still has
        # samples left RESAMPLES in place (color carried, no scatter) —
        # only the pixel's LAST path retires.
        finished = ready & ~cont
        if multi:
            resample = finished & (s.sample < s.last)
            retire_m = finished & ~resample
        else:
            resample = None
            retire_m = finished
        fin_i32 = retire_m.astype(jnp.int32)
        n_fin = jnp.sum(fin_i32)
        rank_fin = jnp.cumsum(fin_i32) - 1

        # [color, pixel] packed per lane so the compaction is ONE direct
        # row scatter — the previous position-scatter + two pack gathers
        # paid the same per-update-row scatter cost PLUS the gathers
        # (r4 profile: ~60 µs/ctrl).  pixel rides as f32: exact below 2^24,
        # and a per-device pixel block is far smaller than that.
        hc = jnp.concatenate(
            [path.color, s.pixel.astype(jnp.float32)[:, None]], axis=1)

        def compact_add(rbudget):
            def go(acc):
                r_slot = jnp.where(retire_m, rank_fin, rbudget)
                upd = jnp.zeros((rbudget, 4), jnp.float32).at[r_slot].set(
                    hc, mode="drop")
                in_use = jnp.arange(rbudget, dtype=jnp.int32) < n_fin
                pix_c = jnp.where(in_use, upd[:, 3].astype(jnp.int32), npix)
                return acc.at[pix_c].add(
                    jnp.where(in_use[:, None], upd[:, :3], 0.0),
                    mode="drop")
            return go

        def full_add(acc):
            return acc.at[s.pixel].add(
                jnp.where(retire_m[:, None], path.color, 0.0), mode="drop")

        # The scatter-add pays per ROW of its width, dropped rows included,
        # so pick the tightest rung per wave (r4 profile: at the coarse
        # {R/4, R/2} ladder the padding was ~50% of all scatter rows; each
        # added rung costs only a lax.cond branch at compile time).  The
        # R/32 and R/16 rungs exist for multi-sample mode, where retires
        # per control drop ~n_samples× (r5 profile: every control sat in
        # the 4096 rung at ~780 real retires).
        widths = sorted({max(R // 32, 128), max(R // 16, 128),
                         max(R // 8, 128), max(R // 6, 128),
                         max(R // 4, 128), max(R // 3, 128),
                         max(R // 2, 128)})

        def chain(i):
            if i == len(widths):
                return full_add
            w = widths[i]
            return lambda acc: jax.lax.cond(n_fin <= w, compact_add(w),
                                            chain(i + 1), acc)

        # npix is static, so the f32-pixel-id bound is enforced at trace
        # time: a per-device block >= 2^24 pixels (e.g. one device holding a
        # whole 8K frame) would round ids in hc[:, 3] and add radiance to
        # the wrong pixels — fall back to the int32 position scatter.
        accum2 = chain(0)(s.accum) if npix < 2 ** 24 else full_add(s.accum)

        fin_i = finished.astype(jnp.int32)
        # Histogram via one-hot reduce: an 11-bin scatter-add over 16k lanes
        # measured 0.14 ms/ctrl (TPU scatters serialize); the (R, bins)
        # compare+sum is ~50 µs of VPU work.
        bins = jnp.arange(cfg.max_depth + 1, dtype=jnp.int32)
        clip_d = jnp.clip(path.depth, 0, cfg.max_depth)
        hist_add = jnp.sum(
            jnp.where((clip_d[:, None] == bins[None, :]) & finished[:, None],
                      1, 0), axis=0, dtype=jnp.int32)
        s = s._replace(
            path=path, trv=trv, phase=phase, hit_found=hit_found,
            hit_pt=hit_pt, hit_pi=hit_pi, hit_t=hit_t,
            occupied=s.occupied & ~retire_m, accum=accum2,
            done=s.done + jnp.sum(fin_i),
            rays=s.rays + jnp.sum(fin_i * path.iters).astype(jnp.float32),
            depth_sum=s.depth_sum
            + jnp.sum(fin_i * path.depth).astype(jnp.float32),
            depth_hist=s.depth_hist + hist_add,
            walk_steps=s.walk_steps + sh_aux["walk_steps"])
        return spawn(s, resample)

    def wave(s: WaveState) -> WaveState:
        # --- always: advance all suspended traversals ---
        # Batched (component-major) form: the per-lane vmap form pays a
        # strided cross-lane extract per row component (~8x slower measured).
        t_min_q = jnp.where(s.phase == PH_EXIT, s.hit_t + 1e-4, cfg.t_min)
        trv, ls, es = traversal_steps_batched(
            sg(bvh), sg(s.trv), sg(s.path.origin), sg(s.path.direction),
            sg(s.path.time), sg(t_min_q), steps_per_wave, adaptive=True,
            count_steps=True)
        # Name the walk outputs so the differentiable driver can save them
        # as checkpoint residuals: the backward replay then SKIPS the BVH
        # walk (dead code once its outputs are restored) instead of
        # re-walking — the walk is stop-gradiented, pure primal work.
        # No-op for the forward while-loop driver (names without a policy).
        from jax.ad_checkpoint import checkpoint_name
        trv = jax.tree.map(lambda x: checkpoint_name(x, "trav"), trv)
        s = s._replace(trv=sg(trv), trav_steps=s.trav_steps + sg(ls),
                       exec_steps=s.exec_steps + sg(es))

        # --- occasionally: control (spawn / phase / shade / retire) ---
        # Control work costs as much as many traversal steps, so it only
        # runs when enough slots would benefit — or when nothing can make
        # progress without it.  lax.cond with a scalar predicate skips it
        # entirely on pure-traversal waves.
        done = traversal_done(trv) & s.occupied
        n_ready = jnp.sum(done.astype(jnp.int32))
        n_empty = jnp.sum((~s.occupied).astype(jnp.int32))
        can_spawn = (s.spawned < items_total) & (n_empty > 0)
        stuck = ~jnp.any(s.occupied & ~done)
        do_ctrl = ((n_ready + jnp.where(can_spawn, n_empty, 0)) * ctrl_den
                   >= R) | stuck
        s = s._replace(waves=s.waves + 1,
                       ctrls=s.ctrls + do_ctrl.astype(jnp.int32),
                       occ_sum=s.occ_sum
                       + jnp.sum(s.occupied.astype(jnp.float32)))
        return jax.lax.cond(do_ctrl, control, lambda x: x, s)

    def live(s: WaveState):
        return (s.spawned < items_total) | jnp.any(s.occupied)

    return st, wave, live, R, npix, total


def _stats(out: WaveState, R: int, total: int) -> dict:
    return {"paths": out.done, "rays": out.rays,
            "depth_sum": out.depth_sum, "waves": out.waves,
            "ctrls": out.ctrls, "occ_sum": out.occ_sum,
            "trav_steps": out.trav_steps,
            "exec_steps": out.exec_steps,
            "walk_steps": out.walk_steps,
            "depth_hist": out.depth_hist, "slots": R,
            "spawned": out.spawned,
            "total": jnp.asarray(total, jnp.int32)}


@partial(jax.jit, static_argnames=("flags", "cfg", "n_samples", "queue_size",
                                   "steps_per_wave", "with_stats",
                                   "ctrl_den", "n_pix", "sample_stride"))
def render_batch(scene, flags, bvh, cam, cfg: RenderConfig, accum,
                 start_sample, n_samples: int, base_key,
                 queue_size: int = 4096, steps_per_wave: int = 12,
                 with_stats: bool = False, ctrl_den: int = 8,
                 pix_offset=0, n_pix: int | None = None, spawn_order=None,
                 sample_stride: int | None = None):
    """Accumulate ``n_samples`` samples into ``accum`` (H, W, 3) sums.

    With ``with_stats`` returns ``(accum, stats)`` where stats carries
    measured counters: paths finished, true traced segments (``rays``),
    per-depth path histogram and occupancy — the honest Mrays/s source (the
    reference prints pixels x max_depth, an upper bound: renderer.py:536).

    ``pix_offset``/``n_pix`` select a contiguous sub-range of the flattened
    frame (the data-parallel tile: each device runs its own slot pool over
    its block).  RNG keys fold the *global* pixel id, so a sharded render
    integrates exactly the sample set of the single-device one.  When
    ``n_pix`` is set, ``accum`` is the (n_pix, 3) local block and the
    return is the same flat block instead of (H, W, 3).
    """
    st, wave, live, R, npix, total = _make_engine(
        scene, flags, bvh, cam, cfg, accum, start_sample, n_samples,
        base_key, queue_size, steps_per_wave, ctrl_den, pix_offset, n_pix,
        spawn_order, sample_stride)
    out = jax.lax.while_loop(live, wave, st)
    image = (out.accum if n_pix is not None
             else out.accum.reshape(cfg.height, cfg.width, 3))
    if with_stats:
        return image, _stats(out, R, total)
    return image


@partial(jax.jit, static_argnames=("flags", "cfg", "n_samples", "queue_size",
                                   "steps_per_wave", "n_waves", "ctrl_den",
                                   "n_pix", "ckpt_every", "save_trav"))
def render_batch_diff(scene, flags, bvh, cam, cfg: RenderConfig, accum,
                      start_sample, n_samples: int, base_key,
                      queue_size: int = 4096, steps_per_wave: int = 12,
                      n_waves: int = 256, ctrl_den: int = 8, pix_offset=0,
                      n_pix: int | None = None, ckpt_every: int = 1,
                      save_trav: bool = True):
    """Differentiable wavefront: :func:`render_batch` under a fixed-trip scan.

    The backward wavefront the north star asks for — literally the same wave
    machine (:func:`_make_engine`), driven by a ``lax.scan`` over ``n_waves``
    trips so reverse mode can transpose it:

    * Traversal (the dominant primal work) is stop-gradiented on the way in
      and out: the walk contributes no tangents (visibility convention), so
      its state never enters the transpose and the scan saves none of it.
    * Each wave is ``jax.checkpoint``-ed: the backward pass replays the
      wave's forward (cheap relative to storing ~100 floats/lane/wave of
      shading residuals for every wave).
    * A wave whose work is finished short-circuits through ``lax.cond``, so
      over-provisioned ``n_waves`` costs almost nothing — callers size it
      from a stats forward run (``parallel.render_dist.calibrate_n_waves``)
      and check the returned ``paths`` counter equals ``total``.

    Returns ``(image, stats)`` — the :func:`render_batch` stats dict, whose
    ``paths``/``total`` pair certifies complete integration.  Gradients
    match the megakernel-scan engine (same keys, same shading; tested).
    """
    st, wave, live, R, npix, total = _make_engine(
        scene, flags, bvh, cam, cfg, accum, start_sample, n_samples,
        base_key, queue_size, steps_per_wave, ctrl_den, pix_offset, n_pix)

    # ``ckpt_every`` waves share one checkpoint block: the transpose then
    # stores residuals only at block boundaries and replays each block once
    # — fewer boundaries = less carried state + cross-wave fusion inside a
    # block, at k× residual memory during the block's transpose (A/B'd
    # on-chip, see docs/PERFORMANCE.md "backward wavefront diet"; k=1 won).
    #
    # ``save_trav``: additionally save each wave's traversal OUTPUTS as
    # checkpoint residuals (jax.checkpoint_policies.save_only_these_names)
    # so the backward replay restores the hit records instead of re-walking
    # the BVH — the walk is stop-gradiented pure primal work, the dominant
    # replay cost.  Memory: one TravState per wave per lane.
    policy = (jax.checkpoint_policies.save_only_these_names("trav")
              if save_trav else None)

    @partial(jax.checkpoint, policy=policy)
    def step(s, _):
        for _k in range(ckpt_every):
            s = jax.lax.cond(live(s), wave, lambda x: x, s)
        return s, None

    n_blocks = -(-n_waves // ckpt_every)
    out, _ = jax.lax.scan(step, st, None, length=n_blocks)
    image = (out.accum if n_pix is not None
             else out.accum.reshape(cfg.height, cfg.width, 3))
    return image, _stats(out, R, total)
