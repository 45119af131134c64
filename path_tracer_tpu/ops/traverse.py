"""Stack-based BVH traversal (the hot loop) + brute-force oracle.

TPU-native re-design of the reference's Taichi traversal
(``kernels.py:624-742`` ``traverse_bvh_legacy``): per-ray traversal with a
fixed-depth stack, precomputed inverse direction, front-to-back child
ordering, and early termination by shrinking ``closest_t``.  Key differences
from both the reference and a naive port:

* **Wide nodes, one gather per step.**  The :class:`PackedBVH` layout stores
  both children's AABBs and pointers in one 16-float row, so each loop trip
  issues a single row gather instead of ~10 scalar-array gathers (the
  dominant cost of lock-step traversal on the VPU).
* **Leaf-inline intersection.**  Leaf children are intersected the moment
  they are discovered (one 12-float prim-row gather + ~100 flops); only
  interior pointers ever enter the stack, halving both stack traffic and
  loop trips versus the pop-then-test reference scheme.
* **Register current-pointer.**  The nearer surviving child continues in a
  register; the stack is touched only when both children survive (push far)
  or the subtree is exhausted (pop) — the classic GPU traversal refinement.
* Under ``vmap`` the loop runs lock-step across the ray batch until every
  lane's stack drains (the TPU analogue of a SIMT warp).
* The traversal returns only the discrete result ``(hit, prim_type,
  prim_idx, t)`` and is wrapped in a zero-gradient ``custom_vjp``; shading
  recomputes the hit record differentiably from the primitive id
  (:func:`refine_hit`) — this is what makes the integrator reverse-mode
  differentiable despite the data-dependent while-loop.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import intersect as isect
from .types import (BVH_EMPTY_SLOT, PRIM_QUAD, PRIM_ROW, PRIM_SPHERE,
                    PRIM_TRIANGLE, PackedBVH, SceneArrays, bvh_layout)

INF = isect.INF
# Optimal compare-swap networks for front-to-back child ordering, keyed by
# node arity (PackedBVH.branching): 5 comparators for 4, 19 for 8 (Batcher).
_SORT_NET = {
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (3, 7),
        (1, 5), (2, 6), (1, 4), (3, 6),
        (2, 4), (3, 5), (3, 4)),
}
# Sentinel pointer; leaf ptrs only reach -(2^24).  Kept a plain Python int:
# a module-level jnp constant would initialise the device backend at import
# time, breaking backend selection (e.g. --cpu) for every downstream user.
_DONE = -(2 ** 30)


class Hit(NamedTuple):
    """Differentiable hit record (hittable.py:7-31 ``hit_record``)."""

    hit: jax.Array          # bool
    t: jax.Array
    p: jax.Array            # (3,)
    normal: jax.Array       # (3,) shading normal (flipped toward the ray)
    front_face: jax.Array   # bool
    u: jax.Array
    v: jax.Array
    mat: jax.Array          # int32 material index
    medium: jax.Array       # int32 constant-medium index or -1
    prim_type: jax.Array    # int32
    prim_idx: jax.Array     # int32


def intersect_prim(scene: SceneArrays, ptype, pidx, ro, rd, time, t_min, t_max):
    """Full-record intersection of one primitive identified by (type, index).

    Computes all three primitive types on every lane and selects by type —
    the masked-lanes equivalent of the reference's ``if prim_type == ...``
    dispatch (kernels.py:672-717).  Used by shading (refine_hit) and the
    brute-force oracle; the traversal hot path uses the packed-row variant
    :func:`intersect.hit_prim_row` instead.
    Returns (hit, t, p, n_out, u, v).
    """
    si = jnp.clip(pidx, 0, scene.sph_rad.shape[0] - 1)
    qi = jnp.clip(pidx, 0, scene.qd_d.shape[0] - 1)
    ti = jnp.clip(pidx, 0, scene.tr_mat.shape[0] - 1)

    hs = isect.hit_sphere(scene.sph_c0[si], scene.sph_c1[si], scene.sph_rad[si],
                          ro, rd, time, t_min, t_max)
    hq = isect.hit_quad(scene.qd_q[qi], scene.qd_u[qi], scene.qd_v[qi],
                        scene.qd_n[qi], scene.qd_w[qi], scene.qd_d[qi],
                        ro, rd, t_min, t_max)
    ht = isect.hit_triangle(scene.tr_v0[ti], scene.tr_e1[ti], scene.tr_e2[ti],
                            scene.tr_n[ti], ro, rd, t_min, t_max)

    is_s = ptype == PRIM_SPHERE
    is_q = ptype == PRIM_QUAD

    def sel(a, b, c):
        return jnp.where(is_s, a, jnp.where(is_q, b, c))

    hit = sel(hs[0], hq[0], ht[0]) & (ptype >= 0)
    t = sel(hs[1], hq[1], ht[1])
    p = sel(hs[2], hq[2], ht[2])
    n = sel(hs[3], hq[3], ht[3])
    u = sel(hs[4], hq[4], ht[4])
    v = sel(hs[5], hq[5], ht[5])
    return hit, t, p, n, u, v


def _leaf_row_test(row, active, ro, rd, time, t_min, best_t, best_pt, best_pi):
    """Intersect one embedded 12-float prim row (if active); fold into best."""
    hit, t = isect.hit_prim_row(row, ro, rd, time, t_min, best_t)
    closer = active & hit & (t < best_t)
    best_t = jnp.where(closer, t, best_t)
    best_pt = jnp.where(closer, row[0].astype(jnp.int32), best_pt)
    best_pi = jnp.where(closer, row[1].astype(jnp.int32), best_pi)
    return best_t, best_pt, best_pi


# Traversal steps executed per while-loop trip.  lax.while_loop carries a
# large fixed per-iteration cost on TPU (~0.3 ms at 128k lanes — measured;
# ~28x a fori trip), so the loop runs INNER_STEPS masked steps per cond
# check: finished lanes idle cheaply while stragglers drain.
INNER_STEPS = 8

# Unroll factor for the batched per-wave step loop.  A fori trip has a
# measured fixed cost (carry shuffling + gather setup); unrolling lets XLA
# fuse consecutive steps and amortize it.  On-chip A/B (vol2_final, 16384
# lanes, 16 steps/wave): unroll 1 → 283.8 ms/sample, 2 → 278.4, 4 → 270.6,
# 8 → 277.9, 16 → 321.3.  TPU only: on the CPU backend (tests) the 4x
# bigger program multiplies XLA compile time for no runtime benefit.
UNROLL = 4


def _unroll() -> int:
    return UNROLL if jax.default_backend() != "cpu" else 1


# Early wave exit in traversal_steps_batched (see there).  Module-level so
# A/Bs can flip it; baked at trace time (clear jit caches when flipping).
ADAPTIVE_WAVE = True
# Exit a wave once fewer than 1/DEN of the pool is still walking
# (r4 A/B at the production config: den 4 > 6 > 8 by ~1%).
ADAPTIVE_EXIT_DEN = 4


class TravState(NamedTuple):
    """Suspendable per-ray traversal state.

    The wavefront engine runs a *bounded* number of traversal steps per wave
    and carries this state across waves, so one straggler ray crawling
    through hundreds of nodes never stalls the whole lock-step batch — the
    TPU answer to SIMT persistent-threads ray streaming.
    """

    cur: jax.Array      # () int32 node ptr; _DONE when finished
    stack: jax.Array    # (stack_depth,) int32
    sp: jax.Array       # () int32
    best_t: jax.Array   # () f32 closest hit so far
    best_pt: jax.Array  # () int32 prim type (-1 none)
    best_pi: jax.Array  # () int32 prim index


def traversal_init(bvh: PackedBVH, ro, rd, time, t_min, t_max,
                   stack_depth: int) -> TravState:
    """Start a closest-hit query (handles the single-prim root-leaf case)."""
    stack_depth = min(stack_depth, bvh.max_stack)
    best_t = jnp.asarray(t_max, jnp.float32)
    best_pt = jnp.asarray(-1, jnp.int32)
    best_pi = jnp.asarray(-1, jnp.int32)
    root_leaf = bvh.root < 0
    uid = jnp.clip(-bvh.root - 1, 0, bvh.prims.shape[0] - 1)
    best_t, best_pt, best_pi = _leaf_row_test(
        bvh.prims[uid], root_leaf, ro, rd, time, t_min, best_t, best_pt,
        best_pi)
    return TravState(
        cur=jnp.where(root_leaf, _DONE, bvh.root).astype(jnp.int32),
        stack=jnp.zeros((stack_depth,), jnp.int32),
        sp=jnp.zeros((), jnp.int32),
        best_t=best_t, best_pt=best_pt, best_pi=best_pi)


def traversal_step(bvh: PackedBVH, s: TravState, ro, inv_rd, rd, time,
                   t_min) -> TravState:
    """One masked BVH-K traversal step (no-op on finished lanes).

    One node-row gather (96 floats at K=4, 184 at K=8 — see
    ``types.bvh_layout``) yields all K children: AABB-test each, intersect
    leaf children from their embedded payloads, sort surviving interior
    children front-to-back with the arity-keyed ``_SORT_NET`` compare-swap
    network (5 comparators at K=4, 19 at K=8), descend the nearest and push
    the rest.

    All math is written on scalar *components* (not (3,) vectors): under
    vmap that lowers to full-width (N,) VPU ops instead of (N, 3) ops that
    use 3 of 128 hardware lanes — a ~30x throughput difference.
    """
    nodes = bvh.nodes
    iota = jnp.arange(s.stack.shape[0], dtype=jnp.int32)
    cur, stack, sp = s.cur, s.stack, s.sp
    best_t, best_pt, best_pi = s.best_t, s.best_pt, s.best_pi

    active = cur != _DONE
    row = nodes[jnp.where(active, cur, 0)]

    rox, roy, roz = ro[0], ro[1], ro[2]
    rdx, rdy, rdz = rd[0], rd[1], rd[2]
    ivx, ivy, ivz = inv_rd[0], inv_rd[1], inv_rd[2]
    rr = rdx * rdx + rdy * rdy + rdz * rdz

    K = bvh.branching
    ptr_off, payload, _ = bvh_layout(K)
    cand_t = []
    cand_p = []
    for i in range(K):
        ptr = row[ptr_off + i].astype(jnp.int32)
        b = 6 * i
        hi, ti = isect.hit_aabb_s(row[b], row[b + 1], row[b + 2],
                                  row[b + 3], row[b + 4], row[b + 5],
                                  rox, roy, roz, ivx, ivy, ivz, t_min, best_t)
        hi = hi & active & (ptr < BVH_EMPTY_SLOT)
        is_leaf = ptr < 0
        pr = [row[payload + PRIM_ROW * i + j] for j in range(14)]
        lhit, lt = isect.hit_prim_row_s(pr, rox, roy, roz, rdx, rdy, rdz, rr,
                                        time, t_min, best_t,
                                        mask=bvh.prim_mask)
        closer = (hi & is_leaf) & lhit & (lt < best_t)
        best_t = jnp.where(closer, lt, best_t)
        best_pt = jnp.where(closer, pr[0].astype(jnp.int32), best_pt)
        best_pi = jnp.where(closer, pr[1].astype(jnp.int32), best_pi)
        cand_t.append(jnp.where(hi & ~is_leaf, ti, isect.INF))
        cand_p.append(ptr)

    # Front-to-back order via a K-element compare-swap network; invalid
    # candidates (t = INF) sink to the back.
    def cswap(a, b):
        swap = cand_t[a] > cand_t[b]
        ta = jnp.where(swap, cand_t[b], cand_t[a])
        tb = jnp.where(swap, cand_t[a], cand_t[b])
        pa = jnp.where(swap, cand_p[b], cand_p[a])
        pb = jnp.where(swap, cand_p[a], cand_p[b])
        cand_t[a], cand_t[b] = ta, tb
        cand_p[a], cand_p[b] = pa, pb

    for a, b in _SORT_NET[K]:
        cswap(a, b)

    valid = [t < isect.INF for t in cand_t]

    # Push far-to-near (K-1 .. 1) so the nearest pops first later.  sp is
    # clamped to the stack capacity: an overflowing push is dropped (bounded
    # behavior) — without the clamp a later pop would read slot garbage
    # (node 0 = the root) and cycle forever.
    depth_cap = jnp.int32(s.stack.shape[0])
    for k in range(K - 1, 0, -1):
        stack = jnp.where((iota == sp) & valid[k], cand_p[k], stack)
        sp = jnp.minimum(sp + valid[k].astype(jnp.int32), depth_cap)

    can_pop = sp > 0
    popped = jnp.sum(jnp.where(iota == sp - 1, stack, 0))
    nxt = jnp.where(valid[0], cand_p[0],
                    jnp.where(can_pop, popped, _DONE))
    cur = jnp.where(active, nxt, jnp.int32(_DONE))
    sp = sp - (active & (~valid[0]) & can_pop).astype(jnp.int32)
    return TravState(cur=cur, stack=stack, sp=sp, best_t=best_t,
                     best_pt=best_pt, best_pi=best_pi)


def traversal_steps(bvh: PackedBVH, s: TravState, ro, rd, time, t_min,
                    n_steps: int) -> TravState:
    """Run up to ``n_steps`` masked traversal steps (resume-safe)."""
    inv_rd = 1.0 / rd

    def step(_, st):
        return traversal_step(bvh, st, ro, inv_rd, rd, time, t_min)

    return jax.lax.fori_loop(0, n_steps, step, s)


def traversal_init_batched(bvh: PackedBVH, ro, rd, time, t_min, t_max,
                           stack_depth: int) -> TravState:
    """Tile-batched :func:`traversal_init` for (R,)-batched rays.

    Same result as ``vmap(traversal_init)`` but the root-leaf prim-row test
    runs on (8,128)-tiled component slices instead of per-lane column
    extracts (one cross-lane relayout per component under vmap).  Called
    three times per wavefront control step (spawn, volume-exit query, next
    segment), so it is on the hot path.

    The stack is sized ``min(stack_depth, bvh.max_stack)`` — the exact
    per-tree worst case computed at pack time; per-step stack select work
    is linear in this depth.
    """
    stack_depth = min(stack_depth, bvh.max_stack)
    R = ro.shape[0]
    shape = (R // 128, 128) if (R % 128 == 0 and R >= 128) else (R,)

    def to2(x):
        x = jnp.asarray(x)
        return x.reshape(shape) if x.ndim == 1 else x

    rox, roy, roz = (to2(ro[..., i]) for i in range(3))
    rdx, rdy, rdz = (to2(rd[..., i]) for i in range(3))
    rr = rdx * rdx + rdy * rdy + rdz * rdz
    time2 = to2(time)
    t_min2 = to2(t_min)

    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    best_pt = jnp.full(shape, -1, jnp.int32)
    best_pi = jnp.full(shape, -1, jnp.int32)

    root_leaf = bvh.root < 0  # () traced scalar, same for every lane
    uid = jnp.clip(-bvh.root - 1, 0, bvh.prims.shape[0] - 1)
    row = bvh.prims[uid]  # (PRIM_ROW,) scalars — broadcast on the lane grid
    pr = [row[j] for j in range(14)]
    lhit, lt = isect.hit_prim_row_s(
        pr, rox, roy, roz, rdx, rdy, rdz, rr,
        time2, t_min2, best_t, mask=bvh.prim_mask)
    closer = root_leaf & lhit & (lt < best_t)
    best_t = jnp.where(closer, lt, best_t)
    best_pt = jnp.where(closer, pr[0].astype(jnp.int32), best_pt)
    best_pi = jnp.where(closer, pr[1].astype(jnp.int32), best_pi)

    cur = jnp.broadcast_to(
        jnp.where(root_leaf, _DONE, bvh.root).astype(jnp.int32), shape)
    return TravState(
        cur=cur.reshape(R),
        stack=jnp.zeros((R, stack_depth), jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        best_t=best_t.reshape(R), best_pt=best_pt.reshape(R),
        best_pi=best_pi.reshape(R))


def _step_tiled(bvh: PackedBVH, carry, rox, roy, roz, ivx, ivy, ivz,
                rdx, rdy, rdz, rr, time, t_min, iota):
    """One BVH-K traversal step over a tiled batch.

    Identical math to :func:`traversal_step` (the per-lane form the
    megakernel vmaps), written batch-major over arrays of shape ``shape``
    (the lane grid — see :func:`traversal_steps_batched`); the stack carries
    a *leading* depth axis ``(SD,) + shape``.  Layout is the entire point:
    under vmap, ``nodes[cur]`` is ``(R, NODE_ROW)`` (96 floats at K=4, 184
    at K=8) with the row floats in the VPU lane dimension, and every
    per-component read lowers to a cross-lane relayout (measured
    ~50 ns/lane/step on v5e, the engine's dominant cost).  Here the gathered
    rows are transposed once to ``(NODE_ROW,) + shape`` and all math runs on
    (8,128)-tiled full-width slices (~5 ns/lane/step, 9-10x).
    """
    nodes = bvh.nodes
    K = bvh.branching
    ptr_off, payload, _ = bvh_layout(K)
    cur, stack, sp, best_t, best_pt, best_pi = carry

    active = cur != _DONE
    rows = nodes[jnp.where(active, cur, 0)]   # shape + (NODE_ROW,)
    row = jnp.moveaxis(rows, -1, 0)           # (NODE_ROW,) + shape

    cand_t = []
    cand_p = []
    for i in range(K):
        ptr = row[ptr_off + i].astype(jnp.int32)
        b = 6 * i
        hi, ti = isect.hit_aabb_s(row[b], row[b + 1], row[b + 2],
                                  row[b + 3], row[b + 4], row[b + 5],
                                  rox, roy, roz, ivx, ivy, ivz, t_min, best_t)
        hi = hi & active & (ptr < BVH_EMPTY_SLOT)
        is_leaf = ptr < 0
        pr = [row[payload + PRIM_ROW * i + j] for j in range(14)]
        lhit, lt = isect.hit_prim_row_s(pr, rox, roy, roz, rdx, rdy, rdz, rr,
                                        time, t_min, best_t,
                                        mask=bvh.prim_mask)
        closer = (hi & is_leaf) & lhit & (lt < best_t)
        best_t = jnp.where(closer, lt, best_t)
        best_pt = jnp.where(closer, pr[0].astype(jnp.int32), best_pt)
        best_pi = jnp.where(closer, pr[1].astype(jnp.int32), best_pi)
        cand_t.append(jnp.where(hi & ~is_leaf, ti, isect.INF))
        cand_p.append(ptr)

    def cswap(a, b):
        swap = cand_t[a] > cand_t[b]
        ta = jnp.where(swap, cand_t[b], cand_t[a])
        tb = jnp.where(swap, cand_t[a], cand_t[b])
        pa = jnp.where(swap, cand_p[b], cand_p[a])
        pb = jnp.where(swap, cand_p[a], cand_p[b])
        cand_t[a], cand_t[b] = ta, tb
        cand_p[a], cand_p[b] = pa, pb

    for a, b in _SORT_NET[K]:
        cswap(a, b)

    valid = [t < isect.INF for t in cand_t]

    depth_cap = jnp.int32(stack.shape[0])
    for k in range(K - 1, 0, -1):
        push = (iota == sp[None]) & valid[k][None]
        stack = jnp.where(push, cand_p[k][None], stack)
        sp = jnp.minimum(sp + valid[k].astype(jnp.int32), depth_cap)

    can_pop = sp > 0
    popped = jnp.sum(jnp.where(iota == (sp - 1)[None], stack, 0), axis=0)
    nxt = jnp.where(valid[0], cand_p[0],
                    jnp.where(can_pop, popped, _DONE))
    cur = jnp.where(active, nxt, jnp.int32(_DONE))
    sp = sp - (active & (~valid[0]) & can_pop).astype(jnp.int32)
    return cur, stack, sp, best_t, best_pt, best_pi


def traversal_steps_batched(bvh: PackedBVH, s: TravState, ro, rd, time,
                            t_min, n_steps: int,
                            adaptive: bool = False,
                            count_steps: bool = False):
    """Run ``n_steps`` traversal steps on an (R,)-batched :class:`TravState`.

    ``ro``/``rd`` are (R, 3); ``time``/``t_min`` are (R,) or scalar.  The
    wavefront engine calls this directly (NOT under vmap) with
    ``adaptive=True`` — the threshold early-exit below; plain callers get
    exactly ``n_steps`` masked steps (the resume-safe contract).  With
    ``count_steps`` the return is ``(TravState, lane_steps, exec_steps)``:
    ``lane_steps`` counts walking-lane traversal steps at chunk granularity
    (active lanes at each chunk start × chunk) and ``exec_steps`` the steps
    the loop actually executed (× R = paid lane-steps; the gap to
    lane_steps is intra-wave idle) — the steps/segment and idle
    measurements the perf work tunes against; one (R,) sum per chunk,
    noise next to the step itself.  Internally the
    batch is viewed as a 2-D ``(R/128, 128)`` lane grid so every value maps
    onto whole (8,128) VPU tiles — the (R,) view is a free bitcast (same
    physical tiling), but *keeping* values 2-D stops XLA from inserting a
    cross-lane relayout for each of the ~76 gathered-row component reads per
    step (measured 9-10x on v5e; see ``_step_tiled``).  The per-wave
    stack transposes in/out are two ~1 MB copies — noise against the ~4 ms
    they save per wave.
    """
    R = s.cur.shape[0]
    shape = (R // 128, 128) if (R % 128 == 0 and R >= 128) else (R,)

    def to2(x):
        x = jnp.asarray(x)
        return x.reshape(shape) if x.ndim == 1 else x  # scalars broadcast

    rox, roy, roz = (to2(ro[..., i]) for i in range(3))
    rdx, rdy, rdz = (to2(rd[..., i]) for i in range(3))
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    rr = rdx * rdx + rdy * rdy + rdz * rdz
    time2 = to2(time)
    t_min2 = to2(t_min)

    sd = s.stack.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (sd,) + shape, 0)
    carry = (to2(s.cur),
             jnp.moveaxis(s.stack.reshape(shape + (sd,)), -1, 0),
             to2(s.sp), to2(s.best_t), to2(s.best_pt), to2(s.best_pi))

    def step(_, c):
        return _step_tiled(bvh, c, rox, roy, roz, ivx, ivy, ivz,
                           rdx, rdy, rdz, rr, time2, t_min2, iota)

    chunk = _unroll()
    lane_steps = jnp.zeros((), jnp.float32)
    if adaptive and n_steps > chunk and ADAPTIVE_WAVE:
        # Early wave exit: segment lengths vary 4..30+ steps, so a fixed
        # n_steps pool wave pays every remaining step on every lane after
        # its own walk finishes — ~50% of all traversal lane-steps were
        # idle in the r4 bench profile.  Run `chunk` unrolled steps per
        # while trip and stop once the still-walking fraction drops under
        # 1/ADAPTIVE_EXIT_DEN (waiting for *every* lane is useless: one
        # straggler in 12k lanes keeps the wave alive to its cap — the
        # all-done variant measured no gain).  Cutting a wave short is
        # always exact: unfinished walks are suspended TravState and
        # resume next wave; only the wave/control cadence shifts.
        R_live = 1
        for d in shape:
            R_live *= int(d)

        def cond(c):
            i, st, _ls = c
            n_act = jnp.sum((st[0] != _DONE).astype(jnp.int32))
            # (i == 0): the first chunk always runs — at the drain tail the
            # last few walking lanes are under the threshold, and a wave
            # that advanced nothing would spin the engine loop forever.
            return (i < n_steps) & ((i == 0)
                                    | (n_act * ADAPTIVE_EXIT_DEN > R_live))

        def body(c):
            i, st, ls = c
            n_act = jnp.sum((st[0] != _DONE).astype(jnp.float32))
            return (i + chunk,
                    jax.lax.fori_loop(0, chunk, step, st, unroll=chunk),
                    ls + n_act * chunk)

        exec_steps, carry, lane_steps = jax.lax.while_loop(
            cond, body, (jnp.int32(0), carry, lane_steps))
        cur, stack, sp, best_t, best_pt, best_pi = carry
    else:
        exec_steps = jnp.asarray(n_steps, jnp.int32)
        if count_steps:
            lane_steps = n_steps * jnp.sum(
                (carry[0] != _DONE).astype(jnp.float32))
        cur, stack, sp, best_t, best_pt, best_pi = jax.lax.fori_loop(
            0, n_steps, step, carry, unroll=chunk)
    out = TravState(
        cur=cur.reshape(R),
        stack=jnp.moveaxis(stack, 0, -1).reshape(R, sd),
        sp=sp.reshape(R), best_t=best_t.reshape(R),
        best_pt=best_pt.reshape(R), best_pi=best_pi.reshape(R))
    return (out, lane_steps, exec_steps) if count_steps else out


def traversal_done(s: TravState):
    return s.cur == _DONE


def _traverse_impl(bvh: PackedBVH, ro, rd, time, t_min, t_max, stack_depth):
    st = traversal_init(bvh, ro, rd, time, t_min, t_max, stack_depth)

    def cond(s):
        return s.cur != _DONE

    def body(s):
        return traversal_steps(bvh, s, ro, rd, time, t_min, INNER_STEPS)

    out = jax.lax.while_loop(cond, body, st)
    return out.best_pt >= 0, out.best_pt, out.best_pi, out.best_t


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def traverse_bvh(bvh, ro, rd, time, t_min, t_max, stack_depth=48):
    """Closest-hit query → ``(hit, prim_type, prim_idx, t)``.

    Zero-gradient by construction: discrete visibility does not
    differentiate; shading recomputes the hit differentiably.
    """
    return _traverse_impl(bvh, ro, rd, time, t_min, t_max, stack_depth)


def _trav_fwd(bvh, ro, rd, time, t_min, t_max, stack_depth):
    out = _traverse_impl(bvh, ro, rd, time, t_min, t_max, stack_depth)
    return out, (bvh, ro, rd, time, t_min, t_max)


def _trav_bwd(stack_depth, res, g):
    # Visibility is discrete: the only float output (t) is an argmin value
    # whose derivative we deliberately drop (shading recomputes it through
    # refine_hit).  All input cotangents are exactly zero.
    del stack_depth, g

    def zero(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
            return jnp.zeros(x.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)

    return jax.tree.map(zero, res)


traverse_bvh.defvjp(_trav_fwd, _trav_bwd)


def refine_hit(scene: SceneArrays, ptype, pidx, ro, rd, time, t_min) -> Hit:
    """Recompute the full differentiable hit record for a known primitive.

    The differentiable-rendering trick: visibility (which primitive) comes
    from the non-differentiable traversal; the hit position/normal/uv are
    recomputed here as smooth functions of the primitive parameters, so
    ``jax.grad`` flows into geometry/material tensors.
    """
    hit, t, p, n_out, u, v = intersect_prim(scene, ptype, pidx, ro, rd, time,
                                            t_min, INF)
    front = jnp.sum(rd * n_out, axis=-1) < 0.0
    normal = jnp.where(front, 1.0, -1.0) * n_out

    si = jnp.clip(pidx, 0, scene.sph_rad.shape[0] - 1)
    qi = jnp.clip(pidx, 0, scene.qd_d.shape[0] - 1)
    ti = jnp.clip(pidx, 0, scene.tr_mat.shape[0] - 1)
    is_s = ptype == PRIM_SPHERE
    is_q = ptype == PRIM_QUAD
    mat = jnp.where(is_s, scene.sph_mat[si],
                    jnp.where(is_q, scene.qd_mat[qi], scene.tr_mat[ti]))
    medium = jnp.where(is_s, scene.sph_medium[si],
                       jnp.where(is_q, scene.qd_medium[qi], scene.tr_medium[ti]))
    return Hit(hit=hit & (ptype >= 0), t=t, p=p, normal=normal, front_face=front,
               u=u, v=v, mat=mat, medium=medium, prim_type=ptype, prim_idx=pidx)


def first_hit_brute(scene: SceneArrays, ro, rd, time, t_min, t_max):
    """Brute-force closest hit over *all* primitives (test oracle).

    The accuracy reference for :func:`traverse_bvh` — plays the role the
    linear scan in hittable_list.py:22-32 plays for the reference's BVH.
    Returns ``(hit, prim_type, prim_idx, t)`` with identical semantics.
    """
    def against(ptype, n):
        idxs = jnp.arange(n, dtype=jnp.int32)
        h, t, _p, _n, _u, _v = jax.vmap(
            lambda i: intersect_prim(scene, ptype, i, ro, rd, time, t_min, t_max)
        )(idxs)
        return h, t, idxs

    results = []
    hs, ts, is_ = against(jnp.int32(PRIM_SPHERE), scene.sph_rad.shape[0])
    hs &= scene.sph_valid
    results.append((hs, ts, jnp.full_like(is_, PRIM_SPHERE), is_))
    hq, tq, iq = against(jnp.int32(PRIM_QUAD), scene.qd_d.shape[0])
    hq &= scene.qd_valid
    results.append((hq, tq, jnp.full_like(iq, PRIM_QUAD), iq))
    ht, tt, it = against(jnp.int32(PRIM_TRIANGLE), scene.tr_mat.shape[0])
    ht &= scene.tr_valid
    results.append((ht, tt, jnp.full_like(it, PRIM_TRIANGLE), it))

    allh = jnp.concatenate([r[0] for r in results])
    allt = jnp.where(allh, jnp.concatenate([r[1] for r in results]), INF)
    allpt = jnp.concatenate([r[2] for r in results])
    allpi = jnp.concatenate([r[3] for r in results])
    k = jnp.argmin(allt)
    found = allh[k]
    return found, jnp.where(found, allpt[k], -1), jnp.where(found, allpi[k], -1), allt[k]
