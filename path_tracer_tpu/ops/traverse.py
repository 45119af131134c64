"""Stack-based BVH traversal (the hot loop) + brute-force oracle.

TPU-native re-design of the reference's Taichi traversal
(``kernels.py:624-742`` ``traverse_bvh_legacy``): per-ray fixed-depth stack,
precomputed inverse direction, front-to-back child ordering, and early
termination by shrinking ``closest_t``.  Differences from the reference:

* The loop is a ``lax.while_loop`` over a small carry; under ``vmap`` the
  lanes run lock-step until every ray's stack drains (the TPU analogue of a
  SIMT warp).
* Children are AABB-tested *before* being pushed (the reference pushes then
  tests on pop), halving stack traffic.
* The traversal returns only the discrete result ``(hit, prim_type,
  prim_idx, t)`` and is wrapped in a zero-gradient ``custom_vjp``; shading
  recomputes the hit record differentiably from the primitive id (see
  :func:`refine_hit`).  This is what makes the integrator reverse-mode
  differentiable despite the data-dependent while-loop.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import intersect as isect
from .types import PRIM_QUAD, PRIM_SPHERE, PRIM_TRIANGLE, FlatBVH, SceneArrays

INF = isect.INF


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
    """Intersect one primitive identified by (type, index).

    Computes all three primitive types on every lane and selects by type —
    the masked-lanes equivalent of the reference's ``if prim_type == ...``
    dispatch (kernels.py:672-717), which is how divergence-free lock-step
    execution wants it on the VPU.
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


def _traverse_impl(scene: SceneArrays, bvh: FlatBVH, ro, rd, time, t_min, t_max,
                   stack_depth: int):
    inv_rd = 1.0 / rd  # IEEE inf handles axis-parallel rays (kernels.py:641)

    stack = jnp.zeros((stack_depth,), jnp.int32)
    root_hit, _ = isect.hit_aabb(bvh.bb_min[0], bvh.bb_max[0], ro, inv_rd,
                                 t_min, t_max)
    sp0 = jnp.where(root_hit, 1, 0).astype(jnp.int32)

    State = tuple  # (stack, sp, best_t, best_ptype, best_pidx)
    init: State = (stack, sp0, jnp.asarray(t_max, jnp.float32),
                   jnp.asarray(-1, jnp.int32), jnp.asarray(-1, jnp.int32))

    def cond(s):
        return s[1] > 0

    def body(s):
        stack, sp, best_t, best_pt, best_pi = s
        sp = sp - 1
        node = stack[sp]

        left = bvh.left[node]
        right = bvh.right[node]
        is_leaf = left < 0
        ptype = bvh.prim_type[node]
        pidx = bvh.prim_idx[node]

        # Leaf: intersect the single primitive, shrink closest_t
        # (kernels.py:667-724).
        hit, t, _p, _n, _u, _v = intersect_prim(
            scene, jnp.where(is_leaf, ptype, -1), pidx, ro, rd, time, t_min, best_t)
        closer = is_leaf & hit & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_pt = jnp.where(closer, ptype, best_pt)
        best_pi = jnp.where(closer, pidx, best_pi)

        # Interior: AABB-test both children against the shrunken interval and
        # push survivors, nearer child on top (kernels.py:726-741).
        li = jnp.clip(left, 0, bvh.left.shape[0] - 1)
        ri = jnp.clip(right, 0, bvh.left.shape[0] - 1)
        lhit, lt = isect.hit_aabb(bvh.bb_min[li], bvh.bb_max[li], ro, inv_rd,
                                  t_min, best_t)
        rhit, rt = isect.hit_aabb(bvh.bb_min[ri], bvh.bb_max[ri], ro, inv_rd,
                                  t_min, best_t)
        swap = lt > rt
        near = jnp.where(swap, ri, li)
        far = jnp.where(swap, li, ri)
        near_hit = jnp.where(swap, rhit, lhit) & ~is_leaf
        far_hit = jnp.where(swap, lhit, rhit) & ~is_leaf

        # Push far first so near pops first.  Out-of-range writes (stack
        # overflow) are dropped by scatter semantics — bounded, never UB.
        stack = jax.lax.select(far_hit, stack.at[sp].set(far), stack)
        sp = sp + far_hit.astype(jnp.int32)
        stack = jax.lax.select(near_hit, stack.at[sp].set(near), stack)
        sp = sp + near_hit.astype(jnp.int32)
        sp = jnp.minimum(sp, stack_depth - 1)
        return (stack, sp, best_t, best_pt, best_pi)

    _stack, _sp, best_t, best_pt, best_pi = jax.lax.while_loop(cond, body, init)
    found = best_pt >= 0
    return found, best_pt, best_pi, best_t


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def traverse_bvh(scene, bvh, ro, rd, time, t_min, t_max, stack_depth=64):
    """Closest-hit query → ``(hit, prim_type, prim_idx, t)``.

    Zero-gradient by construction: discrete visibility does not
    differentiate; shading recomputes the hit differentiably.
    """
    return _traverse_impl(scene, bvh, ro, rd, time, t_min, t_max, stack_depth)


def _trav_fwd(scene, bvh, ro, rd, time, t_min, t_max, stack_depth):
    out = _traverse_impl(scene, bvh, ro, rd, time, t_min, t_max, stack_depth)
    return out, (scene, bvh, ro, rd, time, t_min, t_max)


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
