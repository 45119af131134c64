"""Native C++ SAH builder vs the numpy oracle (same closest hits)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops import bvh_build, bvh_native, traverse


def _scene(rng, n=300):
    w = pt.HittableList()
    mat = pt.Lambertian((0.5, 0.5, 0.5))
    for _ in range(n):
        w.add(pt.Sphere.stationary(rng.uniform(-20, 20, 3),
                                   rng.uniform(0.2, 1.5), mat))
    for _ in range(60):
        w.add(pt.Quad(rng.uniform(-20, 20, 3), rng.uniform(-2, 2, 3),
                      rng.uniform(-2, 2, 3), mat))
    return pt.compile_scene(w)


@pytest.mark.skipif(not bvh_native.available(), reason="no C++ toolchain")
def test_native_builds_valid_tree(rng):
    scene = _scene(rng)
    aabbs = bvh_build.primitive_aabbs({
        k: np.asarray(getattr(scene, k))
        for k in ("sph_valid", "sph_c0", "sph_c1", "sph_rad",
                  "qd_valid", "qd_q", "qd_u", "qd_v",
                  "tr_valid", "tr_v0", "tr_e1", "tr_e2")})
    flat = bvh_build.build_bvh(*aabbs, use_native=True)
    ptype = np.asarray(flat.prim_type)
    left = np.asarray(flat.left)
    n_prims = 360
    assert int((ptype >= 0).sum()) == n_prims
    # Every primitive appears exactly once across leaves.
    leaves = np.stack([ptype[ptype >= 0], np.asarray(flat.prim_idx)[ptype >= 0]], 1)
    assert len({tuple(r) for r in leaves}) == n_prims
    # Containment invariant.
    bmin, bmax = np.asarray(flat.bb_min), np.asarray(flat.bb_max)
    right = np.asarray(flat.right)
    for i in np.nonzero(left >= 0)[0][:200]:
        for c in (left[i], right[i]):
            assert np.all(bmin[c] >= bmin[i] - 1e-3)
            assert np.all(bmax[c] <= bmax[i] + 1e-3)


@pytest.mark.skipif(not bvh_native.available(), reason="no C++ toolchain")
def test_native_same_hits_as_numpy(rng):
    """Trees may differ in tie-breaking; closest hits must not."""
    scene = _scene(rng)

    def flat_of(use_native):
        aabbs = bvh_build.primitive_aabbs({
            k: np.asarray(getattr(scene, k))
            for k in ("sph_valid", "sph_c0", "sph_c1", "sph_rad",
                      "qd_valid", "qd_q", "qd_u", "qd_v",
                      "tr_valid", "tr_v0", "tr_e1", "tr_e2")})
        return bvh_build.build_bvh(*aabbs, use_native=use_native)

    pb_native = bvh_build.pack_bvh(scene, flat_of(True))
    pb_numpy = bvh_build.pack_bvh(scene, flat_of(False))

    n_rays = 256
    ro = jnp.asarray(rng.uniform(-40, 40, (n_rays, 3)), jnp.float32)
    rd = jnp.asarray(rng.uniform(-15, 15, (n_rays, 3)), jnp.float32) - ro
    tm = jnp.zeros((n_rays,))

    def hits(pb):
        return jax.jit(jax.vmap(lambda o, d, t: traverse.traverse_bvh(
            pb, o, d, t, 1e-3, 1e9, 64)))(ro, rd, tm)

    f1, pt1, pi1, t1 = hits(pb_native)
    f2, pt2, pi2, t2 = hits(pb_numpy)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    m = np.asarray(f1)
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t2)[m],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not bvh_native.available(), reason="no C++ toolchain")
def test_native_speedup(rng):
    scene = _scene(rng, n=2000)
    args = bvh_build.primitive_aabbs({
        k: np.asarray(getattr(scene, k))
        for k in ("sph_valid", "sph_c0", "sph_c1", "sph_rad",
                  "qd_valid", "qd_q", "qd_u", "qd_v",
                  "tr_valid", "tr_v0", "tr_e1", "tr_e2")})
    t0 = time.perf_counter()
    bvh_build.build_bvh(*args, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    bvh_build.build_bvh(*args, use_native=False)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy  # typically 20-100x
