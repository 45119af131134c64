"""BVH build + traversal vs brute-force oracle (SURVEY.md §7 step 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops import bvh_build, traverse
from path_tracer_tpu.ops.types import BVH_NONE


def _random_scene(rng, n_sph=40, n_quad=10, n_tri=10):
    w = pt.HittableList()
    mat = pt.Lambertian((0.5, 0.5, 0.5))
    for _ in range(n_sph):
        w.add(pt.Sphere.stationary(rng.uniform(-10, 10, 3),
                                   rng.uniform(0.1, 1.5), mat))
    for _ in range(n_quad):
        w.add(pt.Quad(rng.uniform(-10, 10, 3), rng.uniform(-2, 2, 3),
                      rng.uniform(-2, 2, 3), mat))
    for _ in range(n_tri):
        base = rng.uniform(-10, 10, 3)
        w.add(pt.Triangle(base, base + rng.uniform(-2, 2, 3),
                          base + rng.uniform(-2, 2, 3), mat))
    return pt.compile_scene(w)


def test_bvh_structure(rng):
    scene = _random_scene(rng)
    bvh = bvh_build.build_flat_bvh(scene)
    left = np.asarray(bvh.left)
    ptype = np.asarray(bvh.prim_type)
    n_prims = 60
    # Leaf = exactly one primitive → n leaves, n-1 interior nodes.
    n_leaves = int((ptype >= 0).sum())
    assert n_leaves == n_prims
    used = (left != BVH_NONE) | (ptype >= 0)
    assert int(used.sum()) == 2 * n_prims - 1
    # Child boxes are contained in parent boxes.
    bmin, bmax = np.asarray(bvh.bb_min), np.asarray(bvh.bb_max)
    right = np.asarray(bvh.right)
    interior = np.nonzero(left >= 0)[0]
    for i in interior:
        for c in (left[i], right[i]):
            assert np.all(bmin[c] >= bmin[i] - 1e-4)
            assert np.all(bmax[c] <= bmax[i] + 1e-4)


def test_traversal_matches_brute_force(rng):
    """The core correctness oracle: BVH closest-hit == linear-scan closest-hit
    for hundreds of random rays (hittable_list.py:22-32 semantics)."""
    scene = _random_scene(rng)
    bvh = pt.build_from_scene(scene)

    n_rays = 512
    ro = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)), jnp.float32)
    rd = target - ro
    time = jnp.zeros((n_rays,))

    trav = jax.jit(jax.vmap(
        lambda o, d, t: traverse.traverse_bvh(bvh, o, d, t, 1e-3, 1e9, 64)))
    brute = jax.jit(jax.vmap(
        lambda o, d, t: traverse.first_hit_brute(scene, o, d, t, 1e-3, 1e9)))

    f1, pt1, pi1, t1 = trav(ro, rd, time)
    f2, pt2, pi2, t2 = brute(ro, rd, time)

    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    hit = np.asarray(f1)
    assert hit.sum() > 50  # sanity: scene is actually hit
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-4, atol=1e-4)
    # Same primitive except for exact ties.
    same = (np.asarray(pt1) == np.asarray(pt2)) & (np.asarray(pi1) == np.asarray(pi2))
    assert same[hit].mean() > 0.99


def test_traversal_motion_blur(rng):
    """Moving spheres must be found at their time-lerped positions."""
    w = pt.HittableList()
    w.add(pt.Sphere.moving((0, 0, 0), (10, 0, 0), 1.0,
                           pt.Lambertian((0.5, 0.5, 0.5))))
    scene = pt.compile_scene(w)
    bvh = pt.build_from_scene(scene)
    ro = jnp.array([5.0, 0.0, 5.0])
    rd = jnp.array([0.0, 0.0, -1.0])
    f0, *_ = traverse.traverse_bvh(bvh, ro, rd, jnp.array(0.0), 1e-3, 1e9, 64)
    f5, *_ = traverse.traverse_bvh(bvh, ro, rd, jnp.array(0.5), 1e-3, 1e9, 64)
    assert not bool(f0)
    assert bool(f5)


def test_single_prim_scene():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, 0), 1.0, pt.Lambertian((1, 0, 0))))
    scene = pt.compile_scene(w)
    bvh = pt.build_from_scene(scene)
    f, ptp, pii, t = traverse.traverse_bvh(
        bvh, jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, -1.0]),
        jnp.array(0.0), 1e-3, 1e9, 64)
    assert bool(f)
    assert np.isclose(float(t), 4.0, atol=1e-5)


def test_empty_scene_raises():
    w = pt.HittableList()
    with pytest.raises(ValueError):
        scene = pt.compile_scene(w)
        pt.build_from_scene(scene)


@pytest.mark.parametrize("branching", [8])
def test_bvh8_matches_bvh4(rng, branching):
    """The 8-wide packed layout (pack_bvh branching=8) must produce the
    exact same closest hits as the default 4-wide layout — per-lane and
    tile-batched forms both."""
    scene = _random_scene(rng)
    b4 = pt.build_from_scene(scene, branching=4)
    b8 = pt.build_from_scene(scene, branching=branching)
    assert b8.nodes.shape[1] == 184  # 8 boxes + 8 ptrs + pad + 8 payloads
    assert b8.nodes.shape[0] < b4.nodes.shape[0]

    n_rays = 512
    ro = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    rd = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)), jnp.float32) - ro
    time = jnp.zeros((n_rays,))

    def closest(bvh):
        f, ptp, pii, t = jax.jit(jax.vmap(
            lambda o, d, t: traverse.traverse_bvh(bvh, o, d, t, 1e-3, 1e9,
                                                  64)))(ro, rd, time)
        return (np.asarray(f), np.asarray(ptp), np.asarray(pii),
                np.asarray(t))

    f4, pt4, pi4, t4 = closest(b4)
    f8, pt8, pi8, t8 = closest(b8)
    np.testing.assert_array_equal(f4, f8)
    assert f4.sum() > 50
    np.testing.assert_allclose(t4[f4], t8[f4], rtol=1e-5, atol=1e-5)
    same = (pt4 == pt8) & (pi4 == pi8)
    assert same[f4].mean() > 0.99  # ties may resolve differently

    # Tile-batched form agrees with itself per-lane on the 8-wide tree.
    s0 = traverse.traversal_init_batched(b8, ro, rd, time,
                                         jnp.full((n_rays,), 1e-3), 1e9, 48)
    out = traverse.traversal_steps_batched(b8, s0, ro, rd, time,
                                           jnp.full((n_rays,), 1e-3), 400)
    done = np.asarray(traverse.traversal_done(out))
    assert done.all()
    np.testing.assert_allclose(np.asarray(out.best_t)[f4], t4[f4],
                               rtol=1e-5, atol=1e-5)


def test_presplit_refs_traversal_matches_brute(rng):
    """SBVH-style reference pre-splitting (bvh_build.presplit_refs) must
    keep closest hits exact: the split halves' union covers each primitive
    and duplicates report the same t.  (On-chip the pass LOSES on every
    scene tried — flagship steps/segment 7.6 -> 16.7 at budget 0.25, see
    docs/PERFORMANCE.md — so it ships off-by-default as closure evidence;
    this test keeps the option honest.)"""
    scene = _random_scene(rng, n_sph=30, n_quad=20, n_tri=10)
    bvh = bvh_build.build_from_scene(scene, presplit=0.6)

    n_rays = 256
    ro = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    rd = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)), jnp.float32) - ro
    time = jnp.zeros((n_rays,))
    f1, pt1, pi1, t1 = jax.jit(jax.vmap(
        lambda o, d, t: traverse.traverse_bvh(bvh, o, d, t, 1e-3, 1e9, 64)
    ))(ro, rd, time)
    f2, pt2, pi2, t2 = jax.jit(jax.vmap(
        lambda o, d, t: traverse.first_hit_brute(scene, o, d, t, 1e-3, 1e9)
    ))(ro, rd, time)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    hit = np.asarray(f1)
    assert hit.sum() > 30
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-4, atol=1e-4)
