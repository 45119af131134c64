"""Analytic unit tests for primitive intersectors (SURVEY.md §4: exact
oracles replace the reference's eyeball-only testing)."""
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.ops import intersect as isect

RO = jnp.array([0.0, 0.0, 5.0])
RD = jnp.array([0.0, 0.0, -1.0])
T0 = jnp.array(0.0)


def test_sphere_hit_front():
    c = jnp.zeros(3)
    hit, t, p, n, u, v = isect.hit_sphere(c, c, jnp.array(1.0), RO, RD, T0,
                                          1e-3, 1e9)
    assert bool(hit)
    assert np.isclose(float(t), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-5)


def test_sphere_inside_gives_far_root():
    c = jnp.zeros(3)
    ro = jnp.zeros(3)
    hit, t, *_ = isect.hit_sphere(c, c, jnp.array(1.0), ro, RD, T0, 1e-3, 1e9)
    assert bool(hit)
    assert np.isclose(float(t), 1.0, atol=1e-5)


def test_sphere_miss():
    c = jnp.array([3.0, 0.0, 0.0])
    hit, *_ = isect.hit_sphere(c, c, jnp.array(1.0), RO, RD, T0, 1e-3, 1e9)
    assert not bool(hit)


def test_moving_sphere_lerp():
    """Center lerps with ray time (sphere.py:35; GPU drops this — we don't)."""
    c0 = jnp.array([0.0, 0.0, 0.0])
    c1 = jnp.array([10.0, 0.0, 0.0])
    # At t=0 the ray down the z-axis hits; at t=1 it misses.
    hit0, *_ = isect.hit_sphere(c0, c1, jnp.array(1.0), RO, RD, jnp.array(0.0),
                                1e-3, 1e9)
    hit1, *_ = isect.hit_sphere(c0, c1, jnp.array(1.0), RO, RD, jnp.array(1.0),
                                1e-3, 1e9)
    assert bool(hit0) and not bool(hit1)
    # At time 0.5 center x=5 → still a miss; aim the ray there and hit.
    ro = jnp.array([5.0, 0.0, 5.0])
    hit5, t5, *_ = isect.hit_sphere(c0, c1, jnp.array(1.0), ro, RD,
                                    jnp.array(0.5), 1e-3, 1e9)
    assert bool(hit5)
    assert np.isclose(float(t5), 4.0, atol=1e-4)


def _quad_arrays(q, u, v):
    q, u, v = (np.asarray(x, np.float64) for x in (q, u, v))
    n_raw = np.cross(u, v)
    nn = n_raw / np.linalg.norm(n_raw)
    w = n_raw / np.dot(n_raw, n_raw)
    d = np.dot(nn, q)
    return tuple(jnp.asarray(x, jnp.float32) for x in (q, u, v, nn, w, d))


def test_quad_hit_and_uv():
    q, u, v, nn, w, d = _quad_arrays([-1, -1, 0], [2, 0, 0], [0, 2, 0])
    hit, t, p, n, alpha, beta = isect.hit_quad(q, u, v, nn, w, d, RO, RD,
                                               1e-3, 1e9)
    assert bool(hit)
    assert np.isclose(float(t), 5.0, atol=1e-5)
    # Ray hits quad center → planar coords (0.5, 0.5) (quad.py:61-68).
    assert np.isclose(float(alpha), 0.5, atol=1e-5)
    assert np.isclose(float(beta), 0.5, atol=1e-5)


def test_quad_exterior_miss():
    q, u, v, nn, w, d = _quad_arrays([1, 1, 0], [2, 0, 0], [0, 2, 0])
    hit, *_ = isect.hit_quad(q, u, v, nn, w, d, RO, RD, 1e-3, 1e9)
    assert not bool(hit)


def test_triangle_hit_barycentric():
    v0 = jnp.array([-1.0, -1.0, 0.0])
    e1 = jnp.array([2.0, 0.0, 0.0])
    e2 = jnp.array([0.0, 2.0, 0.0])
    n = jnp.array([0.0, 0.0, 1.0])
    hit, t, p, nn, u, v = isect.hit_triangle(v0, e1, e2, n, RO, RD, 1e-3, 1e9)
    assert bool(hit)
    assert np.isclose(float(t), 5.0, atol=1e-5)
    assert np.isclose(float(u), 0.5, atol=1e-5)
    assert np.isclose(float(v), 0.5, atol=1e-5)


def test_triangle_outside_miss():
    v0 = jnp.array([1.0, 1.0, 0.0])
    e1 = jnp.array([1.0, 0.0, 0.0])
    e2 = jnp.array([0.0, 1.0, 0.0])
    n = jnp.array([0.0, 0.0, 1.0])
    hit, *_ = isect.hit_triangle(v0, e1, e2, n, RO, RD, 1e-3, 1e9)
    assert not bool(hit)


def test_aabb_slab():
    mn = jnp.array([-1.0, -1.0, -1.0])
    mx = jnp.array([1.0, 1.0, 1.0])
    inv = 1.0 / RD
    hit, tn = isect.hit_aabb(mn, mx, RO, inv, 1e-3, 1e9)
    assert bool(hit)
    assert np.isclose(float(tn), 4.0, atol=1e-5)
    # Parallel ray outside the slab must miss (IEEE inf semantics).
    ro2 = jnp.array([5.0, 0.0, 5.0])
    hit2, _ = isect.hit_aabb(mn, mx, ro2, inv, 1e-3, 1e9)
    assert not bool(hit2)
    # Parallel ray inside the slab must hit.
    ro3 = jnp.array([0.5, 0.0, 5.0])
    hit3, _ = isect.hit_aabb(mn, mx, ro3, inv, 1e-3, 1e9)
    assert bool(hit3)
