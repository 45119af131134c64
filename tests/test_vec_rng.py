"""Unit tests for the math/RNG foundation (SURVEY.md §7 step 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.utils import rng, vec


def test_dot_cross_normalize():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-4.0, 5.0, 0.5])
    assert np.isclose(vec.vdot(a, b), float(np.dot(np.asarray(a), np.asarray(b))))
    np.testing.assert_allclose(np.asarray(vec.cross(a, b)),
                               np.cross(np.asarray(a), np.asarray(b)), rtol=1e-6)
    n = vec.normalize(b)
    assert np.isclose(float(vec.length(n)), 1.0, atol=1e-5)


def test_reflect_is_involution():
    v = vec.normalize(jnp.array([1.0, -1.0, 0.3]))
    n = jnp.array([0.0, 1.0, 0.0])
    r = vec.reflect(v, n)
    # Angle of incidence == angle of reflection.
    assert np.isclose(float(vec.vdot(v, n)), -float(vec.vdot(r, n)), atol=1e-6)
    # Reflecting twice returns the original vector.
    np.testing.assert_allclose(np.asarray(vec.reflect(r, n)), np.asarray(v),
                               atol=1e-6)


def test_refract_snell():
    # Glass entry at 45 degrees: check Snell's law |sin t| = eta |sin i|.
    uv = vec.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    eta = 1.0 / 1.5
    out = vec.refract(uv, n, eta)
    sin_i = np.sqrt(1 - float(vec.vdot(-uv, n)) ** 2)
    sin_t = np.sqrt(max(0.0, 1 - float(vec.vdot(out, -n)) ** 2))
    assert np.isclose(sin_t, eta * sin_i, atol=1e-5)
    assert np.isclose(float(vec.length(out)), 1.0, atol=1e-5)


def test_onb_orthonormal():
    for w in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.3, -0.8, 0.5]):
        u, v, ww = vec.onb_from_w(jnp.array(w))
        for x in (u, v, ww):
            assert np.isclose(float(vec.length(x)), 1.0, atol=1e-5)
        assert abs(float(vec.vdot(u, v))) < 1e-5
        assert abs(float(vec.vdot(u, ww))) < 1e-5
        assert abs(float(vec.vdot(v, ww))) < 1e-5


@pytest.mark.parametrize("sampler", [rng.random_unit_vector,
                                     rng.random_in_unit_disk])
def test_samplers_in_domain(sampler):
    key = jax.random.key(0)
    u = jax.random.uniform(key, (4096, 2))
    out = jax.vmap(sampler)(u)
    lens = np.linalg.norm(np.asarray(out), axis=-1)
    if sampler is rng.random_unit_vector:
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)
        # Uniform on sphere → mean ~0 per component.
        assert np.all(np.abs(np.asarray(out).mean(0)) < 0.05)
    else:
        assert np.all(lens <= 1.0 + 1e-6)
        assert np.all(np.abs(np.asarray(out)[:, 2]) < 1e-9)


def test_cosine_direction_distribution():
    """Cosine-weighted sampling: E[cos theta] should be 2/3."""
    key = jax.random.key(1)
    u = jax.random.uniform(key, (8192, 2))
    n = jnp.array([0.0, 0.0, 1.0])
    d = jax.vmap(lambda uu: rng.random_cosine_direction(uu, n))(u)
    cos = np.asarray(d)[:, 2]
    assert np.all(cos >= -1e-6)
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_hg_sampling_moments():
    """HG phase function: E[cos theta] == g."""
    key = jax.random.key(2)
    u = jax.random.uniform(key, (16384,))
    for g in (0.0, 0.5, -0.3, 0.9):
        cos = np.asarray(jax.vmap(lambda x: rng.sample_henyey_greenstein(x, g))(u))
        assert abs(cos.mean() - g) < 0.02, g


def test_key_discipline_reproducible():
    base = jax.random.key(7)
    a = rng.pixel_key(base, 3, 99)
    b = rng.pixel_key(base, 3, 99)
    c = rng.pixel_key(base, 3, 100)
    assert jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    assert not jnp.array_equal(jax.random.key_data(a), jax.random.key_data(c))
