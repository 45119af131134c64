"""Counter-based RNG discipline + analytic direction sampling.

Replaces the reference's per-thread ``ti.random()`` (kernels.py:16-71) and the
rejection-sampled helpers in ``/root/reference/src/util/vec3.py:270-334`` with
counter-based ``jax.random`` (threefry) keys and *analytic* inverse-transform
sampling.  Rejection loops are hostile to lock-step SIMD execution on the TPU
VPU; every sampler below consumes a fixed number of uniforms, which also makes
renders bit-reproducible and differentiable.

Key discipline: one base key per render; ``fold_in`` by sample index, then by
pixel id, then by bounce, gives every (pixel, sample, bounce) an independent
stream without materialising key arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vec

Array = jax.Array

TWO_PI = 2.0 * jnp.pi


def pixel_key(base: Array, sample_idx, pixel_idx) -> Array:
    """Derive the per-(sample, pixel) key."""
    return jax.random.fold_in(jax.random.fold_in(base, sample_idx), pixel_idx)


def uniform3(key: Array, shape=()) -> Array:
    return jax.random.uniform(key, shape + (3,))


def random_unit_vector(u: Array) -> Array:
    """Uniform direction on the unit sphere from two uniforms ``u[..., 0:2]``.

    Analytic replacement for the rejection loop at vec3.py:270-275.
    """
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_on_hemisphere(u: Array, normal: Array) -> Array:
    """Uniform hemisphere direction about ``normal`` (vec3.py:278-284)."""
    d = random_unit_vector(u)
    flip = jnp.sign(vec.vdot3(d, normal))
    return d * jnp.where(flip == 0.0, 1.0, flip)


def random_in_unit_disk(u: Array) -> Array:
    """Uniform point in the unit disk, z=0 (vec3.py:296-301), analytic form."""
    r = jnp.sqrt(u[..., 0])
    phi = TWO_PI * u[..., 1]
    z = jnp.zeros_like(r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_cosine_direction(u: Array, normal: Array) -> Array:
    """Cosine-weighted direction about ``normal`` via ONB (vec3.py:304-334)."""
    r = jnp.sqrt(u[..., 0])
    phi = TWO_PI * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
    ub, vb, wb = vec.onb_from_w(normal)
    return x[..., None] * ub + y[..., None] * vb + z[..., None] * wb


def sample_henyey_greenstein(u: Array, g: Array) -> Array:
    """Sample cos(theta) from the Henyey–Greenstein phase function.

    Matches the reference's SSS random-walk sampler
    (material.py:251-276 ``_sample_henyey_greenstein``) but branch-free: the
    isotropic g≈0 case is blended with ``where``.
    """
    g = jnp.asarray(g)
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u)
    cos_hg = (1.0 + safe_g * safe_g - sq * sq) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * u
    return jnp.clip(jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_hg), -1.0, 1.0)


def direction_from_cos(u_phi: Array, cos_theta: Array, axis: Array) -> Array:
    """Build a direction with given polar cosine about ``axis``.

    Guarded sqrt: ``cos_theta`` can carry gradients (HG g parameter), so the
    derivative must stay finite at |cos| = 1.
    """
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 1e-12, 1.0))
    phi = TWO_PI * u_phi
    ub, vb, wb = vec.onb_from_w(axis)
    return (
        (sin_theta * jnp.cos(phi))[..., None] * ub
        + (sin_theta * jnp.sin(phi))[..., None] * vb
        + cos_theta[..., None] * wb
    )
