"""Vector math over ``(..., 3)`` arrays.

TPU-native replacement for the reference's scalar ``vec3`` class
(``/root/reference/src/util/vec3.py:5-334``).  Instead of a Python class with
operator overloads, every helper here is a pure function over ``jnp`` arrays
whose last axis has length 3, so the same code runs scalar (via vmap on a
single lane) and vectorised over pixel/ray batches.

All functions are differentiable and jit-safe (no Python branching on values).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Small epsilon used to guard normalisation / division; mirrors the reference's
# near-zero threshold (vec3.py:241 `near_zero`, s=1e-8).
EPS = 1e-8


def vdot(a: Array, b: Array) -> Array:
    """Dot product over the last axis; returns shape ``a.shape[:-1]``."""
    return jnp.sum(a * b, axis=-1)


def vdot3(a: Array, b: Array) -> Array:
    """Dot product keeping a trailing singleton dim (broadcast-friendly)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: Array, b: Array) -> Array:
    """Cross product over the last axis (reference vec3.py:253-258)."""
    return jnp.cross(a, b)


def length_squared(v: Array) -> Array:
    return vdot(v, v)


def length(v: Array) -> Array:
    return jnp.sqrt(vdot(v, v))


def normalize(v: Array) -> Array:
    """Unit vector; safe at zero length (reference vec3.py:261-267)."""
    return v * jax.lax.rsqrt(jnp.maximum(vdot3(v, v), EPS * EPS))


def near_zero(v: Array) -> Array:
    """True where all components are ~0 (reference vec3.py:239-242)."""
    return jnp.all(jnp.abs(v) < EPS, axis=-1)


def reflect(v: Array, n: Array) -> Array:
    """Mirror reflection about normal ``n`` (reference vec3.py:286-293)."""
    return v - 2.0 * vdot3(v, n) * n


def refract(uv: Array, n: Array, etai_over_etat: Array) -> Array:
    """Snell refraction of unit vector ``uv`` (reference vec3.py:296-301).

    ``etai_over_etat`` broadcasts against the leading dims.
    """
    cos_theta = jnp.minimum(vdot3(-uv, n), 1.0)
    eta = jnp.asarray(etai_over_etat)[..., None] if jnp.ndim(etai_over_etat) == uv.ndim - 1 else etai_over_etat
    r_out_perp = eta * (uv + cos_theta * n)
    # max(…, eps) not abs(…): keeps sqrt differentiable at grazing angles
    # (this runs on masked lanes whose NaN grads would leak through selects).
    r_out_parallel = -jnp.sqrt(jnp.maximum(1.0 - vdot3(r_out_perp, r_out_perp), 1e-12)) * n
    return r_out_perp + r_out_parallel


def lerp(a: Array, b: Array, t: Array) -> Array:
    """Linear interpolation ``(1-t)*a + t*b``."""
    return a + (b - a) * t


def onb_from_w(w: Array) -> tuple[Array, Array, Array]:
    """Orthonormal basis with ``w`` as the third axis.

    Branch-free variant of the reference's ONB construction used for
    cosine-weighted sampling (vec3.py:304-334): picks the helper axis by the
    magnitude of ``w.x`` instead of an ``if``.
    """
    w = normalize(w)
    use_y = (jnp.abs(w[..., 0:1]) > 0.9).astype(w.dtype)
    a = jnp.stack(
        [1.0 - use_y[..., 0], use_y[..., 0], jnp.zeros_like(use_y[..., 0])],
        axis=-1,
    )
    v = normalize(cross(w, a))
    u = cross(w, v)
    return u, v, w
