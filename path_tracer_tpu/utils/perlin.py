"""Perlin noise: host-side table generation + device-side evaluation.

Replaces the reference's ``core/perlin.py:6-83`` (classic gradient Perlin with
256 random vectors and three shuffled permutation tables, trilinear
Hermite-smoothed interpolation, 7-octave fBm turbulence).  Table generation is
host numpy; :func:`noise` / :func:`turb` are jit-safe, vectorised over
``(..., 3)`` points, and differentiable w.r.t. the query point.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

POINT_COUNT = 256  # perlin.py:8


def make_tables(seed: int = 0):
    """Random gradient vectors + 3 permutation tables (perlin.py:8-17).

    Returns ``(ranvec (256,3) f32, perm (3,256) i32)`` as numpy arrays.
    """
    rng = np.random.default_rng(seed)
    ranvec = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3)).astype(np.float32)
    ranvec /= np.maximum(np.linalg.norm(ranvec, axis=-1, keepdims=True), 1e-8)
    perm = np.stack(
        [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    )
    return ranvec, perm


def noise(ranvec: jax.Array, perm: jax.Array, p: jax.Array) -> jax.Array:
    """Gradient Perlin noise in [-1, 1] at points ``p`` of shape (..., 3).

    Trilinear interpolation of gradient dots with Hermite smoothing, matching
    perlin.py:19-42 + ``_perlin_interp`` (perlin.py:57-72) but with the 2x2x2
    corner loop unrolled into a vectorised (..., 8) contraction.
    """
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)

    # Corner offsets (8, 3): di,dj,dk in {0,1}^3.
    corners = jnp.array(
        [[di, dj, dk] for di in (0, 1) for dj in (0, 1) for dk in (0, 1)],
        dtype=jnp.int32,
    )
    idx = (ijk[..., None, :] + corners) & 255  # (..., 8, 3)
    h = (
        perm[0][idx[..., 0]]
        ^ perm[1][idx[..., 1]]
        ^ perm[2][idx[..., 2]]
    )  # (..., 8)
    grads = ranvec[h]  # (..., 8, 3)

    # Hermite smoothing (perlin.py:59-61).
    s = uvw * uvw * (3.0 - 2.0 * uvw)
    d = uvw[..., None, :] - corners.astype(p.dtype)  # weight vectors
    w = jnp.prod(
        corners.astype(p.dtype) * s[..., None, :]
        + (1.0 - corners.astype(p.dtype)) * (1.0 - s[..., None, :]),
        axis=-1,
    )  # (..., 8)
    return jnp.sum(w * jnp.sum(grads * d, axis=-1), axis=-1)


def turb(ranvec: jax.Array, perm: jax.Array, p: jax.Array, depth: int = 7) -> jax.Array:
    """fBm turbulence: ``sum_i 0.5^i * |noise(2^i p)|`` (perlin.py:74-83)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * noise(ranvec, perm, q)
        weight = weight * 0.5
        q = q * 2.0
    return jnp.abs(acc)
