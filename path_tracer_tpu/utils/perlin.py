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

    Returns ``(ranvec (256, 4) f32, perm (3, 256) i32)`` as numpy arrays —
    gradients padded to 4 floats so a corner lookup is one aligned row
    gather on device.
    """
    rng = np.random.default_rng(seed)
    ranvec = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3)).astype(np.float32)
    ranvec /= np.maximum(np.linalg.norm(ranvec, axis=-1, keepdims=True), 1e-8)
    ranvec = np.concatenate(
        [ranvec, np.zeros((POINT_COUNT, 1), np.float32)], axis=1)
    perm = np.stack(
        [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    )
    return ranvec, perm


def noise_s(ranvec: jax.Array, perm: jax.Array, px, py, pz):
    """Scalar-component gradient Perlin noise (device hot path).

    Gather-lean form of :func:`noise`: 6 permutation lookups (2 per axis)
    XOR-combined into the 8 corner hashes, then 8 packed gradient-row
    gathers — ~14 gathers per point per octave versus ~32 for the naive
    (..., 8, 3) formulation, and all arithmetic on scalars so vmap emits
    full-width (N,) VPU ops.
    """
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    u = px - fx
    v = py - fy
    w = pz - fz
    ix = fx.astype(jnp.int32) & 255
    iy = fy.astype(jnp.int32) & 255
    iz = fz.astype(jnp.int32) & 255

    hx0 = perm[0][ix]
    hx1 = perm[0][(ix + 1) & 255]
    hy0 = perm[1][iy]
    hy1 = perm[1][(iy + 1) & 255]
    hz0 = perm[2][iz]
    hz1 = perm[2][(iz + 1) & 255]

    # Hermite smoothing (perlin.py:59-61).
    su = u * u * (3.0 - 2.0 * u)
    sv = v * v * (3.0 - 2.0 * v)
    sw = w * w * (3.0 - 2.0 * w)

    acc = 0.0
    for di, hx in ((0, hx0), (1, hx1)):
        wu = su if di else (1.0 - su)
        for dj, hy in ((0, hy0), (1, hy1)):
            wv = sv if dj else (1.0 - sv)
            for dk, hz in ((0, hz0), (1, hz1)):
                ww = sw if dk else (1.0 - sw)
                g = ranvec[hx ^ hy ^ hz]
                dot = (g[..., 0] * (u - di) + g[..., 1] * (v - dj)
                       + g[..., 2] * (w - dk))
                acc = acc + wu * wv * ww * dot
    return acc


def turb_s(ranvec: jax.Array, perm: jax.Array, px, py, pz,
           depth: int = 7):
    """Scalar-component fBm turbulence (perlin.py:74-83)."""
    acc = 0.0
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * noise_s(ranvec, perm, px, py, pz)
        weight = weight * 0.5
        px, py, pz = px * 2.0, py * 2.0, pz * 2.0
    return jnp.abs(acc)


# One-hot MXU contraction instead of row gathers for the 256-row Perlin
# tables (r5 on-chip A/B, bit-identical images): config-4 42.5 → 30.9
# ms/sample, flagship 103.6 → 97.5.  The 77 gathers/lane-eval of a
# 7-octave turbulence are per-row issue-bound; the one-hot trades them
# for VPU compares + skinny MXU matmuls.
USE_MXU_GATHER = True


def _rows_256(table, idx):
    """``moveaxis(table[idx], -1, 0)`` with an optional one-hot MXU path.

    Row gathers are per-row issue-bound (~1.7 ns/row); at the compacted
    rung widths the 77 gathers/lane of a 7-octave turbulence eval are the
    marble's whole cost.  The one-hot contraction trades them for VPU
    compares + a skinny matmul (`Precision.HIGHEST` keeps f32 exact — the
    r4 small-table lesson; perm values ≤ 255 are exact in f32 too).
    """
    if not USE_MXU_GATHER:
        return jnp.moveaxis(table[idx], -1, 0)
    oh = (idx[..., None] == jnp.arange(table.shape[0],
                                       dtype=idx.dtype)).astype(jnp.float32)
    out = jnp.tensordot(oh, table.astype(jnp.float32), axes=1,
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out.astype(table.dtype), -1, 0)


def _noise_t(ranvec, pair_x, pair_y, pair_z, px, py, pz):
    """Tile-batched gradient Perlin noise (the wavefront shading hot path).

    Same math as :func:`noise_s` but written for ≥2-D component arrays (the
    (R/128, 128) lane grid) and built ONLY from row gathers + one transpose
    each: on v5e, 1-D table gathers and per-component row slices both lower
    to cross-lane relayouts (measured 3.8x slower end to end).  The
    permutation tables are packed as (256, 2) ``[perm[i], perm[i+1]]`` rows
    so each axis costs one row gather instead of two 1-D gathers.
    """
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    u, v, w = px - fx, py - fy, pz - fz
    ix = fx.astype(jnp.int32) & 255
    iy = fy.astype(jnp.int32) & 255
    iz = fz.astype(jnp.int32) & 255
    hx = _rows_256(pair_x, ix)   # (2,) + shape
    hy = _rows_256(pair_y, iy)
    hz = _rows_256(pair_z, iz)

    su = u * u * (3.0 - 2.0 * u)
    sv = v * v * (3.0 - 2.0 * v)
    sw = w * w * (3.0 - 2.0 * w)

    acc = 0.0
    for di in (0, 1):
        wu = su if di else (1.0 - su)
        for dj in (0, 1):
            wv = sv if dj else (1.0 - sv)
            for dk in (0, 1):
                ww = sw if dk else (1.0 - sw)
                g = _rows_256(ranvec, hx[di] ^ hy[dj] ^ hz[dk])
                dot = (g[0] * (u - di) + g[1] * (v - dj) + g[2] * (w - dk))
                acc = acc + wu * wv * ww * dot
    return acc


def turb_t(ranvec: jax.Array, perm: jax.Array, px, py, pz,
           depth: int = 7):
    """Tile-batched fBm turbulence — bit-identical to :func:`turb_s`.

    ``px/py/pz`` should be ≥2-D (e.g. the (R/128, 128) lane grid).  The
    (256, 2) pair tables are derived here with ``roll``; they are
    loop-invariant so XLA hoists them out of any surrounding loop.
    """
    pairs = [jnp.stack([perm[ax], jnp.roll(perm[ax], -1)], axis=1)
             for ax in range(3)]
    acc = 0.0
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * _noise_t(ranvec, pairs[0], pairs[1], pairs[2],
                                      px, py, pz)
        weight = weight * 0.5
        px, py, pz = px * 2.0, py * 2.0, pz * 2.0
    return jnp.abs(acc)


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
    grads = ranvec[h][..., :3]  # (..., 8, 3)

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
