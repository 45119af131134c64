"""Wavefront (breadth-first) engine with sort-free path regeneration.

The TPU-native re-design of the reference's wavefront kernel suite
(``kernels.py:1219-1418``: generate_camera_rays → intersect_rays →
shade_miss → shade_and_scatter → swap buffers, with ``ti.atomic_add`` queue
appends and a host-side scalar readback per bounce, renderer.py:305-332).

Redesign for XLA/TPU:

* **Fixed-capacity slot pool instead of growing queues.**  ``R`` path slots
  live in SoA arrays.  A slot is *occupied* while its path bounces; when the
  path dies its radiance is scatter-added into the accumulation image and the
  slot is refilled with the next (sample, pixel) primary ray.
* **Compaction without atomics.**  Refill targets are ranked with an
  exclusive prefix-sum over the empty-slot mask (replaces the reference's
  atomic ``next_ray_count`` append, kernels.py:1394) — deterministic and
  data-race-free by construction.
* **No host round-trips.**  The per-bounce ``active_ray_count`` readback
  (renderer.py:315) becomes the ``lax.while_loop`` condition on-device.
* **Path regeneration keeps occupancy ~100%**, where the reference's wave
  shrinks as paths die — this is why the wavefront engine beats the
  megakernel on deep scenes.

RNG keys are derived identically to the megakernel (fold base → sample →
pixel → bounce), so both engines integrate the *same* sample set: images
match to floating-point accumulation order.  That equivalence is a test.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as cam_ops
from .integrator import PathState, bounce_body, _init_state
from .types import RenderConfig


class WaveState(NamedTuple):
    path: PathState          # (R, ...) batched path state
    pixel: jax.Array         # (R,) int32 flat pixel index
    sample: jax.Array        # (R,) int32 sample index
    occupied: jax.Array      # (R,) bool — slot holds an unharvested path
    accum: jax.Array         # (H*W, 3) radiance sums
    spawned: jax.Array       # () int32 — primary rays issued so far
    done: jax.Array          # () int32 — paths finished


def _spawn_paths(cam, cfg: RenderConfig, base_key, state: WaveState,
                 start_sample, total):
    """Refill empty slots with the next primary rays (prefix-sum ranking)."""
    R = state.pixel.shape[0]
    npix = cfg.width * cfg.height

    empty = ~state.occupied
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # exclusive rank per empty slot
    new_id = state.spawned + rank
    can = empty & (new_id < total)

    s_idx = start_sample + new_id // npix
    pix = new_id % npix
    px = (pix % cfg.width).astype(jnp.float32)
    py = (pix // cfg.width).astype(jnp.float32)

    def make_ray(s, p, x, y):
        key_p = jax.random.fold_in(jax.random.fold_in(base_key, s), p)
        o, d, t = cam_ops.get_ray(cam, x, y, jax.random.fold_in(key_p, 7))
        return _init_state(o, d, t)

    fresh = jax.vmap(make_ray)(s_idx, pix, px, py)

    sel = lambda new, old: jnp.where(  # noqa: E731
        can.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
    path = jax.tree.map(sel, fresh, state.path)
    pixel = jnp.where(can, pix, state.pixel)
    sample = jnp.where(can, s_idx, state.sample)
    occupied = state.occupied | can
    spawned = state.spawned + jnp.minimum(
        jnp.sum(empty.astype(jnp.int32)), jnp.maximum(total - state.spawned, 0))
    return state._replace(path=path, pixel=pixel, sample=sample,
                          occupied=occupied, spawned=spawned)


@partial(jax.jit, static_argnames=("flags", "cfg", "n_samples", "queue_size"))
def render_batch(scene, flags, bvh, cam, cfg: RenderConfig, accum,
                 start_sample, n_samples: int, base_key,
                 queue_size: int = 32768):
    """Accumulate ``n_samples`` samples into ``accum`` (H, W, 3) sums."""
    npix = cfg.width * cfg.height
    total = n_samples * npix
    R = min(queue_size, total)

    # Dead initial pool: first wave spawns everything spawnable.
    init_path = jax.vmap(lambda _: _init_state(
        jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), jnp.zeros(())))(
            jnp.arange(R))
    init_path = init_path._replace(alive=jnp.zeros((R,), bool))
    st = WaveState(
        path=init_path,
        pixel=jnp.zeros((R,), jnp.int32),
        sample=jnp.zeros((R,), jnp.int32),
        occupied=jnp.zeros((R,), bool),
        accum=accum.reshape(npix, 3),
        spawned=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.int32),
    )

    def cond(s: WaveState):
        return (s.spawned < total) | jnp.any(s.occupied)

    def wave(s: WaveState):
        s = _spawn_paths(cam, cfg, base_key, s, start_sample, total)

        def one(path_lane, sample_lane, pix_lane):
            key_p = jax.random.fold_in(
                jax.random.fold_in(base_key, sample_lane), pix_lane)
            return bounce_body(scene, flags, bvh, cam, cfg, path_lane, key_p)

        bounced = jax.vmap(one)(s.path, s.sample, s.pixel)
        # Freeze unoccupied lanes (stale data must not resurrect).
        occ = s.occupied
        sel = lambda new, old: jnp.where(  # noqa: E731
            occ.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
        path = jax.tree.map(sel, bounced, s.path)

        # Retire: paths that terminated, ran out of scatter depth, or hit the
        # iteration budget (passthrough safety valve, cfg.iters).
        finished = occ & (~path.alive | (path.iters >= cfg.iters))
        contrib = jnp.where(finished[:, None], path.color, 0.0)
        accum2 = s.accum.at[s.pixel].add(contrib, mode="drop")
        return s._replace(path=path, occupied=occ & ~finished, accum=accum2,
                          done=s.done + jnp.sum(finished.astype(jnp.int32)))

    out = jax.lax.while_loop(cond, wave, st)
    return out.accum.reshape(cfg.height, cfg.width, 3)
