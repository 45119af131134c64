"""Microbenchmark: BVH traversal throughput on the current backend.

Usage: python tools/bench_traverse.py [n_rays] [scene] [--cpu]

Times the closest-hit query alone — the speed-of-light determinant
(SURVEY.md §7 hard parts) — in both forms:

* per-lane (``vmap(traverse_bvh)``): the megakernel-oracle layout;
* tile-batched (``closest_hit_batched``): the production layout the
  wavefront/tiled engines use (measured ~9-10× the per-lane form on v5e;
  docs/PERFORMANCE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import path_tracer_tpu as pt  # noqa: E402
from path_tracer_tpu import scenes as S  # noqa: E402
from path_tracer_tpu.ops import traverse  # noqa: E402
from path_tracer_tpu.ops.integrator_tiled import closest_hit_batched  # noqa: E402


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "wavefront_comparison"
    world, cam = S.SCENES[scene_name]()
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    print(f"scene={scene_name} nodes={bvh.nodes.shape[0]} rays={n_rays}",
          flush=True)

    key = jax.random.key(0)
    lookfrom = jnp.asarray(cam.lookfrom, jnp.float32)
    scale = float(jnp.maximum(1.0, jnp.linalg.norm(lookfrom))) or 10.0
    ro = lookfrom + jax.random.normal(key, (n_rays, 3)) * 0.1 * scale
    target = jax.random.uniform(jax.random.fold_in(key, 1), (n_rays, 3),
                                minval=-0.5, maxval=0.5) * scale
    rd = target - ro
    tm = jnp.zeros((n_rays,))

    def bench(name, fn):
        t0 = time.perf_counter()
        out = fn(ro, rd, tm)
        jax.block_until_ready(out)
        print(f"{name} compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(ro, rd, tm)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        hit_rate = float(jnp.mean(out[0].astype(jnp.float32)))
        print(f"{name} steady: {dt*1e3:.1f} ms  {n_rays/dt/1e6:.2f} Mtrav/s  "
              f"hit_rate={hit_rate:.2f}", flush=True)

    bench("tiled   ", jax.jit(lambda o, d, t: closest_hit_batched(
        bvh, o, d, t, jnp.full((n_rays,), 1e-3), 1e9, 48)))
    bench("per-lane", jax.jit(jax.vmap(lambda o, d, t: traverse.traverse_bvh(
        bvh, o, d, t, 1e-3, 1e9, 48))))


if __name__ == "__main__":
    main()
