"""On-chip sweep of the wavefront pool size / steps-per-wave on the bench
config (vol2_final_scene, 800x450 @ 10 spp, depth 10).

Motivation (tools/bench_step_breakdown.py, recorded in PERFORMANCE.md): at
16384 lanes the traversal step costs ~4.5 ns/lane and is *insensitive to
removing any of its math* — the wave machine is per-step-overhead bound at
that batch; at 131072 lanes the same step costs 3.2 ns/lane and the math
shows up.  Bigger pools amortize the fixed per-step cost; the cost is tail
occupancy (360k paths/sample → a 65536 pool fills ~5.5 times).

    python tools/bench_queue_sweep.py [configs...]   e.g. 32768:16 65536:16
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import path_tracer_tpu as pt  # noqa: E402
from path_tracer_tpu import scenes  # noqa: E402
from path_tracer_tpu.ops import wavefront  # noqa: E402
from path_tracer_tpu.ops.shade import SceneFlags  # noqa: E402
from path_tracer_tpu.ops.types import RenderConfig  # noqa: E402

W, H, SPP, DEPTH = 800, 450, 10, 10


def run(scene, flags, bvh, cam_arrays, cfg, queue, steps):
    key = jax.random.key(0)
    accum = jnp.zeros((H, W, 3), jnp.float32)
    step = lambda acc, s0: wavefront.render_batch(  # noqa: E731
        scene, flags, bvh, cam_arrays, cfg, acc, s0, 1, key,
        queue_size=queue, steps_per_wave=steps)
    t0 = time.perf_counter()
    out = step(accum, 0)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in range(1, SPP):
        out = step(out, s)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    img = np.asarray(out) / SPP
    assert np.isfinite(img).all()
    mrays_ub = W * H * (SPP - 1) * DEPTH / dt / 1e6  # pixels x depth bound
    return mrays_ub, dt / (SPP - 1), compile_s, img


def main():
    cfgs = [tuple(map(int, a.split(":"))) for a in sys.argv[1:]] or [
        (16384, 16), (32768, 16), (65536, 16), (65536, 24)]
    world, cam = scenes.vol2_final_scene(sphere_cluster=1000)
    cam.aspect_ratio = W / H
    cam.img_width = W
    cam.samples_per_pixel = SPP
    cam.max_depth = DEPTH
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_arrays = cam.initialize()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       max_depth=DEPTH, stack_depth=32)
    ref_img = None
    for queue, steps in cfgs:
        mrays_ub, spsamp, comp, img = run(scene, flags, bvh, cam_arrays, cfg,
                                          queue, steps)
        if ref_img is None:
            ref_img = img
            agree = 0.0
        else:  # different pools reorder float accumulation only
            agree = float(np.abs(img - ref_img).mean())
        print(f"queue={queue:6d} steps={steps:2d}  {mrays_ub:6.2f} Mrays/s "
              f"(ub: pixels x depth — true segments are ~1/3 of that, see "
              f"bench.py mrays_measured)  {spsamp * 1e3:7.1f} ms/sample  "
              f"(compile {comp:.0f}s, mean|Δ|={agree:.2e})", flush=True)


if __name__ == "__main__":
    main()
