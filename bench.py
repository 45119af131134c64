"""Benchmark: Mrays/s on the vol2_final_scene family (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference megakernel renders its complex scene (1000 spheres,
800x450 @ 10 spp, max_depth ~10) in 45.2 s on an M2 Max
(docs/WAVEFRONT_USAGE.md:224) ≈ 0.80 Mrays/s counting primary×depth rays the
way the reference does (renderer.py:536-542: rays = pixels × spp × depth).
``vs_baseline`` = our Mrays/s / 0.80.

Rays here are *counted* the same way for comparability (upper-bound rays),
on the reference's own headline config class: the 1000+-object final scene.
"""
from __future__ import annotations

import json
import time

BASELINE_MRAYS = 0.80  # reference complex-scene megakernel (45.2s, see above)


def _run_config(scene_builder, width, height, spp, depth, queue, steps,
                batch=9):
    import jax
    import numpy as np

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import wavefront
    from path_tracer_tpu.ops.shade import SceneFlags
    from path_tracer_tpu.ops.types import RenderConfig

    world, cam = scene_builder()
    cam.aspect_ratio = width / height
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth

    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_arrays = cam.initialize()
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       max_depth=depth, stack_depth=32)
    key = jax.random.key(0)

    accum = jax.numpy.zeros((height, width, 3), jax.numpy.float32)
    # Batched dispatch (n samples per execution, bounded well under the TPU
    # runtime's ~70 s single-execution limit): the slot pool regenerates
    # ACROSS sample boundaries, so the drain tail — occupancy falling as the
    # last paths of a sample finish — is paid once per batch instead of once
    # per sample (r4 A/B: 151.5 -> 132.4 ms/sample on this scene).
    nb = min(batch, max(spp - 1, 1))
    run = lambda acc, s0, n: wavefront.render_batch(  # noqa: E731
        scene, flags, bvh, cam_arrays, cfg, acc, s0, n, key,
        queue_size=queue, steps_per_wave=steps)

    # Warm-up / compile (renderer.py:378-387 does the same for Taichi JIT)
    # into a THROWAWAY accumulator: the timed loop then renders samples
    # 0..n_timed into a fresh one, so img integrates each sample exactly
    # once (the old overlap double-counted the warm-up samples).
    run(accum, 0, nb).block_until_ready()

    n_timed = max((spp // nb) * nb, nb)
    out = accum
    t0 = time.perf_counter()
    for i in range(n_timed // nb):
        out = run(out, i * nb, nb)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    rays = width * height * n_timed * depth  # reference-style upper bound
    mrays = rays / dt / 1e6
    img = np.asarray(out) / n_timed
    assert np.isfinite(img).all(), "non-finite pixels in bench render"

    # Measured (not upper-bound) throughput: one instrumented sample counts
    # the TRUE traced segments (RR + background misses shorten paths, so
    # this is honest where rays = pixels x depth is not).
    _, stats = wavefront.render_batch(
        scene, flags, bvh, cam_arrays, cfg,
        jax.numpy.zeros((height, width, 3), jax.numpy.float32), 0, 1, key,
        queue_size=queue, steps_per_wave=steps, with_stats=True)
    mrays_meas = int(stats["rays"]) * n_timed / dt / 1e6
    return mrays, mrays_meas


def main():
    import jax

    # Persistent compile cache: the driver runs this in a fresh process; a
    # cold remote compile of the wavefront program costs minutes, a cache
    # hit seconds.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from path_tracer_tpu import scenes

    degraded = False
    try:
        mrays, mrays_meas = _run_config(
            lambda: scenes.vol2_final_scene(sphere_cluster=1000),
            800, 450, 10, 10, queue=32768, steps=32)
        metric = "mrays_per_s_chip_vol2_final"
    except Exception:  # device hiccup: report the smaller config, LOUDLY
        import traceback
        traceback.print_exc()
        print("# vol2_final FAILED; falling back to the toy config — this "
              "result is DEGRADED", flush=True)
        degraded = True
        mrays, mrays_meas = _run_config(scenes.wavefront_comparison,
                                        400, 225, 8, 10, queue=4096, steps=6)
        metric = "mrays_per_s_chip_wavefront_comparison"

    result = {
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        # True traced segments per second (the ub value assumes every path
        # reaches max_depth; RR + misses mean real paths average ~3.4
        # segments on this scene — see docs/PERFORMANCE.md roofline).
        "mrays_measured": round(mrays_meas, 3),
    }
    if degraded:
        result["degraded"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
