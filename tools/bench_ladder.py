"""The full BASELINE.json config ladder: ub + MEASURED Mrays/s per config.

The reference publishes a 3-point scene-complexity ladder
(/root/reference/docs/WAVEFRONT_USAGE.md:218-224); BASELINE.json grades five
configs.  ``bench.py`` (the driver metric) covers only the config-5 class —
this tool runs all five so a shading-, SSS-, DoF- or motion-blur-side
regression shows up as a throughput drop, not just a parity-test failure
(VERDICT r3 "What's missing" #1).

Usage:  python tools/bench_ladder.py [--spp-cap N] [--json out.json]
Run it via tools/tpu_worker.py for on-chip numbers.  "ub" counts rays the
reference's way (pixels x spp x max_depth, renderer.py:536-542); "measured"
counts TRUE traced segments from the engine's stats counters.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, scene_builder_name, W, H, spp, depth, queue, steps)
CONFIGS = [
    # 1: "wavefront_comparison scene: few spheres, Lambertian+Metal,
    #     200x150 @ 16 spp"
    ("1_wavefront_comparison", "wavefront_comparison", 200, 152, 16, 10,
     8192, 12),
    # 2: "Glass + emissive Cornell-style scene with depth-of-field,
    #     400x300 @ 64 spp"
    ("2_cornell_glass_dof", "cornell_glass_dof", 400, 300, 64, 20, 16384, 16),
    # 3: "Random-spheres scene (~500 prims) exercising SAH BVH + motion
    #     blur" (vol2_sec2_6 = the book's motion-blur random spheres)
    ("3_motion_blur_500", "vol2_sec2_6", 400, 224, 32, 16, 32768, 32),
    # 4: "OBJ mesh scene with Perlin textures and subsurface scattering"
    ("4_mesh_perlin_sss", "mesh_perlin_sss", 400, 224, 32, 12, 32768, 32),
    # 5: "vol2_final_scene: 1000+ objects with volumetric fog/smoke,
    #     800x600 @ 256 spp"
    ("5_vol2_final", "vol2_final_scene", 800, 600, 256, 10, 32768, 32),
]


def run_config(name, scene_name, W, H, spp, depth, queue, steps,
               spp_cap=None):
    import jax
    import jax.numpy as jnp

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import wavefront
    from path_tracer_tpu.ops.shade import SceneFlags
    from path_tracer_tpu.ops.types import RenderConfig

    spp = min(spp, spp_cap) if spp_cap else spp
    world, cam = pt.scenes.SCENES[scene_name]()
    cam.aspect_ratio = W / H
    cam.img_width = W
    cam.samples_per_pixel = spp
    cam.max_depth = depth

    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       max_depth=depth, stack_depth=32)
    key = jax.random.key(0)

    # Batched dispatch (see bench.py): the pool regenerates across sample
    # boundaries so the per-sample drain tail amortizes over the batch.
    nb = min(9, spp)
    run = lambda acc, s0, n: wavefront.render_batch(  # noqa: E731
        scene, flags, bvh, cam_a, cfg, acc, s0, n, key,
        queue_size=queue, steps_per_wave=steps)
    # Warm-up into a throwaway accumulator; the timed loop re-renders
    # samples 0..n_timed fresh so nothing is double-counted (ADVICE r4).
    run(jnp.zeros((H, W, 3), jnp.float32), 0, nb).block_until_ready()

    n_timed = max((spp // nb) * nb, nb)
    out = jnp.zeros((H, W, 3), jnp.float32)
    t0 = time.perf_counter()
    for i in range(n_timed // nb):
        out = run(out, i * nb, nb)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_timed

    import numpy as np
    assert np.isfinite(np.asarray(out)).all(), f"{name}: non-finite pixels"

    _, stats = wavefront.render_batch(
        scene, flags, bvh, cam_a, cfg, jnp.zeros((H, W, 3), jnp.float32),
        0, 1, key, queue_size=queue, steps_per_wave=steps, with_stats=True)
    segs = float(stats["rays"])
    walk = float(stats.get("walk_steps", 0.0))
    out = {
        "config": name,
        "scene": scene_name,
        "res": f"{W}x{H}",
        "spp": spp,
        "depth": depth,
        "ms_per_sample": round(dt * 1e3, 2),
        "mrays_ub": round(W * H * depth / dt / 1e6, 3),
        "mrays_measured": round(segs / dt / 1e6, 3),
        "segments_per_sample": int(segs),
    }
    if walk:
        # SSS walk steps are real executed work that "traced segments"
        # cannot see (VERDICT r4 #2) — reported on their own channel plus
        # a combined work rate so the SSS row is comparable.
        out["walk_steps_per_sample"] = int(walk)
        out["mwork_measured"] = round((segs + walk) / dt / 1e6, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp-cap", type=int, default=None,
                    help="cap per-config spp (timing is per-sample anyway)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for cfg in CONFIGS:
        r = run_config(*cfg, spp_cap=args.spp_cap)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print(f"\n{'config':24s} {'res':9s} {'ms/sample':>10s} "
          f"{'ub Mrays/s':>11s} {'measured':>9s}")
    for r in rows:
        print(f"{r['config']:24s} {r['res']:9s} {r['ms_per_sample']:10.2f} "
              f"{r['mrays_ub']:11.2f} {r['mrays_measured']:9.2f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
