"""Megakernel vs wavefront timing A/B harness.

The counterpart of the reference's comparison harnesses
(``scenes.py:1433-1547`` ``wavefront_comparison`` and ``:1256``
``vol2_final_scene_comparison``): renders the same scene with BOTH engines,
reports wall-clock / ms-per-sample / speedup, verifies the images agree
(the engines integrate the same sample set — the correctness oracle from
``docs/WAVEFRONT_USAGE.md:146-150``), and optionally saves both PNGs for
visual diff.

    python tools/bench_ab.py --scene wavefront_comparison --width 400 \
        --spp 8 --depth 10 [--cpu] [--save-dir /tmp/ab]

On the chip, run it through tools/tpu_worker.py to reuse the warm context.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(scene_name: str, width: int, spp: int, depth: int,
        save_dir: str | None = None, outlier_bound: float = 0.01) -> dict:
    import numpy as np

    import path_tracer_tpu as pt
    from path_tracer_tpu import scenes as S
    from path_tracer_tpu.utils.image import write_png

    builder = (S.SCENES[scene_name] if not scene_name.startswith("vol2_final_scene:")
               else (lambda: S.vol2_final_scene(
                   sphere_cluster=int(scene_name.split(":")[1]))))
    world, cam = builder()
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth

    results = {}
    images = {}
    for engine in ("megakernel", "wavefront"):
        r = pt.Renderer(world, cam, engine=engine, seed=0)
        r.render(spp=1, batch=1)            # warm-up / compile
        r2 = pt.Renderer(world, cam, engine=engine, seed=0)
        t0 = time.perf_counter()
        img = r2.render(spp=spp, batch=1)
        dt = time.perf_counter() - t0
        results[engine] = {
            "total_s": round(dt, 3),
            "ms_per_sample": round(1000 * dt / spp, 2),
            "mpix_per_s": round(width * r2.cfg.height * spp / dt / 1e6, 3),
            **{k: v for k, v in r2.stats.summary(r2.cfg).items()
               if k in ("mrays_per_s", "rays_traced", "mean_path_depth",
                        "mean_occupancy")},
        }
        images[engine] = np.asarray(img)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            write_png(os.path.join(save_dir, f"{scene_name}_{engine}.png"),
                      images[engine], 1)

    diff = np.abs(images["megakernel"] - images["wavefront"])
    results["speedup_wavefront"] = round(
        results["megakernel"]["total_s"] / results["wavefront"]["total_s"], 3)
    # Robust agreement: the engines integrate the same (sample, pixel) RNG
    # streams, but their compiled programs round differently at fusion
    # level, and a path tracer's trajectories are chaotic — isolated paths
    # flip a grazing hit / Schlick coin and move single pixels by whole
    # path quanta at low spp (the reference's own oracle is "identical
    # within noise", docs/WAVEFRONT_USAGE.md:146-150).  So: outlier pixels
    # are bounded, everything else must agree to float accumulation order.
    per_pix = diff.max(axis=-1)
    outliers = float((per_pix > 1e-3).mean())
    clean = per_pix[per_pix <= 1e-3]
    results["image_max_diff"] = float(diff.max())
    results["image_outlier_frac"] = round(outliers, 5)
    # Graded outlier spectrum: chaotic per-path flips (fog free-flight /
    # Schlick coins moved by fusion-level rounding) produce a long, thin
    # tail — a few % of pixels off by whole path quanta at low spp while
    # everything else matches to accumulation order.  A real physics bug
    # moves the bulk instead.
    results["image_outlier_frac_1e2"] = round(float((per_pix > 1e-2).mean()), 5)
    results["image_outlier_frac_1e1"] = round(float((per_pix > 1e-1).mean()), 5)
    results["image_clean_mean_diff"] = float(clean.mean()) if clean.size else 0.0
    results["images_agree"] = bool(
        outliers <= outlier_bound
        and (clean.size == 0 or clean.mean() < 1e-5))
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--scene", default="wavefront_comparison")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=10)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--outlier-bound", type=float, default=0.01,
                   help="max fraction of pixels allowed to differ > 1e-3 "
                        "(raise for volumetric scenes at low spp — fog "
                        "free-flight coins are chaotic per path)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = run(args.scene, args.width, args.spp, args.depth, args.save_dir,
              args.outlier_bound)
    print(json.dumps({"scene": args.scene, **out}, indent=2))
    return 0 if out["images_agree"] else 1


if __name__ == "__main__":
    sys.exit(main())
