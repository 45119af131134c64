"""Command-line entry point: the reference's ``main.py`` (scene selector +
profiler) grown into a real CLI (SURVEY.md §5.6 — the reference has no CLI;
configuration meant editing source).

Usage::

    python -m path_tracer_tpu.render.cli --scene cornell_box --spp 64 \
        --width 400 --engine wavefront --out /tmp/cornell.png \
        --checkpoint /tmp/cornell.ckpt.npz --metrics /tmp/metrics.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="path-tracer-tpu",
        description="TPU-native differentiable path tracer")
    p.add_argument("--scene", default="vol2_test_scene",
                   help="scene name (see --list-scenes)")
    p.add_argument("--list-scenes", action="store_true")
    p.add_argument("--engine", default="wavefront",
                   choices=("megakernel", "wavefront"))
    p.add_argument("--width", type=int, default=None,
                   help="override image width")
    p.add_argument("--spp", type=int, default=None,
                   help="override samples per pixel")
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--batch", type=int, default=8,
                   help="samples per progressive batch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out.png", help="output image (.png/.ppm)")
    p.add_argument("--checkpoint", default=None,
                   help="progressive accumulation checkpoint path (.npz); "
                        "resumes if it exists")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint every N samples (0 = only at end)")
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    # Wavefront tuning knobs (default: the per-scene heuristic; the tuned
    # values behind it are in docs/PERFORMANCE.md).
    p.add_argument("--queue-size", type=int, default=None,
                   help="wavefront slot-pool size (default: auto)")
    p.add_argument("--steps-per-wave", type=int, default=None,
                   help="suspended-traversal steps per wave (default: auto)")
    p.add_argument("--autotune", action="store_true",
                   help="measure-and-pick wavefront pool parameters for "
                        "this scene before rendering (one timed sample per "
                        "candidate; presets are candidates too)")
    p.add_argument("--sample-stride", type=int, default=None,
                   help="in-slot samples per work item (multi-sample "
                        "accumulation window; default: engine heuristic)")
    p.add_argument("--ctrl-den", type=int, default=None,
                   help="control-step density knob (default: auto)")
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace into this directory")
    # Multi-host (SURVEY.md §2.8): every process runs the same command with
    # its own --process-id; process 0 hosts the coordinator and writes --out.
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address (multi-host)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--local-devices", type=int, default=None,
                   help="virtual CPU devices per process (multi-host CPU "
                        "testing; leave unset on real TPU hosts)")
    return p


def _main_distributed(args, world, cam) -> int:
    """Multi-host render: join the job, render DP over the global mesh,
    process 0 writes the image (and .npz of the raw floats if requested)."""
    import json

    import jax
    import numpy as np

    from ..parallel import render_dist
    from ..utils.image import write_png, write_ppm

    render_dist.init_distributed(args.coordinator, args.num_processes,
                                 args.process_id,
                                 local_devices=args.local_devices)
    print(f"process {jax.process_index()}/{jax.process_count()} up: "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          "devices", flush=True)
    try:
        img = render_dist.render_distributed(
            world, cam, spp=args.spp, seed=args.seed,
            checkpoint_path=args.checkpoint,
            checkpoint_every=args.checkpoint_every, batch=args.batch)
    except KeyboardInterrupt:
        # Preempted: the checkpoint was saved inside render_distributed;
        # a restarted job with the same flags resumes from it.
        print("interrupted — checkpoint saved", flush=True)
        jax.distributed.shutdown()
        return 130
    if jax.process_index() == 0:
        if args.out.endswith(".npz"):
            np.savez(args.out, img=img)
        elif args.out.endswith(".ppm"):
            write_ppm(args.out, img, 1)
        else:
            write_png(args.out, img, 1)
        print(json.dumps({"out": args.out, "processes": jax.process_count(),
                          "devices": jax.device_count()}))
    jax.distributed.shutdown()
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .. import scenes as scene_mod
    from .renderer import Renderer

    if args.list_scenes:
        for name in sorted(scene_mod.SCENES):
            print(name)
        return 0

    if args.scene not in scene_mod.SCENES:
        print(f"unknown scene {args.scene!r}; use --list-scenes", file=sys.stderr)
        return 2

    world, cam = scene_mod.SCENES[args.scene]()
    if args.width:
        cam.img_width = args.width
    if args.spp:
        cam.samples_per_pixel = args.spp
    if args.max_depth:
        cam.max_depth = args.max_depth

    if args.coordinator:
        return _main_distributed(args, world, cam)

    cfg = None
    if (args.queue_size or args.steps_per_wave or args.ctrl_den
            or args.sample_stride):
        from ..ops.types import RenderConfig
        cfg = RenderConfig(
            width=cam.img_width, height=cam.img_height,
            samples_per_pixel=cam.samples_per_pixel,
            max_depth=cam.max_depth, queue_size=args.queue_size,
            steps_per_wave=args.steps_per_wave, ctrl_den=args.ctrl_den,
            sample_stride=args.sample_stride)
    r = Renderer(world, cam, engine=args.engine, seed=args.seed, cfg=cfg)
    print(f"scene={args.scene} {r.cfg.width}x{r.cfg.height} "
          f"spp={cam.samples_per_pixel} engine={args.engine} "
          f"setup={r.setup_times}", flush=True)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    r.render(batch=args.batch, checkpoint_path=args.checkpoint,
             checkpoint_every=args.checkpoint_every,
             metrics_path=args.metrics, verbose=True,
             autotune=args.autotune)
    if args.profile:
        jax.profiler.stop_trace()

    r.write_image(args.out)
    print(json.dumps({"out": args.out, **r.stats.summary(r.cfg)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
