"""Scaling-efficiency harness: rays/s at 1..N devices (BASELINE metric #3).

Measures `render_sharded` throughput over meshes of growing size and prints
per-size Mrays/s + efficiency vs. linear scaling from 1 device.  On real
hardware run it on a pod slice; in this repo's environment it runs on the
virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count),
which validates the harness and the sharding program, not ICI bandwidth.

Usage: python tools/bench_scaling.py [max_devices=8] [width=256] [engine=wavefront|megakernel]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={max_dev}")
        # Force the CPU mesh: the env pins JAX_PLATFORMS=axon (one real
        # chip), but this harness validates multi-device scaling shape.
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

    import time

    import jax

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops.shade import SceneFlags
    from path_tracer_tpu.ops.types import RenderConfig
    from path_tracer_tpu.parallel.render_dist import (
        make_mesh, render_sharded, render_sharded_wavefront)

    engine = sys.argv[3] if len(sys.argv) > 3 else "wavefront"

    world, cam = pt.scenes.wavefront_comparison()
    cam.img_width = width
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=width, height=int(width * 9 / 16),
                       samples_per_pixel=2, max_depth=8)
    key = jax.random.key(0)

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(max_dev, n_avail)]
    base_rate = None
    def run(mesh):
        if engine == "wavefront":
            return render_sharded_wavefront(scene, flags, bvh, cam_a, cfg,
                                            key, mesh, spp=2)
        return render_sharded(scene, flags, bvh, cam_a, cfg, key, mesh, 2)

    for n in sizes:
        mesh = make_mesh(n)
        out = run(mesh)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        out = run(mesh)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = cfg.width * cfg.height * 2 * cfg.max_depth / dt / 1e6
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(f"devices={n:2d}: {dt*1e3:8.1f} ms  {rate:7.2f} Mrays/s(ub)  "
              f"efficiency={eff:5.1%}")


if __name__ == "__main__":
    main()
