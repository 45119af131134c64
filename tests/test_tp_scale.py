"""Tensor-parallel mode at non-toy scale (VERDICT r4 #7).

`parallel/scene_shard.py`'s stated reason to exist is scenes that outgrow
one chip's HBM; the r4 tests only exercised it at 16×16/60-prim toy scale.
Here a ~100k-triangle torus knot (the task-4 high-poly generator cranked
up) is sharded 8 ways on the virtual CPU mesh: the TP render must equal
the replicated megakernel at 64×64, and the shard balance (per-shard prim
counts and per-shard BVH depths) is computed and bounded.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.models.geometry import torus_knot
from path_tracer_tpu.ops import bvh_build, integrator
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import BVH_NONE, RenderConfig
from path_tracer_tpu.parallel.render_dist import make_mesh
from path_tracer_tpu.parallel.scene_shard import render_tp, shard_scene

N_SHARDS = 8


@pytest.fixture(scope="module")
def big_scene():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, -1000, 0), 1000,
                               pt.Lambertian((0.5, 0.5, 0.5))))
    # 400 x 128 x 2 = 102,400 triangles.
    w.add(torus_knot(pt.Metal((0.75, 0.65, 0.5), 0.05), segments=400,
                     sides=128, tube_radius=0.35, center=(0.0, 1.6, 0.0)))
    w.add(pt.Sphere.stationary((0, 7, 4), 2.0, pt.DiffuseLight((6, 6, 6))))
    scene = pt.compile_scene(w)
    return scene, SceneFlags.from_scene(scene)


def test_tp_100k_matches_replicated(big_scene):
    scene, flags = big_scene
    assert int(np.asarray(scene.tr_valid).sum()) >= 100_000
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 64
    cam.vfov = 35
    cam.lookfrom = np.array([9.0, 4.5, 7.0])
    cam.lookat = np.array([0.0, 1.4, 0.0])
    cam_a = cam.initialize()
    cfg = RenderConfig(width=64, height=64, samples_per_pixel=1, max_depth=4)
    key = jax.random.key(11)

    mesh = make_mesh(N_SHARDS, axis="t")
    scene_tp, bvh_tp = shard_scene(scene, N_SHARDS)
    tp = render_tp(scene_tp, flags, bvh_tp, cam_a, cfg, key, mesh, spp=1)

    bvh = pt.build_from_scene(scene)
    single = integrator.render(scene, flags, bvh, cam_a, cfg, key, spp=1)

    tp, single = np.asarray(tp), np.asarray(single)
    assert np.isfinite(tp).all()
    # Same sample set on both paths; isolated closest-hit ties on the dense
    # mesh may flip single pixels (same tolerance story as test_golden).
    d = np.abs(tp - single).max(axis=-1)
    assert (d > 1e-4).mean() <= 0.01, (d > 1e-4).mean()
    assert float(d[d <= 1e-4].mean()) < 1e-6


def _flat_depth(flat):
    """Max depth of a FlatBVH via iterative child walk (host-side)."""
    left = np.asarray(flat.left)
    right = np.asarray(flat.right)
    depth = 0
    frontier = [0]
    while frontier:
        depth += 1
        nxt = []
        for n in frontier:
            for c in (left[n], right[n]):
                if c != BVH_NONE and c >= 0:
                    nxt.append(int(c))
        frontier = nxt
        assert depth < 200, "cycle or absurd depth in shard BVH"
    return depth


def test_tp_100k_shard_balance(big_scene):
    """Round-robin dealing must balance prims near-perfectly, and every
    shard's BVH must stay within a sane depth of the ideal (report both)."""
    scene, _flags = big_scene
    scene_tp, _bvh_tp = shard_scene(scene, N_SHARDS)

    counts, depths = [], []
    for s in range(N_SHARDS):
        shard = jax.tree.map(lambda x: np.asarray(x)[s], scene_tp)
        n = (int(shard.sph_valid.sum()) + int(shard.qd_valid.sum())
             + int(shard.tr_valid.sum()))
        counts.append(n)
        scene_np = {k: np.asarray(getattr(shard, k)) for k in (
            "sph_valid", "sph_c0", "sph_c1", "sph_rad",
            "qd_valid", "qd_q", "qd_u", "qd_v",
            "tr_valid", "tr_v0", "tr_e1", "tr_e2")}
        flat = bvh_build.build_bvh(*bvh_build.primitive_aabbs(scene_np),
                                   leaf_cap=4)
        depths.append(_flat_depth(flat))

    counts = np.asarray(counts)
    depths = np.asarray(depths)
    total = int(np.asarray(scene.sph_valid).sum()
                + np.asarray(scene.qd_valid).sum()
                + np.asarray(scene.tr_valid).sum())
    print(f"TP balance over {N_SHARDS} shards of {total} prims: "
          f"counts={counts.tolist()} depths={depths.tolist()}")
    assert counts.sum() == total
    # Round-robin: perfect balance up to one primitive.
    assert counts.max() - counts.min() <= 1
    # Tree quality: within 2x the ideal log2 depth on every shard.
    ideal = np.log2(max(counts.max(), 2))
    assert depths.max() <= 2 * ideal + 8, (depths.max(), ideal)
