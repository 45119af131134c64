"""Renderer facade: progressive accumulation, checkpoint/resume, image I/O,
scene compile integrity."""
import os

import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops.types import (MAT_DIELECTRIC, MAT_EMISSIVE,
                                       MAT_LAMBERTIAN, MAT_METAL,
                                       MAT_SSS_VOLUMETRIC, TEX_CHECKER,
                                       TEX_NOISE, TEX_SOLID)


def _tiny_cam(w=32, h_ratio=2.0, spp=4, depth=6):
    cam = pt.Camera()
    cam.aspect_ratio = h_ratio
    cam.img_width = w
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    return cam


def _world():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.8, 0.8, 0.0))))
    return w


def test_progressive_equals_oneshot():
    """4 spp in two batches == 4 spp in one batch (same base key)."""
    a = pt.Renderer(_world(), _tiny_cam(), seed=1)
    img_a = a.render(spp=4, batch=4)
    b = pt.Renderer(_world(), _tiny_cam(), seed=1)
    b.render(spp=2, batch=2)
    img_b = b.render(spp=4, batch=2)
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "accum.npz")
    a = pt.Renderer(_world(), _tiny_cam(), seed=2)
    a.render(spp=2, batch=2, checkpoint_path=ckpt, checkpoint_every=1)
    assert os.path.exists(ckpt)
    # Fresh renderer resumes from the checkpoint and finishes to 4 spp.
    b = pt.Renderer(_world(), _tiny_cam(), seed=2)
    img_b = b.render(spp=4, batch=2, checkpoint_path=ckpt)
    assert b.samples_done == 4
    c = pt.Renderer(_world(), _tiny_cam(), seed=2)
    img_c = c.render(spp=4, batch=2)
    np.testing.assert_allclose(img_b, img_c, atol=1e-6)


def test_checkpoint_rejects_different_scene(tmp_path):
    """Resuming a checkpoint from a different scene at the same resolution
    must fail loudly (scene/config fingerprint), not silently blend."""
    ckpt = str(tmp_path / "accum.npz")
    a = pt.Renderer(_world(), _tiny_cam(), seed=2)
    a.render(spp=2, batch=2, checkpoint_path=ckpt)
    other = pt.HittableList()
    other.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Metal((1, 1, 1), 0.0)))
    b = pt.Renderer(other, _tiny_cam(), seed=2)
    with pytest.raises(ValueError, match="fingerprint"):
        b.load_checkpoint(ckpt)
    # Same scene but different camera also refuses.
    cam2 = _tiny_cam()
    cam2.vfov = 55
    c = pt.Renderer(_world(), cam2, seed=2)
    with pytest.raises(ValueError, match="fingerprint"):
        c.load_checkpoint(ckpt)


def test_write_png_ppm(tmp_path):
    r = pt.Renderer(_world(), _tiny_cam(w=16), seed=0)
    r.render(spp=1, batch=1)
    png = str(tmp_path / "out.png")
    ppm = str(tmp_path / "out.ppm")
    r.write_image(png)
    r.write_image(ppm)
    from PIL import Image

    im = np.asarray(Image.open(png))
    assert im.shape == (8, 16, 3)
    with open(ppm) as f:
        assert f.readline().strip() == "P3"


def test_metrics_jsonl(tmp_path):
    import json

    path = str(tmp_path / "metrics.jsonl")
    r = pt.Renderer(_world(), _tiny_cam(w=16), seed=0)
    r.render(spp=2, batch=1, metrics_path=path)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[-1]["samples_done"] == 2
    assert lines[-1]["mpix_per_s"] > 0


def test_engines_agree_via_facade():
    cam = _tiny_cam()
    m = pt.Renderer(_world(), cam, engine="megakernel", seed=3)
    img_m = m.render(spp=4)
    w = pt.Renderer(_world(), cam, engine="wavefront", seed=3)
    img_w = w.render(spp=4)
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)
    # Engine-independent MEASURED stats (VERDICT r2 #7): both engines count
    # the same true traced segments for the same seed, and the depth
    # histograms agree (the reference's counters were compiled out,
    # kernels.py:1189-1202).
    assert m.stats.rays == w.stats.rays > 0
    assert m.stats.paths == w.stats.paths > 0
    assert m.stats.depth_sum == w.stats.depth_sum
    np.testing.assert_array_equal(m.stats.depth_hist, w.stats.depth_hist)


def test_autotune_picks_candidate_and_preserves_image():
    """autotune returns a (queue, steps, ctrl_den) candidate and the tuned
    render integrates the SAME sample set (pool size only reorders float
    accumulation — RNG keys fold the global pixel id)."""
    cam = _tiny_cam()
    base = pt.Renderer(_world(), cam, engine="wavefront", seed=5)
    img_base = base.render(spp=4, batch=4)
    tuned = pt.Renderer(_world(), cam, engine="wavefront", seed=5)
    q, s, d, stride = tuned.autotune()
    assert q > 0 and s > 0 and d > 0
    assert stride is None or stride >= 1
    assert tuned._tuned == (q, s, d, stride)
    img_tuned = tuned.render(spp=4, batch=4)
    np.testing.assert_allclose(img_tuned, img_base, atol=1e-5)


def test_autotune_honors_pinned_values():
    """User-pinned queue_size/steps_per_wave/ctrl_den constrain EVERY
    candidate (an unpinned half previously overrode the tuned pair so the
    timings measured a config never used — ADVICE r3 #4)."""
    from path_tracer_tpu.ops.types import RenderConfig

    cam = _tiny_cam()
    cfg = RenderConfig(width=cam.img_width, height=cam.img_height,
                       samples_per_pixel=4, max_depth=cam.max_depth,
                       queue_size=512, ctrl_den=4)
    r = pt.Renderer(_world(), cam, engine="wavefront", cfg=cfg, seed=5)
    q, s, d, _stride = r.autotune()
    assert q == 512 and d == 4
    assert s > 0


# --- scene compiler integrity -------------------------------------------


def test_compile_dedups_materials():
    shared = pt.Lambertian((0.5, 0.5, 0.5))
    w = pt.HittableList()
    for i in range(10):
        w.add(pt.Sphere.stationary((i, 0, 0), 0.4, shared))
    scene = pt.compile_scene(w)
    # One shared material → all spheres share index 0.
    assert np.asarray(scene.sph_mat)[:10].max() == 0
    assert int(np.asarray(scene.sph_valid).sum()) == 10


def test_compile_material_enums():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, 0), 1, pt.Lambertian((1, 0, 0))))
    w.add(pt.Sphere.stationary((2, 0, 0), 1, pt.Metal((1, 1, 1), 0.5)))
    w.add(pt.Sphere.stationary((4, 0, 0), 1, pt.Dielectric(1.5)))
    w.add(pt.Sphere.stationary((6, 0, 0), 1, pt.DiffuseLight((5, 5, 5))))
    w.add(pt.Sphere.stationary((8, 0, 0), 1,
                               pt.SubsurfaceVolumetric((1, 1, 1), 0.1, 0.2, 0.3)))
    scene = pt.compile_scene(w)
    mt = np.asarray(scene.mat_type)
    assert list(mt[:5]) == [MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC,
                            MAT_EMISSIVE, MAT_SSS_VOLUMETRIC]
    assert np.isclose(float(np.asarray(scene.mat_fuzz)[1]), 0.5)
    assert np.isclose(float(np.asarray(scene.mat_ir)[2]), 1.5)
    g = np.asarray(scene.mat_g)[4]
    assert np.isclose(float(g), 0.3)


def test_compile_mesh_and_klein_flatten_to_triangles(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")
    w = pt.HittableList()
    w.add(pt.Mesh(str(obj), pt.Lambertian((0.5, 0.5, 0.5))))
    w.add(pt.KleinBottle((0, 0, 0), 1.0, pt.Lambertian((0.1, 0.2, 0.3)),
                         u_steps=4, v_steps=4))
    scene = pt.compile_scene(w)
    n_tris = int(np.asarray(scene.tr_valid).sum())
    # Quad face → 2 fan triangles; Klein 4x4 patches → ≤32 tris (degenerate
    # patches are dropped).
    assert n_tris >= 2 + 20
    assert np.isfinite(np.asarray(scene.tr_v0)).all()


def test_compile_medium_registry():
    w = pt.HittableList()
    slab = pt.box((0, 0, 0), (1, 1, 1), pt.Lambertian((1, 1, 1)))
    w.add(pt.ConstantMedium.from_color(slab, (0.5, 0.5, 0.5), 0.25))
    w.add(pt.Sphere.stationary((5, 0, 0), 1, pt.Lambertian((1, 0, 0))))
    scene = pt.compile_scene(w)
    qm = np.asarray(scene.qd_medium)
    assert (qm[:6] == 0).all()          # all six box quads flagged
    assert np.asarray(scene.sph_medium)[0] == -1
    assert np.isclose(float(np.asarray(scene.med_density)[0]), 0.25)


def test_all_scene_builders_compile():
    """Every catalog scene compiles + builds a BVH (tiny variants)."""
    from path_tracer_tpu import scenes as S

    small = {
        "vol2_final_scene": lambda: S.vol2_final_scene(sphere_cluster=30),
        "vol1_sec14_1": lambda: S.vol1_sec14_1(),
    }
    for name, fn in S.SCENES.items():
        fn = small.get(name, fn)
        world, cam = fn()
        scene = pt.compile_scene(world)
        bvh = pt.build_from_scene(scene)
        assert np.isfinite(np.asarray(bvh.nodes)).all(), name
        assert np.isfinite(np.asarray(bvh.prims)).all(), name


def test_orbit_camera_and_restart():
    """Orbit control + progressive restart (interactive_viewer.py:101-149
    without the GUI): rotating preserves the orbit radius, clamps pitch,
    changes the view, and restart() integrates the new view from sample 0."""
    from path_tracer_tpu.render.orbit import OrbitCamera, restart

    cam = _tiny_cam()
    cam.lookfrom = np.array([0.0, 0.0, 3.0])
    cam.lookat = np.array([0.0, 0.0, -1.0])
    r = pt.Renderer(_world(), cam, engine="wavefront", seed=4)
    img_a = r.render(spp=2, batch=2)

    orbit = OrbitCamera(cam)
    r0 = orbit.radius
    orbit.rotate(120.0, -40.0)
    assert np.isclose(np.linalg.norm(cam.lookfrom - cam.lookat), r0)
    # Extreme drag clamps elevation at +/-89 deg (no gimbal flip).
    orbit.rotate(0.0, 10000.0)
    off = cam.lookfrom - cam.lookat
    phi = np.degrees(np.arcsin(off[1] / np.linalg.norm(off)))
    assert abs(phi) <= 89.0 + 1e-6
    orbit.zoom(0.5)
    assert np.isclose(np.linalg.norm(cam.lookfrom - cam.lookat), r0 / 2)

    restart(r)
    assert r.samples_done == 0
    img_b = r.render(spp=2, batch=2)
    assert r.samples_done == 2
    assert np.isfinite(img_b).all()
    assert float(np.abs(img_b - img_a).max()) > 1e-3  # view really moved
