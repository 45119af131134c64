"""Constant-medium (volumetric) statistical tests.

Validates Beer–Lambert transmittance through the integrator end-to-end —
a quantitative upgrade over the reference's eyeball smoke test
(tests/test_smoke.py)."""
import jax
import numpy as np

import path_tracer_tpu as pt
from path_tracer_tpu.ops import integrator
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig


def _slab_scene(density):
    """Black-smoke slab of thickness 10 in front of a white emissive wall."""
    w = pt.HittableList()
    wall = pt.Quad((-50, -50, -20), (100, 0, 0), (0, 100, 0),
                   pt.DiffuseLight((1, 1, 1)))
    w.add(wall)
    slab = pt.box((-30, -30, -10), (30, 30, 0), pt.Lambertian((1, 1, 1)))
    w.add(pt.ConstantMedium.from_color(slab, (0, 0, 0), density))
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 24
    cam.vfov = 10
    cam.lookfrom = np.array([0.0, 0.0, 20.0])
    cam.lookat = np.array([0.0, 0.0, 0.0])
    cam.background = np.zeros(3)
    scene = pt.compile_scene(w)
    return scene, SceneFlags.from_scene(scene), pt.build_from_scene(scene), \
        cam.initialize()


def test_beer_lambert_transmittance():
    """Mean image ≈ exp(-density * thickness): black smoke absorbs the rest.

    Thickness 10 along the view axis; scattered rays hit black-albedo smoke
    and die, so only un-scattered rays carry the wall's unit radiance
    (constant_medium.py:31-56 sampling).
    """
    for density, tol in ((0.05, 0.05), (0.15, 0.05)):
        scene, flags, bvh, cam_a = _slab_scene(density)
        cfg = RenderConfig(width=24, height=24, samples_per_pixel=48,
                           max_depth=8)
        img = np.asarray(integrator.render(scene, flags, bvh, cam_a, cfg,
                                           jax.random.key(0)))
        expected = np.exp(-density * 10.0)
        assert abs(img.mean() - expected) < tol, (density, img.mean(), expected)


def test_scattering_medium_glows():
    """White-albedo smoke in front of a light scatters light toward the
    camera: brighter than the black-smoke transmittance-only image."""
    w = pt.HittableList()
    w.add(pt.Quad((-50, -50, -20), (100, 0, 0), (0, 100, 0),
                  pt.DiffuseLight((1, 1, 1))))
    slab = pt.box((-30, -30, -10), (30, 30, 0), pt.Lambertian((1, 1, 1)))
    w.add(pt.ConstantMedium.from_color(slab, (1, 1, 1), 0.15))
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 24
    cam.vfov = 10
    cam.lookfrom = np.array([0.0, 0.0, 20.0])
    cam.lookat = np.array([0.0, 0.0, 0.0])
    cam.background = np.zeros(3)
    scene = pt.compile_scene(w)
    flags = SceneFlags.from_scene(scene)
    bvh = pt.build_from_scene(scene)
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=32, max_depth=16)
    img = np.asarray(integrator.render(scene, flags, bvh, cam_a := cam.initialize(),
                                       cfg, jax.random.key(0)))
    assert img.mean() > np.exp(-0.15 * 10.0) + 0.02
    assert np.isfinite(img).all()


def test_inside_origin_fog_transmittance():
    """Rays born INSIDE a medium sample the [origin, exit] chord — the CPU
    oracle's universe-interval behavior (constant_medium.py:33-36), which
    the reference GPU lacks.  Camera at the center of a fog sphere facing a
    unit wall: transmittance == exp(-density * radius)."""
    w = pt.HittableList()
    w.add(pt.Quad((-50, -50, -30), (100, 0, 0), (0, 100, 0),
                  pt.DiffuseLight((1, 1, 1))))
    w.add(pt.ConstantMedium.from_color(
        pt.Sphere.stationary((0, 0, 0), 20.0, pt.Dielectric(1.5)),
        (0, 0, 0), 0.05))
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 12
    cam.vfov = 10
    cam.lookfrom = np.array([0.0, 0.0, 0.0])
    cam.lookat = np.array([0.0, 0.0, -1.0])
    cam.background = np.zeros(3)
    scene = pt.compile_scene(w)
    flags = SceneFlags.from_scene(scene)
    bvh = pt.build_from_scene(scene)
    cfg = RenderConfig(width=12, height=12, samples_per_pixel=64, max_depth=6)
    img = np.asarray(integrator.render(scene, flags, bvh, cam.initialize(),
                                       cfg, jax.random.key(0)))
    assert abs(img.mean() - np.exp(-20 * 0.05)) < 0.04


def test_cornell_smoke_scene_renders():
    world, cam = pt.scenes.cornell_smoke()
    cam.img_width = 32
    scene = pt.compile_scene(world)
    flags = SceneFlags.from_scene(scene)
    assert flags.has_medium
    bvh = pt.build_from_scene(scene)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=4, max_depth=12)
    img = np.asarray(integrator.render(scene, flags, bvh, cam.initialize(),
                                       cfg, jax.random.key(0)))
    assert np.isfinite(img).all()
    assert img.mean() > 0.005  # light reaches the camera through the smoke
