"""Integrator-level tests: physics sanity, determinism, engine equivalence.

The reference's oracle is "megakernel and wavefront produce identical images
within noise" (docs/WAVEFRONT_USAGE.md:146-150); here all three pairs must
agree: while-loop megakernel ≡ scan megakernel (differentiable) ≡ wavefront.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops import integrator, wavefront
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig


def _setup(world, cam):
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    return scene, flags, bvh, cam.initialize()


def _simple_world():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.8, 0.8, 0.0))))
    w.add(pt.Sphere.stationary((1, 0, -1), 0.5, pt.Metal((0.8, 0.6, 0.2), 0.3)))
    w.add(pt.Sphere.stationary((-1, 0, -1), 0.5, pt.Dielectric(1.5)))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 64
    cam.max_depth = 8
    return w, cam


CFG = RenderConfig(width=64, height=32, samples_per_pixel=4, max_depth=8)


def test_background_only():
    """Rays missing everything return the gradient sky exactly."""
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, -2000, 0), 1.0, pt.Lambertian((1, 0, 0))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 64
    scene, flags, bvh, cam_a = _setup(w, cam)
    img = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(0))
    img = np.asarray(img)
    # Sky gradient: white-ish at bottom, blue-ish at top; blue channel
    # dominates red everywhere (color = lerp(white, (.5,.7,1))).
    assert np.all(img[..., 2] >= img[..., 0] - 1e-6)
    assert img.min() > 0.4
    assert np.isfinite(img).all()


def test_render_deterministic():
    w, cam = _simple_world()
    scene, flags, bvh, cam_a = _setup(w, cam)
    a = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(5))
    b = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(6))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_scan_matches_while():
    """Differentiable scan driver ≡ while-loop driver (same keys)."""
    w, cam = _simple_world()
    scene, flags, bvh, cam_a = _setup(w, cam)
    a = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(1),
                          differentiable=False)
    b = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(1),
                          differentiable=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_wavefront_matches_megakernel():
    w, cam = _simple_world()
    scene, flags, bvh, cam_a = _setup(w, cam)
    mega = integrator.render(scene, flags, bvh, cam_a, CFG, jax.random.key(2))
    accum = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    wave = wavefront.render_batch(scene, flags, bvh, cam_a, CFG, accum, 0,
                                  CFG.samples_per_pixel, jax.random.key(2),
                                  queue_size=512)
    np.testing.assert_allclose(np.asarray(mega),
                               np.asarray(wave) / CFG.samples_per_pixel,
                               atol=2e-5)


def test_wavefront_small_queue_conserves_paths():
    """A queue far smaller than total paths must still trace every path."""
    w, cam = _simple_world()
    scene, flags, bvh, cam_a = _setup(w, cam)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=4, max_depth=6)
    accum = jnp.zeros((8, 16, 3), jnp.float32)
    a = wavefront.render_batch(scene, flags, bvh, cam_a, cfg, accum, 0, 4,
                               jax.random.key(3), queue_size=64)
    b = wavefront.render_batch(scene, flags, bvh, cam_a, cfg, accum, 0, 4,
                               jax.random.key(3), queue_size=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_emissive_furnace():
    """Camera inside a giant emissive sphere sees exactly its radiance."""
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, 0), 100.0, pt.DiffuseLight((2, 3, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 8
    cam.background = np.zeros(3)
    scene, flags, bvh, cam_a = _setup(w, cam)
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=2, max_depth=4)
    img = np.asarray(integrator.render(scene, flags, bvh, cam_a, cfg,
                                       jax.random.key(0)))
    np.testing.assert_allclose(img, np.broadcast_to([2, 3, 4], img.shape),
                               rtol=1e-5)


def test_lambertian_furnace_energy():
    """Furnace test: a Lambertian sphere with albedo a inside a uniform sky of
    radiance L converges to L * a/(1-a) * ... — with RR off and enough depth,
    an a=0.5 surface under unit sky sees ~L*sum a^k ≈ L*a/(1-a)+... Here we
    just check energy conservation: radiance ≤ sky and > sky * albedo."""
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -2), 1.0, pt.Lambertian((0.5, 0.5, 0.5))))
    cam = pt.Camera()
    cam.aspect_ratio = 1.0
    cam.img_width = 16
    cam.vfov = 30
    cam.background = np.ones(3)  # uniform white sky
    scene, flags, bvh, cam_a = _setup(w, cam)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=64, max_depth=32,
                       use_russian_roulette=False)
    img = np.asarray(integrator.render(scene, flags, bvh, cam_a, cfg,
                                       jax.random.key(0)))
    center = img[6:10, 6:10].mean()
    # Geometric series: hit sphere (0.5), then mostly escape to sky:
    # value in (0.5, 1.0); analytic ~0.5..0.66 band for this geometry.
    assert 0.45 < center < 0.75
    assert img.max() <= 1.0 + 1e-4


def test_no_nan_all_material_families():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, -1000, 0), 1000, pt.Lambertian((0.5, 0.5, 0.5))))
    mats = [pt.Lambertian((0.8, 0.2, 0.2)), pt.Metal((0.9, 0.9, 0.9), 0.2),
            pt.Dielectric(1.5), pt.DiffuseLight((3, 3, 3)),
            pt.Isotropic((0.5, 0.5, 0.5)),
            pt.SubsurfaceSimple((0.7, 0.5, 0.3), 0.2),
            pt.SubsurfaceVolumetric((0.2, 0.5, 0.2), 0.08, 0.8, 0.7)]
    for i, m in enumerate(mats):
        w.add(pt.Sphere.stationary((i * 2.0 - 6, 0.5, 0), 0.5, m))
    cam = pt.Camera()
    cam.aspect_ratio = 4.0
    cam.img_width = 64
    cam.lookfrom = np.array([0.0, 2.0, -10.0])
    cam.lookat = np.array([0.0, 0.5, 0.0])
    scene, flags, bvh, cam_a = _setup(w, cam)
    cfg = RenderConfig(width=64, height=16, samples_per_pixel=4, max_depth=8)
    img = np.asarray(integrator.render(scene, flags, bvh, cam_a, cfg,
                                       jax.random.key(0)))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_wavefront_sample_batching_matches_sequential():
    """One render_batch(n_samples=k) call must integrate exactly the same
    sample set as k sequential 1-sample calls (the pool regenerates across
    sample boundaries — the r4 batched-dispatch optimization must change
    only the drain-tail cost, never the estimate)."""
    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import wavefront
    from path_tracer_tpu.ops.shade import SceneFlags
    from path_tracer_tpu.ops.types import RenderConfig

    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                               pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((4, 4, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 32
    scene = pt.compile_scene(w)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=32, height=16, samples_per_pixel=6, max_depth=5)
    key = jax.random.key(3)
    z = jnp.zeros((16, 32, 3), jnp.float32)
    batched = wavefront.render_batch(scene, flags, bvh, cam_a, cfg, z, 0, 6,
                                     key, queue_size=256, steps_per_wave=8)
    seq = z
    for s in range(6):
        seq = wavefront.render_batch(scene, flags, bvh, cam_a, cfg, seq, s,
                                     1, key, queue_size=256, steps_per_wave=8)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(seq),
                               atol=1e-5)


def test_wavefront_sample_stride_matches_per_path():
    """In-slot multi-sample accumulation (sample_stride > 1) integrates the
    SAME sample set as per-path spawning — only per-pixel float add order
    may differ (r5: the retire scatter fires once per window).  Paths/rays
    counters must still count every path."""
    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import wavefront
    from path_tracer_tpu.ops.shade import SceneFlags
    from path_tracer_tpu.ops.types import RenderConfig

    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                               pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.8, 0.8, 0.0))))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((4, 4, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 32
    scene = pt.compile_scene(w)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=32, height=16, samples_per_pixel=6, max_depth=5)
    key = jax.random.key(7)
    z = jnp.zeros((16, 32, 3), jnp.float32)

    outs = {}
    for stride in (1, 3, 6):
        img, st = wavefront.render_batch(
            scene, flags, bvh, cam_a, cfg, z, 0, 6, key, queue_size=256,
            steps_per_wave=8, sample_stride=stride, with_stats=True)
        assert int(st["paths"]) == 6 * 32 * 16, stride
        outs[stride] = (np.asarray(img), float(st["rays"]))
    np.testing.assert_allclose(outs[3][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[6][0], outs[1][0], atol=1e-5)
    assert outs[3][1] == outs[1][1] == outs[6][1]  # same traced segments
