"""The tiled differentiable engine must match the per-lane megakernel scan:
same keys ⇒ same image, and same gradients (the fast-gradient-engine
contract; ops/integrator_tiled.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
from path_tracer_tpu.ops import integrator, integrator_tiled
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig

from test_shade_tiled import _world_all_materials


def _setup(width=32, depth=6):
    world, cam = _world_all_materials()
    cam.img_width = width
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cfg = RenderConfig(width=width, height=width // 2, samples_per_pixel=2,
                       max_depth=depth)
    return scene, flags, bvh, cam.initialize(), cfg


def test_render_tiled_matches_megakernel_scan():
    scene, flags, bvh, cam_a, cfg = _setup()
    key = jax.random.key(11)
    mega = integrator.render(scene, flags, bvh, cam_a, cfg, key,
                             differentiable=True, spp=2)
    tiled = integrator_tiled.render_tiled(scene, flags, bvh, cam_a, cfg,
                                          key, spp=2)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(mega),
                               atol=2e-5)


def test_grads_tiled_match_megakernel_scan():
    scene, flags, bvh, cam_a, cfg = _setup(width=16, depth=4)
    key = jax.random.key(12)

    def loss_of(render_fn):
        def loss(params):
            s = dataclasses.replace(scene, **params)
            img = render_fn(s)
            return jnp.mean(img ** 2)

        return loss

    mega_loss = loss_of(lambda s: integrator.render(
        s, flags, bvh, cam_a, cfg, key, differentiable=True, spp=1))
    tiled_loss = loss_of(lambda s: integrator_tiled.render_tiled(
        s, flags, bvh, cam_a, cfg, key, spp=1))

    params = {"tex_c1": scene.tex_c1, "mat_fuzz": scene.mat_fuzz,
              "mat_ir": scene.mat_ir, "sph_c0": scene.sph_c0}
    lm, gm = jax.value_and_grad(mega_loss)(params)
    lt, gt = jax.value_and_grad(tiled_loss)(params)
    np.testing.assert_allclose(float(lt), float(lm), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(gt[k]), np.asarray(gm[k]),
                                   atol=2e-5, rtol=1e-3, err_msg=k)


def test_render_batch_diff_forward_matches_wavefront():
    """The differentiable wavefront's primal equals the forward engine."""
    from path_tracer_tpu.ops import wavefront

    scene, flags, bvh, cam_a, cfg = _setup(width=24, depth=5)
    key = jax.random.key(5)
    accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    fwd = wavefront.render_batch(scene, flags, bvh, cam_a, cfg, accum, 0, 2,
                                 key, queue_size=512, steps_per_wave=8)
    img, stats = wavefront.render_batch_diff(
        scene, flags, bvh, cam_a, cfg, accum, 0, 2, key, queue_size=512,
        steps_per_wave=8, n_waves=512)
    assert int(stats["paths"]) == int(stats["total"]), "paths not drained"
    np.testing.assert_allclose(np.asarray(img), np.asarray(fwd), atol=2e-5)


def test_render_batch_diff_grads_match_megakernel_scan():
    """Backward wavefront gradients == megakernel-scan gradients."""
    from path_tracer_tpu.ops import wavefront

    scene, flags, bvh, cam_a, cfg = _setup(width=16, depth=4)
    key = jax.random.key(6)
    spp = 1
    accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_wave(params):
        s = dataclasses.replace(scene, **params)
        img, _ = wavefront.render_batch_diff(
            s, flags, bvh, cam_a, cfg, accum0, 0, spp, key, queue_size=256,
            steps_per_wave=8, n_waves=512)
        return jnp.mean((img / spp) ** 2)

    def loss_mega(params):
        s = dataclasses.replace(scene, **params)
        img = integrator.render(s, flags, bvh, cam_a, cfg, key,
                                differentiable=True, spp=spp)
        return jnp.mean(img ** 2)

    params = {"tex_c1": scene.tex_c1, "mat_fuzz": scene.mat_fuzz,
              "mat_ir": scene.mat_ir}
    lw, gw = jax.value_and_grad(loss_wave)(params)
    lm, gm = jax.value_and_grad(loss_mega)(params)
    np.testing.assert_allclose(float(lw), float(lm), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(gw[k]), np.asarray(gm[k]),
                                   atol=2e-5, rtol=1e-3, err_msg=k)


def test_render_batch_diff_ckpt_every_equivalent():
    """Checkpoint granularity is a pure memory/replay trade: k waves per
    checkpoint block must not change the primal image or the gradients
    (VERDICT r4 #5's A/B knob)."""
    from path_tracer_tpu.ops import wavefront

    scene, flags, bvh, cam_a, cfg = _setup(width=16, depth=4)
    key = jax.random.key(9)
    accum0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_k(k):
        def loss(params):
            s = dataclasses.replace(scene, **params)
            img, _ = wavefront.render_batch_diff(
                s, flags, bvh, cam_a, cfg, accum0, 0, 1, key,
                queue_size=256, steps_per_wave=8, n_waves=512, ckpt_every=k)
            return jnp.mean(img ** 2)
        return loss

    params = {"tex_c1": scene.tex_c1, "mat_fuzz": scene.mat_fuzz}
    l1, g1 = jax.value_and_grad(loss_k(1))(params)
    l4, g4 = jax.value_and_grad(loss_k(4))(params)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(g4[k]), np.asarray(g1[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=k)


def test_medium_geometry_grads_match_megakernel():
    """Regression (review finding): the medium chord endpoints are
    zero-gradient by convention — bounce_shade_t must stop-gradient
    rec.t exactly as bounce_shade does, or geometry gradients on medium
    scenes leak a biased half-term through the free-flight chord."""
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.6, 0.6, 0.2))))
    w.add(pt.ConstantMedium.from_color(
        pt.Sphere.stationary((0, 0, -1), 0.8, pt.Dielectric(1.5)),
        (0.8, 0.8, 0.9), 1.5))
    w.add(pt.Quad((-2, 1.8, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((5, 5, 5))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 16
    scene = pt.compile_scene(w)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    assert flags.has_medium
    cam_a = cam.initialize()
    cfg = RenderConfig(width=16, height=8, max_depth=5)
    key = jax.random.key(21)

    def loss_of(render_fn):
        def loss(c0):
            s = dataclasses.replace(scene, sph_c0=c0, sph_c1=c0)
            return jnp.mean(render_fn(s) ** 2)

        return loss

    gm = jax.grad(loss_of(lambda s: integrator.render(
        s, flags, bvh, cam_a, cfg, key, differentiable=True, spp=1)))(
            scene.sph_c0)
    gt = jax.grad(loss_of(lambda s: integrator_tiled.render_tiled(
        s, flags, bvh, cam_a, cfg, key, spp=1)))(scene.sph_c0)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gm), atol=2e-5,
                               rtol=1e-3)
    assert float(np.abs(np.asarray(gm)).max()) > 0  # signal, not zeros
