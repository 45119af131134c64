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
