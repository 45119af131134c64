"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the fake-backend pattern; conftest forces 8 host devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops import integrator
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig
from path_tracer_tpu.parallel.render_dist import (make_mesh, make_train_step,
                                                  render_sharded)

CFG = RenderConfig(width=32, height=16, samples_per_pixel=2, max_depth=5)


def _setup():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.8, 0.8, 0.0))))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((4, 4, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 32
    scene = pt.compile_scene(w)
    return scene, SceneFlags.from_scene(scene), pt.build_from_scene(scene), \
        cam.initialize()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    """The sharded render must equal the single-chip megakernel bit-for-bit
    (same keys, device-local accumulation, no collectives)."""
    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(9)
    mesh = make_mesh(8)
    sharded = render_sharded(scene, flags, bvh, cam_a, CFG, key, mesh,
                             CFG.samples_per_pixel)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-6)


def test_sharded_output_is_sharded():
    scene, flags, bvh, cam_a = _setup()
    mesh = make_mesh(8)
    out = render_sharded(scene, flags, bvh, cam_a, CFG, jax.random.key(0),
                         mesh, 1)
    assert len(out.sharding.device_set) == 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_mesh_sizes(n_dev):
    """Uneven pixel counts pad cleanly for any mesh size."""
    scene, flags, bvh, cam_a = _setup()
    mesh = make_mesh(n_dev)
    out = render_sharded(scene, flags, bvh, cam_a, CFG, jax.random.key(1),
                         mesh, 1)
    assert out.shape == (CFG.height, CFG.width, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_train_step_runs_and_descends():
    """One SGD step on texture colors reduces the pixel loss."""
    scene, flags, bvh, cam_a = _setup()
    mesh = make_mesh(8)
    step = make_train_step(flags, CFG, mesh, spp=1, lr=0.5)
    params = {"tex_c1": scene.tex_c1}
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    key = jax.random.key(2)
    p1, loss1, g1, aux1 = step(params, scene, bvh, cam_a, key, target)
    assert np.isfinite(float(loss1))
    assert np.isfinite(np.asarray(g1["tex_c1"])).all()
    assert float(np.abs(np.asarray(g1["tex_c1"])).max()) > 0
    # The backward wavefront must have integrated every path.
    assert int(aux1["paths_done"]) == int(aux1["paths_total"]) != 0
    p2, loss2, _, _ = step(p1, scene, bvh, cam_a, key, target)
    assert float(loss2) < float(loss1)


def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the virtual mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    mod.dryrun_multichip(8)


def test_tp_scene_shard_matches_replicated():
    """Tensor-parallel mode: scene sharded by primitive over 8 devices must
    reproduce the replicated megakernel image (same keys; ties aside)."""
    from path_tracer_tpu.parallel.scene_shard import render_tp, shard_scene

    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(5)
    mesh = make_mesh(8, axis="t")
    scene_tp, bvh_tp = shard_scene(scene, 8)
    assert scene_tp.sph_c0.shape[0] == 8
    tp = render_tp(scene_tp, flags, bvh_tp, cam_a, CFG, key, mesh,
                   spp=CFG.samples_per_pixel)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(single), atol=1e-5)


def test_tp_scene_shard_branching8():
    """TP with an 8-wide BVH: the per-device PackedBVH reconstruction
    inside shard_map must propagate ``branching`` (a K=8 tree traversed as
    K=4 reads pointer floats as AABB data → garbage hits)."""
    from path_tracer_tpu.parallel.scene_shard import render_tp, shard_scene

    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(5)
    mesh = make_mesh(8, axis="t")
    scene_tp, bvh_tp = shard_scene(scene, 8, branching=8)
    assert bvh_tp.branching == 8
    tp = render_tp(scene_tp, flags, bvh_tp, cam_a, CFG, key, mesh,
                   spp=CFG.samples_per_pixel)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(single), atol=1e-5)


def test_tp_scene_shard_medium_scene():
    """TP mode with a constant medium (exercises the second pmin query)."""
    from path_tracer_tpu.parallel.scene_shard import render_tp, shard_scene

    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.ConstantMedium(
        pt.Sphere.stationary((0, 0, -1), 2.0, pt.Lambertian((1, 1, 1))),
        0.4, (0.9, 0.9, 0.9)))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((4, 4, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 32
    scene = pt.compile_scene(w)
    flags = SceneFlags.from_scene(scene)
    bvh = pt.build_from_scene(scene)
    cam_a = cam.initialize()

    key = jax.random.key(11)
    mesh = make_mesh(4, axis="t")
    scene_tp, bvh_tp = shard_scene(scene, 4)
    tp = render_tp(scene_tp, flags, bvh_tp, cam_a, CFG, key, mesh, spp=2)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key, spp=2)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(single), atol=1e-5)


def test_wavefront_sharded_matches_single_device():
    """DP wavefront: per-device slot pools must reproduce the single-device
    wavefront image (same global pixel keys; add-order differences only)."""
    from path_tracer_tpu.ops import wavefront
    from path_tracer_tpu.parallel.render_dist import render_sharded_wavefront

    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(4)
    mesh = make_mesh(8)
    dp = render_sharded_wavefront(scene, flags, bvh, cam_a, CFG, key, mesh,
                                  spp=CFG.samples_per_pixel, queue_size=256,
                                  steps_per_wave=8)
    acc = wavefront.render_batch(
        scene, flags, bvh, cam_a, CFG,
        jnp.zeros((CFG.height, CFG.width, 3), jnp.float32), 0,
        CFG.samples_per_pixel, key, queue_size=256, steps_per_wave=8)
    single = acc / CFG.samples_per_pixel
    np.testing.assert_allclose(np.asarray(dp), np.asarray(single), atol=1e-5)


def test_dp_tp_composed_2d_mesh():
    """DP×TP on a 4×2 mesh: pixels over "d", scene shards over "t" — must
    reproduce the single-device megakernel image (VERDICT r1 #10)."""
    from jax.sharding import Mesh

    from path_tracer_tpu.parallel.scene_shard import render_dp_tp, shard_scene

    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(6)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("d", "t"))
    scene_tp, bvh_tp = shard_scene(scene, 2)
    img = render_dp_tp(scene_tp, flags, bvh_tp, cam_a, CFG, key, mesh,
                       spp=CFG.samples_per_pixel)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key)
    np.testing.assert_allclose(np.asarray(img), np.asarray(single),
                               atol=1e-5)


def test_pp_ring_matches_replicated():
    """Pipeline-parallel ring (scene-shard stages, ppermute hops): must
    reproduce the replicated megakernel image (VERDICT r1 — the one 'no'
    row in SURVEY §2.7)."""
    from path_tracer_tpu.parallel.pipeline import render_pp
    from path_tracer_tpu.parallel.scene_shard import shard_scene

    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(13)
    mesh = make_mesh(8, axis="p")
    scene_pp, bvh_pp = shard_scene(scene, 8)
    pp = render_pp(scene_pp, flags, bvh_pp, cam_a, CFG, key, mesh,
                   spp=CFG.samples_per_pixel)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(single), atol=1e-5)


def test_pp_ring_medium_scene():
    """PP ring with a constant medium (second ring pass per bounce for the
    volume-exit query)."""
    from path_tracer_tpu.parallel.pipeline import render_pp
    from path_tracer_tpu.parallel.scene_shard import shard_scene

    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.ConstantMedium(
        pt.Sphere.stationary((0, 0, -1), 2.0, pt.Lambertian((1, 1, 1))),
        0.4, (0.9, 0.9, 0.9)))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((4, 4, 4))))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 32
    scene = pt.compile_scene(w)
    flags = SceneFlags.from_scene(scene)
    bvh = pt.build_from_scene(scene)
    cam_a = cam.initialize()

    key = jax.random.key(17)
    mesh = make_mesh(4, axis="p")
    scene_pp, bvh_pp = shard_scene(scene, 4)
    pp = render_pp(scene_pp, flags, bvh_pp, cam_a, CFG, key, mesh, spp=2)
    single = integrator.render(scene, flags, bvh, cam_a, CFG, key, spp=2)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(single), atol=1e-5)
