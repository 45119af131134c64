"""Lane-for-lane equivalence: tiled shading == per-lane vmapped shading.

The wavefront engine's control step runs entirely through
``ops/shade_tiled`` (batch-major component math, packed gather tables);
the megakernel keeps the per-lane forms in ``ops/shade`` /
``ops/integrator``.  Both must produce the same numbers for the same RNG
keys — this is what keeps the mega-vs-wave oracle
(docs/WAVEFRONT_USAGE.md:146-150) exact.  Every material family is
exercised, including the two SSS families and a constant medium.
"""
import jax
import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
from path_tracer_tpu.ops import camera as cam_ops
from path_tracer_tpu.ops import integrator, shade_tiled, traverse
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig

R = 256  # two full lane tiles


def _world_all_materials():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian(pt.CheckerTexture(
                                   0.5, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))))
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                               pt.Lambertian(pt.NoiseTexture(4.0))))
    w.add(pt.Sphere.stationary((1, 0, -1), 0.5, pt.Metal((0.8, 0.6, 0.2), 0.3)))
    w.add(pt.Sphere.stationary((-1, 0, -1), 0.5, pt.Dielectric(1.5)))
    w.add(pt.Quad((-2, 2, -2), (4, 0, 0), (0, 0, 2), pt.DiffuseLight((4, 4, 4))))
    w.add(pt.Triangle((-2, -0.4, -2), (2, -0.4, -2), (0, 1.8, -2.5),
                      pt.SubsurfaceSimple((0.9, 0.5, 0.4), 0.3)))
    w.add(pt.Sphere.stationary((0, 0.2, -2.5), 0.7,
                               pt.SubsurfaceVolumetric((0.8, 0.7, 0.6),
                                                       2.0, 0.3, g=0.4)))
    w.add(pt.ConstantMedium.from_color(
        pt.Sphere.stationary((0.2, 0.1, -1.2), 1.4, pt.Dielectric(1.5)),
        (0.6, 0.7, 0.9), 0.8))
    cam = pt.Camera()
    cam.aspect_ratio = 2.0
    cam.img_width = 64
    cam.max_depth = 8
    return w, cam


def _batch_states(scene, flags, bvh, cam_a, cfg, base_key):
    """Shoot R camera rays at random pixels, traverse once → a PathState
    batch plus matching traversal outputs (the wavefront control inputs)."""
    ks = jax.random.split(jax.random.key(99), 3)
    pix = jax.random.randint(ks[0], (R,), 0, cfg.width * cfg.height)
    smp = jax.random.randint(ks[1], (R,), 0, 4)
    px = (pix % cfg.width).astype(jnp.float32)
    py = (pix // cfg.width).astype(jnp.float32)

    def make(s_i, p_i, x, y):
        key_p = jax.random.fold_in(jax.random.fold_in(base_key, s_i), p_i)
        o, d, t = cam_ops.get_ray(cam_a, x, y, jax.random.fold_in(key_p, 7))
        return integrator._init_state(o, d, t)

    path = jax.vmap(make)(smp, pix, px, py)

    def trav(o, d, t, lo):
        return traverse.traverse_bvh(bvh, o, d, t, lo, cfg.t_max,
                                     cfg.stack_depth)

    found, ptype, pidx, t_hit = jax.vmap(trav)(
        path.origin, path.direction, path.time, jnp.full((R,), cfg.t_min))
    ef, e_pt, e_pi, t_exit = jax.vmap(trav)(
        path.origin, path.direction, path.time, t_hit + 1e-4)
    e_med = jax.vmap(lambda a, b: integrator.prim_medium_of(scene, a, b))(
        e_pt, e_pi)
    return path, smp, pix, found, ptype, pidx, ef, t_exit, (ef & (e_med >= 0))


def test_bounce_shade_tiled_matches_vmapped():
    world, cam = _world_all_materials()
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=64, height=32, max_depth=8)
    base_key = jax.random.key(7)

    (path, smp, pix, found, ptype, pidx, ef, t_exit,
     e_is_med) = _batch_states(scene, flags, bvh, cam_a, cfg, base_key)
    assert bool(jnp.any(found)), "batch hit nothing — test scene broken"

    # Per-lane reference (the megakernel path).
    def one(st, s_i, p_i, fnd, pt_, pi_, ef_, te_, em_):
        key_p = jax.random.fold_in(jax.random.fold_in(base_key, s_i), p_i)
        return integrator.bounce_shade(scene, flags, cam_a, cfg, st, fnd,
                                       pt_, pi_, ef_, te_, em_, key_p)

    ref = jax.jit(jax.vmap(one))(path, smp, pix, found, ptype, pidx, ef,
                                 t_exit, e_is_med)

    # Tiled form (the wavefront path).
    tabs = shade_tiled.make_tables(scene)
    rngs = shade_tiled.wave_rng(base_key, smp, pix, path.iters,
                                flags.has_sss, cfg.sss_max_steps)
    got = jax.jit(lambda p, r: shade_tiled.bounce_shade_t(
        scene, flags, cam_a, cfg, tabs, p, found, ptype, pidx, ef, t_exit,
        e_is_med, r))(path, rngs)

    for name in ("origin", "direction", "color", "throughput"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            atol=2e-5, rtol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got.depth),
                                  np.asarray(ref.depth))
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_array_equal(np.asarray(got.alive),
                                  np.asarray(ref.alive))


def test_refine_hit_tiled_matches_vmapped():
    world, cam = _world_all_materials()
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=64, height=32, max_depth=8)
    (path, _smp, _pix, found, ptype, pidx, _ef, _te,
     _em) = _batch_states(scene, flags, bvh, cam_a, cfg, jax.random.key(7))

    ref = jax.vmap(lambda p, a, b: traverse.refine_hit(
        scene, a, b, p.origin, p.direction, p.time, cfg.t_min))(
            path, ptype, pidx)

    tabs = shade_tiled.make_tables(scene)
    o3 = jnp.moveaxis(path.origin, -1, 0)
    d3 = jnp.moveaxis(path.direction, -1, 0)
    sh = shade_tiled.grid_shape(R)
    g = lambda x: x.reshape(sh)  # noqa: E731
    got = shade_tiled.refine_hit_t(
        tabs, g(ptype), g(pidx), g(o3[0]), g(o3[1]), g(o3[2]),
        g(d3[0]), g(d3[1]), g(d3[2]), g(path.time),
        jnp.full(sh, cfg.t_min))

    m = np.asarray(found)  # compare only real hits (misses carry garbage t)
    np.testing.assert_array_equal(
        np.asarray(got.hit).reshape(R)[m], np.asarray(ref.hit)[m])
    np.testing.assert_allclose(
        np.asarray(got.t).reshape(R)[m], np.asarray(ref.t)[m], rtol=1e-5)
    got_p = np.stack([np.asarray(c).reshape(R) for c in got.p], -1)
    got_n = np.stack([np.asarray(c).reshape(R) for c in got.n], -1)
    np.testing.assert_allclose(got_p[m], np.asarray(ref.p)[m], atol=1e-5)
    np.testing.assert_allclose(got_n[m], np.asarray(ref.normal)[m],
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got.mat).reshape(R)[m], np.asarray(ref.mat)[m])
    np.testing.assert_array_equal(
        np.asarray(got.medium).reshape(R)[m], np.asarray(ref.medium)[m])
    np.testing.assert_array_equal(
        np.asarray(got.front).reshape(R)[m], np.asarray(ref.front_face)[m])


if __name__ == "__main__":
    test_refine_hit_tiled_matches_vmapped()
    test_bounce_shade_tiled_matches_vmapped()
    print("ok")
