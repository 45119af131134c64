"""Differentiability: pixel gradients vs finite differences (north star:
"pixel gradients w.r.t. material/texture/emission parameters match finite
differences" — BASELINE.json).

With a fixed RNG key the Monte-Carlo estimate is a deterministic function of
the scene parameters, so central finite differences of the *same* render
match reverse-mode AD up to discrete-decision flips (which stop_gradient
freezes) and float32 roundoff.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu.ops import integrator
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig

CFG = RenderConfig(width=24, height=16, samples_per_pixel=4, max_depth=5,
                   use_russian_roulette=False)


def _setup():
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    w.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                               pt.Lambertian((0.6, 0.6, 0.2))))
    w.add(pt.Sphere.stationary((1.2, 0, -1), 0.4, pt.Metal((0.9, 0.8, 0.7), 0.1)))
    w.add(pt.Quad((-2, 1.5, -2), (1, 0, 0), (0, 0, 1),
                  pt.DiffuseLight((3, 3, 3))))
    cam = pt.Camera()
    cam.aspect_ratio = 1.5
    cam.img_width = 24
    scene = pt.compile_scene(w)
    return scene, SceneFlags.from_scene(scene), pt.build_from_scene(scene), \
        cam.initialize()


def _loss_fn(scene, flags, bvh, cam_a, leaf_name):
    key = jax.random.key(3)
    weights = None

    def loss(leaf_val):
        s = dataclasses.replace(scene, **{leaf_name: leaf_val})
        img = integrator.render(s, flags, bvh, cam_a, CFG, key,
                                differentiable=True)
        return jnp.sum(img) / img.size

    return loss


@pytest.mark.parametrize("leaf,eps,rtol", [
    ("tex_c1", 1e-3, 0.08),     # albedo / emission colors
])
def test_grad_matches_finite_difference(leaf, eps, rtol):
    scene, flags, bvh, cam_a = _setup()
    loss = _loss_fn(scene, flags, bvh, cam_a, leaf)
    x0 = getattr(scene, leaf)

    g = jax.grad(loss)(x0)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # Check the K largest-magnitude entries against central differences.
    flat = np.abs(g).ravel()
    top = np.argsort(flat)[-4:]
    checked = 0
    for idx in top:
        if flat[idx] < 1e-4:
            continue
        unit = jnp.zeros_like(x0).ravel().at[idx].set(1.0).reshape(x0.shape)
        fplus = loss(x0 + eps * unit)
        fminus = loss(x0 - eps * unit)
        fd = (float(fplus) - float(fminus)) / (2 * eps)
        ad = g.ravel()[idx]
        assert np.isclose(fd, ad, rtol=rtol, atol=2e-3), (leaf, idx, fd, ad)
        checked += 1
    assert checked >= 2


def test_grad_fuzz_smooth_visibility():
    """Metal fuzz gradient vs FD in a setup with *constant* visibility: a
    metal plate reflecting only the smooth sky gradient.  (In scenes where
    perturbing fuzz flips which object a reflected ray hits, FD picks up the
    discrete visibility jumps that stop_gradient deliberately excludes — the
    standard differentiable-rendering convention, so those setups are not a
    valid FD oracle.)"""
    w = pt.HittableList()
    w.add(pt.Quad((-5, -5, -2), (10, 0, 0), (0, 10, 0),
                  pt.Metal((0.9, 0.9, 0.9), 0.3)))
    cam = pt.Camera()
    cam.aspect_ratio = 1.5
    cam.img_width = 24
    cam.lookfrom = np.array([0.0, 0.0, 5.0])
    cam.lookat = np.array([0.0, 0.0, 0.0])
    scene = pt.compile_scene(w)
    flags = SceneFlags.from_scene(scene)
    bvh = pt.build_from_scene(scene)
    cam_a = cam.initialize()
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=8, max_depth=3,
                       use_russian_roulette=False)
    key = jax.random.key(5)

    def loss(fuzz):
        s = dataclasses.replace(scene, mat_fuzz=fuzz)
        img = integrator.render(s, flags, bvh, cam_a, cfg, key,
                                differentiable=True)
        return jnp.sum(img) / img.size

    x0 = scene.mat_fuzz
    g = np.asarray(jax.grad(loss)(x0))
    assert np.isfinite(g).all()
    idx = 0  # the metal material row
    eps = 1e-3
    unit = jnp.zeros_like(x0).at[idx].set(1.0)
    fd = (float(loss(x0 + eps * unit)) - float(loss(x0 - eps * unit))) / (2 * eps)
    assert abs(fd) > 1e-4  # fuzz visibly matters here
    assert np.isclose(fd, g[idx], rtol=0.15, atol=5e-4), (fd, g[idx])


def test_grad_emission():
    """d(loss)/d(emission color) must be positive for a visible light."""
    scene, flags, bvh, cam_a = _setup()
    loss = _loss_fn(scene, flags, bvh, cam_a, "tex_c1")
    g = np.asarray(jax.grad(loss)(scene.tex_c1))
    # The light's texture row: emission scales radiance linearly → grad > 0.
    mat_types = np.asarray(scene.mat_type)
    emissive_mat = int(np.nonzero(mat_types == 3)[0][0])
    light_tex = int(np.asarray(scene.mat_tex)[emissive_mat])
    assert (g[light_tex] > 0).all()


def test_grad_through_geometry():
    """Gradients flow to sphere centers via the differentiable hit refine."""
    scene, flags, bvh, cam_a = _setup()
    key = jax.random.key(4)

    def loss(c0):
        s = dataclasses.replace(scene, sph_c0=c0, sph_c1=c0)
        img = integrator.render(s, flags, bvh, cam_a, CFG, key,
                                differentiable=True)
        return jnp.sum(img) / img.size

    g = np.asarray(jax.grad(loss)(scene.sph_c0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-6  # geometry does affect shading
