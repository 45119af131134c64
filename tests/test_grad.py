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


# --- FD coverage for every differentiable leaf family (VERDICT r1 #6) ----
#
# Each setup is crafted so the finite difference is a valid oracle: the
# perturbation must not flip any discrete decision (visibility, refl/refr
# coin, SSS walk exits) for the fixed key — those jump terms are exactly
# what stop_gradient excludes by the differentiable-rendering convention.


def _fd_check(loss, x0, idx, eps, rtol, atol=1e-3, expect_min=None,
              fd_loss=None):
    """AD gradient at x0 vs central FD.  ``fd_loss`` (default: ``loss``)
    lets geometry tests evaluate the FD points with a *rebuilt* BVH: the AD
    convention freezes traversal (zero-grad custom_vjp) and re-intersects
    via refine_hit, which is only consistent with the scene at eps→0 — at a
    finite eps, secondary-ray origins can land inside the stale BVH's
    geometry and break the frozen-ID replay (measured: image goes black for
    eps of the wrong sign).  Rebuilding the BVH per FD point evaluates the
    true perturbed render, which matches AD whenever visibility is
    constant."""
    g = np.asarray(jax.grad(loss)(x0))
    assert np.isfinite(g).all()
    fd_loss = fd_loss or loss
    unit = jnp.zeros_like(x0).ravel().at[idx].set(1.0).reshape(x0.shape)
    fd = (float(fd_loss(x0 + eps * unit))
          - float(fd_loss(x0 - eps * unit))) / (2 * eps)
    ad = float(np.asarray(g).ravel()[idx])
    if expect_min is not None:
        assert abs(fd) > expect_min, f"FD signal too weak to test: {fd}"
    assert np.isclose(fd, ad, rtol=rtol, atol=atol), (idx, fd, ad)
    return fd, ad


def _solo_scene(mat, width=16, spp=4, depth=4, lookfrom=(0, 0, 3)):
    """One big sphere filling most of the view (silhouette in-frame edges
    only graze empty sky pixels), lit by the smooth gradient sky — constant
    visibility under small parameter perturbations."""
    w = pt.HittableList()
    w.add(pt.Sphere.stationary((0, 0, 0), 1.0, mat))
    cam = pt.Camera()
    cam.aspect_ratio = 1.5
    cam.img_width = width
    cam.lookfrom = np.array(lookfrom, np.float64)
    cam.lookat = np.array([0.0, 0.0, 0.0])
    scene = pt.compile_scene(w)
    cfg = RenderConfig(width=width, height=int(width / 1.5),
                       samples_per_pixel=spp, max_depth=depth,
                       use_russian_roulette=False)
    return (scene, SceneFlags.from_scene(scene), pt.build_from_scene(scene),
            cam.initialize(), cfg)


def _leaf_loss(scene, flags, bvh, cam_a, cfg, leaf, key=7, extra=None):
    k = jax.random.key(key)

    def loss(v):
        repl = {leaf: v}
        if extra:  # tie leaves together (e.g. c0 == c1 for static spheres)
            repl.update({e: v for e in extra})
        s = dataclasses.replace(scene, **repl)
        img = integrator.render(s, flags, bvh, cam_a, cfg, k,
                                differentiable=True)
        return jnp.sum(img) / img.size

    return loss


def test_grad_fd_mat_ir():
    """Dielectric IOR: refl/refr coin frozen by stop_gradient; tiny eps
    keeps the Schlick threshold from flipping any sample of the fixed key."""
    scene, flags, bvh, cam_a, cfg = _solo_scene(pt.Dielectric(1.5))
    loss = _leaf_loss(scene, flags, bvh, cam_a, cfg, "mat_ir")
    _fd_check(loss, scene.mat_ir, 0, eps=2e-3, rtol=0.12, atol=5e-5,
              expect_min=1e-4)


def test_grad_fd_sss_simple_scatter_dist():
    """SSS-simple scatter distance: the displace coin (u >= 0.5) is
    parameter-independent, so FD is clean as long as displaced exit points
    stay in free space (solo sphere in sky)."""
    scene, flags, bvh, cam_a, cfg = _solo_scene(
        pt.SubsurfaceSimple((0.8, 0.6, 0.5), 0.2))
    loss = _leaf_loss(scene, flags, bvh, cam_a, cfg, "mat_scatter_dist")
    _fd_check(loss, scene.mat_scatter_dist, 0, eps=1e-3, rtol=0.12)


@pytest.mark.parametrize("leaf,idx_of,eps,rtol", [
    ("mat_g", 0, 1e-3, 0.25),
    ("mat_sigma_s", 0, 1e-3, 0.25),
    ("mat_sigma_a", 0, 1e-3, 0.25),
])
def test_grad_fd_sss_volumetric(leaf, idx_of, eps, rtol):
    """SSS-volumetric walk parameters.  The walk's exit/absorb coins depend
    on these parameters, so eps is kept small enough that no coin of the
    fixed key flips (verified: FD at eps and eps/2 agree), and the AD
    gradient matching FD shows the smooth transport path (step lengths,
    HG direction, throughput) is wired correctly."""
    scene, flags, bvh, cam_a, cfg = _solo_scene(
        pt.SubsurfaceVolumetric((0.8, 0.7, 0.6), 2.0, 0.4, g=0.3),
        spp=2, depth=4)
    loss = _leaf_loss(scene, flags, bvh, cam_a, cfg, leaf)
    x0 = getattr(scene, leaf)
    fd1, _ = _fd_check(loss, x0, idx_of, eps=eps, rtol=rtol, atol=2e-3)
    # Flip-free evidence: halving eps should reproduce the same FD slope.
    unit = jnp.zeros_like(x0).ravel().at[idx_of].set(1.0).reshape(x0.shape)
    fd2 = (float(loss(x0 + eps / 2 * unit))
           - float(loss(x0 - eps / 2 * unit))) / eps
    assert np.isclose(fd1, fd2, rtol=0.2, atol=2e-3), (fd1, fd2)


def test_grad_fd_sphere_center_and_radius():
    """Geometry FD in a constant-visibility setup: the camera sits close
    enough that the sphere covers every pixel (angular radius 72° > 61°
    corner angle), so moving it re-shades via refine_hit (normals + hit
    points) without any silhouette hit/miss flips — which FD would
    otherwise pick up as enormous jump terms."""
    scene, flags, bvh, cam_a, cfg = _solo_scene(
        pt.Metal((0.9, 0.85, 0.8), 0.0), lookfrom=(0, 0, 1.05))

    def fd_loss_of(leaf, extra=()):
        k = jax.random.key(7)

        def fd_loss(v):
            repl = {leaf: v}
            repl.update({e: v for e in extra})
            s = dataclasses.replace(scene, **repl)
            img = integrator.render(s, flags, pt.build_from_scene(s), cam_a,
                                    cfg, k, differentiable=True)
            return jnp.sum(img) / img.size

        return fd_loss

    loss_c = _leaf_loss(scene, flags, bvh, cam_a, cfg, "sph_c0",
                        extra=("sph_c1",))
    # z-component of the first sphere's center (index 2 in the flat view).
    _fd_check(loss_c, scene.sph_c0, 2, eps=1e-3, rtol=0.12, expect_min=1e-4,
              fd_loss=fd_loss_of("sph_c0", ("sph_c1",)))

    loss_r = _leaf_loss(scene, flags, bvh, cam_a, cfg, "sph_rad")
    _fd_check(loss_r, scene.sph_rad, 0, eps=1e-3, rtol=0.12,
              fd_loss=fd_loss_of("sph_rad"))


def test_grad_fd_emission_texture():
    """Emission FD on the light's texture row (linear in radiance)."""
    scene, flags, bvh, cam_a = _setup()
    loss = _loss_fn(scene, flags, bvh, cam_a, "tex_c1")
    mat_types = np.asarray(scene.mat_type)
    emissive_mat = int(np.nonzero(mat_types == 3)[0][0])
    light_tex = int(np.asarray(scene.mat_tex)[emissive_mat])
    idx = light_tex * 3  # red channel of the emission color
    _fd_check(loss, scene.tex_c1, idx, eps=1e-3, rtol=0.08)
