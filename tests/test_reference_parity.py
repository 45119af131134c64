"""Independent physics validation against the ACTUAL reference renderer.

Runs the reference's pure-Python CPU integrator
(``/root/reference/src/core/camera.py:74-119`` ``ray_color`` — recursive
emission + scatter, the repo's stated ground truth) on tiny frames and
asserts this framework's render agrees with it within Monte-Carlo error.
This is the only test that ties the framework's physics to the reference's
output rather than to itself (everything else is self-consistency).

Method: both sides render the same world with a fixed sample budget;
images are averaged over coarse regions (region mean over hundreds of
pixel-samples shrinks the MC noise to a few percent) and compared with a
tolerance calibrated to ~4-5 combined sigma.  RR is disabled on both sides
(semantics differ by design; SURVEY §2.6) and backgrounds are solid (the
reference CPU camera has no gradient sky — camera.py:90).

Skips cleanly when the reference tree is not mounted.
"""
import os
import random as pyrandom
import sys

import numpy as np
import pytest

import path_tracer_tpu as pt

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (they use flat `core`/`util` roots)."""
    import types

    # The reference's mesh loader imports pywavefront at module scope; it is
    # not installed here and these tests use no meshes — stub it.
    sys.modules.setdefault("pywavefront", types.ModuleType("pywavefront"))
    sys.path.insert(0, REF)
    import core  # noqa: F401
    import util  # noqa: F401
    from core import camera as ref_camera  # noqa: F401
    yield sys.modules
    sys.path.remove(REF)


def _ref_render(mods, world, *, lookfrom, lookat, vfov, width, height,
                spp, depth, background, defocus_angle=0.0,
                focus_distance=10.0):
    """Drive the reference integrator directly (no Tk/PPM side effects)."""
    from core.camera import camera as RefCam
    from util import color, point3

    cam = RefCam()
    cam.aspect_ratio = width / height
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    cam.vfov = vfov
    cam.lookfrom = point3(*lookfrom)
    cam.lookat = point3(*lookat)
    cam.background = color(*background)
    cam.defocus_angle = defocus_angle
    cam.focus_distance = focus_distance
    cam.russian_roulette_enabled = False
    cam.initialize()
    assert cam.img_height == height

    pyrandom.seed(12345)
    img = np.zeros((height, width, 3), np.float64)
    for h in range(height):
        for w in range(width):
            acc = color(0, 0, 0)
            for _ in range(spp):
                r = cam.get_ray(w, h)
                acc += cam.ray_color(r, depth, world)
            img[h, w] = (acc.x, acc.y, acc.z)
    return img / spp


def _our_render(world, *, lookfrom, lookat, vfov, width, height, spp,
                depth, background, defocus_angle=0.0, focus_distance=10.0):
    cam = pt.Camera()
    cam.aspect_ratio = width / height
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    cam.vfov = vfov
    cam.lookfrom = np.asarray(lookfrom, np.float64)
    cam.lookat = np.asarray(lookat, np.float64)
    cam.background = np.asarray(background, np.float64)
    cam.defocus_angle = defocus_angle
    cam.focus_distance = focus_distance
    from path_tracer_tpu.ops.types import RenderConfig

    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       max_depth=depth, use_russian_roulette=False)
    r = pt.Renderer(world, cam, engine="wavefront", cfg=cfg, seed=9)
    return np.asarray(r.render(spp=spp, batch=spp))


def _region_means(img, n=3):
    h, w, _ = img.shape
    out = []
    for i in range(n):
        for j in range(n):
            out.append(img[i * h // n:(i + 1) * h // n,
                           j * w // n:(j + 1) * w // n].mean(axis=(0, 1)))
    return np.asarray(out)


def _compare(ref_img, our_img, atol, rtol=0.12):
    rm = _region_means(ref_img)
    om = _region_means(our_img)
    np.testing.assert_allclose(om, rm, atol=atol, rtol=rtol)
    # whole-image mean agrees tighter than any region
    np.testing.assert_allclose(our_img.mean(), ref_img.mean(),
                               atol=atol / 2, rtol=rtol / 2)


def test_reference_parity_spheres(ref):
    """Lambertian + metal + dielectric spheres under a solid sky."""
    from core import Sphere, hittable_list
    from core.material import dielectric, lambertian, metal
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.8, 0.8, 0.0))))
    rw.add(Sphere.stationary(point3(0, 0, -1), 0.5,
                             lambertian.from_color(color(0.7, 0.3, 0.3))))
    rw.add(Sphere.stationary(point3(1, 0, -1), 0.5,
                             metal(color(0.8, 0.6, 0.2), 0.2)))
    rw.add(Sphere.stationary(point3(-1, 0, -1), 0.5, dielectric(1.5)))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100, pt.Lambertian((0.8, 0.8, 0.0))))
    ow.add(pt.Sphere.stationary((0, 0, -1), 0.5, pt.Lambertian((0.7, 0.3, 0.3))))
    ow.add(pt.Sphere.stationary((1, 0, -1), 0.5, pt.Metal((0.8, 0.6, 0.2), 0.2)))
    ow.add(pt.Sphere.stationary((-1, 0, -1), 0.5, pt.Dielectric(1.5)))

    kw = dict(lookfrom=(0, 0.3, 2.2), lookat=(0, 0, -1), vfov=55,
              width=30, height=20, depth=6, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    _compare(ref_img, our_img, atol=0.035)


def test_reference_parity_emissive_quads(ref):
    """Cornell-style emissive box: quads + diffuse light, black background."""
    from core import hittable_list
    from core.material import diffuse_light, lambertian
    from core.quad import quad
    from util import color, point3, vec3

    def rq(q, u, v, m):
        return quad(point3(*q), vec3(*u), vec3(*v), m)

    white = lambertian.from_color(color(0.73, 0.73, 0.73))
    green = lambertian.from_color(color(0.12, 0.45, 0.15))
    red = lambertian.from_color(color(0.65, 0.05, 0.05))
    light = diffuse_light.from_color(color(10, 10, 10))

    rw = hittable_list()
    rw.add(rq((555, 0, 0), (0, 555, 0), (0, 0, 555), green))
    rw.add(rq((0, 0, 0), (0, 555, 0), (0, 0, 555), red))
    rw.add(rq((180, 554, 180), (200, 0, 0), (0, 0, 200), light))
    rw.add(rq((0, 0, 0), (555, 0, 0), (0, 0, 555), white))      # floor
    rw.add(rq((555, 555, 555), (-555, 0, 0), (0, 0, -555), white))  # ceiling
    rw.add(rq((0, 0, 555), (555, 0, 0), (0, 555, 0), white))    # back

    ow = pt.HittableList()
    w_ = pt.Lambertian((0.73, 0.73, 0.73))
    ow.add(pt.Quad((555, 0, 0), (0, 555, 0), (0, 0, 555), pt.Lambertian((0.12, 0.45, 0.15))))
    ow.add(pt.Quad((0, 0, 0), (0, 555, 0), (0, 0, 555), pt.Lambertian((0.65, 0.05, 0.05))))
    ow.add(pt.Quad((180, 554, 180), (200, 0, 0), (0, 0, 200), pt.DiffuseLight((10, 10, 10))))
    ow.add(pt.Quad((0, 0, 0), (555, 0, 0), (0, 0, 555), w_))
    ow.add(pt.Quad((555, 555, 555), (-555, 0, 0), (0, 0, -555), w_))
    ow.add(pt.Quad((0, 0, 555), (555, 0, 0), (0, 555, 0), w_))

    kw = dict(lookfrom=(278, 278, -800), lookat=(278, 278, 0), vfov=40,
              width=24, height=24, depth=6, background=(0, 0, 0))
    ref_img = _ref_render(ref, rw, spp=32, **kw)
    our_img = _our_render(ow, spp=64, **kw)
    _compare(ref_img, our_img, atol=0.06, rtol=0.25)


def test_reference_parity_constant_medium(ref):
    """Volumetric fog ball over a light: exercises the medium free-flight
    sampling and the rays-born-inside chord semantics on both sides."""
    from core import Sphere, hittable_list
    from core.constant_medium import constant_medium
    from core.material import diffuse_light, lambertian
    from core.texture import solid_color
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.6, 0.6, 0.6))))
    rw.add(Sphere.stationary(point3(0, 2.2, -1), 0.8,
                             diffuse_light.from_color(color(8, 8, 8))))
    # NB: the reference's own constant_medium.from_color passes a tuple into
    # isotropic.from_color, which its scatter cannot consume (material.py:138
    # expects .x) — construct via from_texture with a real color instead.
    rw.add(constant_medium.from_texture(
        Sphere.stationary(point3(0, 0.4, -1), 0.9,
                          lambertian.from_color(color(1, 1, 1))),
        solid_color.from_color(color(0.9, 0.9, 0.9)), 1.2))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100, pt.Lambertian((0.6, 0.6, 0.6))))
    ow.add(pt.Sphere.stationary((0, 2.2, -1), 0.8, pt.DiffuseLight((8, 8, 8))))
    ow.add(pt.ConstantMedium.from_color(
        pt.Sphere.stationary((0, 0.4, -1), 0.9, pt.Lambertian((1, 1, 1))),
        (0.9, 0.9, 0.9), 1.2))

    kw = dict(lookfrom=(0, 0.6, 2.5), lookat=(0, 0.4, -1), vfov=50,
              width=24, height=18, depth=8, background=(0.05, 0.05, 0.08))
    ref_img = _ref_render(ref, rw, spp=32, **kw)
    our_img = _our_render(ow, spp=64, **kw)
    _compare(ref_img, our_img, atol=0.05, rtol=0.25)


def test_reference_parity_motion_blur(ref):
    """Moving sphere (sphere.py:22-35 center lerp + camera.py:136 ray time):
    the family the reference's own GPU drops (scene_compiler.py:161-166)."""
    from core import Sphere, hittable_list
    from core.material import lambertian
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.7, 0.7, 0.7))))
    rw.add(Sphere.moving(point3(-0.6, 0, -1), point3(0.6, 0.35, -1), 0.4,
                         lambertian.from_color(color(0.8, 0.2, 0.2))))

    def our_world(moving: bool):
        ow = pt.HittableList()
        ow.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                                    pt.Lambertian((0.7, 0.7, 0.7))))
        if moving:
            ow.add(pt.Sphere.moving((-0.6, 0, -1), (0.6, 0.35, -1), 0.4,
                                    pt.Lambertian((0.8, 0.2, 0.2))))
        else:
            ow.add(pt.Sphere.stationary((-0.6, 0, -1), 0.4,
                                        pt.Lambertian((0.8, 0.2, 0.2))))
        return ow

    kw = dict(lookfrom=(0, 0.4, 1.8), lookat=(0, 0, -1), vfov=55,
              width=30, height=20, depth=5, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(our_world(True), spp=48, **kw)
    _compare(ref_img, our_img, atol=0.04)
    # The feature is actually exercised: freezing the sphere at center0
    # changes the image far beyond MC noise (the smear covers ~1/3 of it).
    frozen = _our_render(our_world(False), spp=48, **kw)
    assert np.abs(our_img - frozen).mean() > 0.01


def test_reference_parity_defocus_blur(ref):
    """Defocus-disk depth of field (camera.py:70-72, 125): a sharp in-focus
    sphere and a blurred out-of-focus one, both sides."""
    from core import Sphere, hittable_list
    from core.material import lambertian
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -2), 100,
                             lambertian.from_color(color(0.7, 0.7, 0.7))))
    rw.add(Sphere.stationary(point3(-0.5, 0, -2), 0.45,
                             lambertian.from_color(color(0.8, 0.2, 0.2))))
    rw.add(Sphere.stationary(point3(0.7, 0, -0.8), 0.3,
                             lambertian.from_color(color(0.2, 0.2, 0.8))))

    def our_world():
        ow = pt.HittableList()
        ow.add(pt.Sphere.stationary((0, -100.5, -2), 100,
                                    pt.Lambertian((0.7, 0.7, 0.7))))
        ow.add(pt.Sphere.stationary((-0.5, 0, -2), 0.45,
                                    pt.Lambertian((0.8, 0.2, 0.2))))
        ow.add(pt.Sphere.stationary((0.7, 0, -0.8), 0.3,
                                    pt.Lambertian((0.2, 0.2, 0.8))))
        return ow

    kw = dict(lookfrom=(0, 0.2, 1.0), lookat=(-0.5, 0, -2), vfov=50,
              width=30, height=20, depth=5, background=(0.70, 0.80, 1.00),
              defocus_angle=12.0, focus_distance=3.1)
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(our_world(), spp=48, **kw)
    _compare(ref_img, our_img, atol=0.04)
    # DoF is actually exercised: a pinhole render differs well beyond noise
    # (the near blue sphere smears over many pixels at 12 degrees).
    pin = dict(kw, defocus_angle=0.0)
    sharp = _our_render(our_world(), spp=48, **pin)
    assert np.abs(our_img - sharp).mean() > 0.01


def test_reference_parity_sss_simple(ref):
    """subsurface_simple (material.py:145-174): 50% displaced-exit diffuse."""
    from core import Sphere, hittable_list
    from core.material import lambertian, subsurface_simple
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.6, 0.6, 0.6))))
    rw.add(Sphere.stationary(point3(0, 0, -1), 0.5,
                             subsurface_simple(color(0.9, 0.6, 0.5), 0.4)))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                                pt.Lambertian((0.6, 0.6, 0.6))))
    ow.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                                pt.SubsurfaceSimple((0.9, 0.6, 0.5), 0.4)))

    kw = dict(lookfrom=(0, 0.3, 1.6), lookat=(0, 0, -1), vfov=55,
              width=26, height=18, depth=6, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    _compare(ref_img, our_img, atol=0.045)


def test_reference_parity_sss_volumetric(ref):
    """subsurface_volumetric (material.py:176-276): exponential free flight,
    probabilistic exit 1-exp(-d/2), sigma_a/sigma_t absorption, HG phase."""
    from core import Sphere, hittable_list
    from core.material import lambertian, subsurface_volumetric
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.6, 0.6, 0.6))))
    rw.add(Sphere.stationary(point3(0, 0, -1), 0.5,
                             subsurface_volumetric(color(0.85, 0.55, 0.45),
                                                   2.0, 0.3, 0.4)))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                                pt.Lambertian((0.6, 0.6, 0.6))))
    ow.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                                pt.SubsurfaceVolumetric((0.85, 0.55, 0.45),
                                                        2.0, 0.3, 0.4)))

    kw = dict(lookfrom=(0, 0.3, 1.6), lookat=(0, 0, -1), vfov=55,
              width=26, height=18, depth=6, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    _compare(ref_img, our_img, atol=0.05, rtol=0.15)


def test_reference_parity_checker_texture(ref):
    """checker_texture (texture.py:36-57): 3-D lattice parity with
    inv_scale = 1/scale — deterministic, so spatial pattern must agree."""
    from core import Sphere, hittable_list
    from core.material import lambertian
    from core.texture import checker_texture
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(
        point3(0, -100.5, -1), 100,
        lambertian.from_texture(checker_texture.from_colors(
            0.6, color(0.2, 0.3, 0.1), color(0.9, 0.9, 0.9)))))
    rw.add(Sphere.stationary(point3(0, 0, -1), 0.5,
                             lambertian.from_color(color(0.7, 0.3, 0.3))))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary(
        (0, -100.5, -1), 100,
        pt.Lambertian(pt.CheckerTexture(0.6, (0.2, 0.3, 0.1),
                                        (0.9, 0.9, 0.9)))))
    ow.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                                pt.Lambertian((0.7, 0.3, 0.3))))

    kw = dict(lookfrom=(0, 0.5, 1.8), lookat=(0, 0, -1), vfov=55,
              width=30, height=20, depth=5, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    _compare(ref_img, our_img, atol=0.04)
    # The checker is visible: the ground shows real spatial contrast.
    ground = our_img[13:, :, :].mean(axis=2)
    assert ground.std() > 0.05


def test_reference_parity_noise_texture(ref):
    """noise_texture marble (texture.py:84-90 + perlin.py).  Each side owns
    random Perlin tables, so the spatial pattern differs by construction —
    the comparable statistic is the global mean (sin phase is well mixed by
    the 10x turbulence term, so E[marble] -> 0.5 on both sides)."""
    from core import Sphere, hittable_list
    from core.material import lambertian
    from core.texture import noise_texture
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.5, 0.5, 0.5))))
    rw.add(Sphere.stationary(point3(0, 0, -1), 0.5,
                             lambertian.from_texture(noise_texture(4.0))))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                                pt.Lambertian((0.5, 0.5, 0.5))))
    ow.add(pt.Sphere.stationary((0, 0, -1), 0.5,
                                pt.Lambertian(pt.NoiseTexture(4.0))))

    kw = dict(lookfrom=(0, 0.3, 1.4), lookat=(0, 0, -1), vfov=55,
              width=26, height=18, depth=5, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    np.testing.assert_allclose(our_img.mean(), ref_img.mean(),
                               atol=0.05, rtol=0.10)
    # Marble is actually evaluated: the sphere area shows spatial banding.
    sphere_box = our_img[4:14, 8:18, :].mean(axis=2)
    assert sphere_box.std() > 0.03


def test_reference_parity_image_texture(ref, tmp_path):
    """image_texture (texture.py:61-80): clamped UV, V flip, float sampling.
    A quadrant-colored PNG on a camera-filling quad makes the mapping
    deterministic on both sides (and exercises the image-on-quads support
    the reference GPU lacks — kernels.py:1007-1009)."""
    from PIL import Image

    from core import hittable_list
    from core.material import lambertian
    from core.quad import quad
    from core.texture import image_texture
    from util import color, point3, vec3

    arr = np.zeros((16, 16, 3), np.uint8)
    arr[:8, :8] = (255, 40, 40)      # top-left (v near 1): red
    arr[:8, 8:] = (40, 255, 40)      # top-right: green
    arr[8:, :8] = (40, 40, 255)      # bottom-left: blue
    arr[8:, 8:] = (230, 230, 40)     # bottom-right: yellow
    png = tmp_path / "quadrants.png"
    Image.fromarray(arr).save(png)

    rw = hittable_list()
    rw.add(quad(point3(-1, -1, -1), vec3(2, 0, 0), vec3(0, 2, 0),
                lambertian.from_texture(image_texture(str(png)))))

    ow = pt.HittableList()
    ow.add(pt.Quad((-1, -1, -1), (2, 0, 0), (0, 2, 0),
                   pt.Lambertian(pt.ImageTexture(str(png)))))

    kw = dict(lookfrom=(0, 0, 1.0), lookat=(0, 0, -1), vfov=90,
              width=24, height=24, depth=4, background=(0.2, 0.2, 0.2))
    ref_img = _ref_render(ref, rw, spp=16, **kw)
    our_img = _our_render(ow, spp=32, **kw)
    _compare(ref_img, our_img, atol=0.04)
    # The quadrants land where the image says (the quad covers the central
    # half of the 24px frame, pixels ~6-18): red dominates the upper-left
    # quadrant area, blue the lower-left.
    assert our_img[7:11, 7:11, 0].mean() > 1.5 * our_img[7:11, 7:11, 2].mean()
    assert our_img[13:17, 7:11, 2].mean() > 1.5 * our_img[13:17, 7:11, 0].mean()


def test_reference_parity_triangles(ref):
    """Triangle geometry (Möller–Trumbore): metal + lambertian triangles
    over a ground sphere — the one primitive family the other parity tests
    don't touch (triangle.py:10-100; our packed-row form in
    ops/intersect.py)."""
    from core import Sphere, hittable_list
    from core.material import lambertian, metal
    from core.triangle import triangle
    from util import color, point3

    rw = hittable_list()
    rw.add(Sphere.stationary(point3(0, -100.5, -1), 100,
                             lambertian.from_color(color(0.6, 0.7, 0.5))))
    rw.add(triangle(point3(-1.2, 0, -1.5), point3(0.2, 0, -1.5),
                    point3(-0.5, 1.3, -1.4),
                    lambertian.from_color(color(0.8, 0.2, 0.2))))
    rw.add(triangle(point3(0.1, 0, -1.0), point3(1.4, 0, -1.2),
                    point3(0.8, 1.1, -1.1), metal(color(0.8, 0.7, 0.3), 0.1)))

    ow = pt.HittableList()
    ow.add(pt.Sphere.stationary((0, -100.5, -1), 100,
                                pt.Lambertian((0.6, 0.7, 0.5))))
    ow.add(pt.Triangle((-1.2, 0, -1.5), (0.2, 0, -1.5), (-0.5, 1.3, -1.4),
                       pt.Lambertian((0.8, 0.2, 0.2))))
    ow.add(pt.Triangle((0.1, 0, -1.0), (1.4, 0, -1.2), (0.8, 1.1, -1.1),
                       pt.Metal((0.8, 0.7, 0.3), 0.1)))

    kw = dict(lookfrom=(0, 0.5, 1.8), lookat=(0, 0.4, -1), vfov=60,
              width=30, height=20, depth=6, background=(0.70, 0.80, 1.00))
    ref_img = _ref_render(ref, rw, spp=24, **kw)
    our_img = _our_render(ow, spp=48, **kw)
    _compare(ref_img, our_img, atol=0.035)
