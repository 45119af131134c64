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
                spp, depth, background):
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
                depth, background):
    cam = pt.Camera()
    cam.aspect_ratio = width / height
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    cam.vfov = vfov
    cam.lookfrom = np.asarray(lookfrom, np.float64)
    cam.lookat = np.asarray(lookat, np.float64)
    cam.background = np.asarray(background, np.float64)
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
