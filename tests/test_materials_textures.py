"""Shading-level tests: texture dispatch, emission, scatter families."""
import jax
import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
from path_tracer_tpu.ops import shade
from path_tracer_tpu.ops.types import (MAT_DIELECTRIC, MAT_EMISSIVE,
                                       MAT_LAMBERTIAN, MAT_METAL)
from path_tracer_tpu.utils import vec


def _scene_with(mats, tex=None):
    w = pt.HittableList()
    for i, m in enumerate(mats):
        w.add(pt.Sphere.stationary((2.0 * i, 0, 0), 0.5, m))
    return pt.compile_scene(w)


def test_checker_parity():
    scene = _scene_with([pt.Lambertian(
        pt.CheckerTexture(1.0, (1, 0, 0), (0, 0, 1)))])
    flags = shade.SceneFlags.from_scene(scene)
    tex_idx = scene.mat_tex[0]
    z = jnp.zeros(())
    c_even = shade.eval_texture(scene, flags, tex_idx, z, z,
                                jnp.array([0.5, 0.5, 0.5]))
    c_odd = shade.eval_texture(scene, flags, tex_idx, z, z,
                               jnp.array([1.5, 0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(c_even), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_odd), [0, 0, 1], atol=1e-6)


def test_noise_texture_range():
    scene = _scene_with([pt.Lambertian(pt.NoiseTexture(4.0))])
    flags = shade.SceneFlags.from_scene(scene)
    pts = jax.random.uniform(jax.random.key(0), (256, 3)) * 10.0
    z = jnp.zeros((256,))
    cols = jax.vmap(lambda p, u, v: shade.eval_texture(
        scene, flags, scene.mat_tex[0], u, v, p))(pts, z, z)
    c = np.asarray(cols)
    # Marble: color(.5,.5,.5)*(1+sin(...)) = 0.5*(1+sin) per channel, in [0,1].
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-6
    assert c.std() > 0.05  # actually varies


def test_missing_image_falls_back_magenta():
    scene = _scene_with([pt.Lambertian(pt.ImageTexture("no_such_file.jpg"))])
    flags = shade.SceneFlags.from_scene(scene)
    z = jnp.zeros(())
    c = shade.eval_texture(scene, flags, scene.mat_tex[0], z, z, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(c), [1, 0, 1], atol=1e-6)


def test_image_texture_sampling(tmp_path):
    """2x2 image: UV corners map to the right texels with V flipped."""
    from PIL import Image

    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0, 0] = (255, 0, 0)    # top-left
    arr[0, 1] = (0, 255, 0)    # top-right
    arr[1, 0] = (0, 0, 255)    # bottom-left
    arr[1, 1] = (255, 255, 0)  # bottom-right
    p = tmp_path / "t.png"
    Image.fromarray(arr).save(p)
    scene = _scene_with([pt.Lambertian(pt.ImageTexture(str(p)))])
    flags = shade.SceneFlags.from_scene(scene)

    def sample(u, v):
        return np.asarray(shade.eval_texture(
            scene, flags, scene.mat_tex[0], jnp.asarray(u), jnp.asarray(v),
            jnp.zeros(3)))

    # u=0,v=1 → image row 0 (v flipped), col 0 → red (texture.py:70-80).
    np.testing.assert_allclose(sample(0.0, 0.99), [1, 0, 0], atol=0.02)
    np.testing.assert_allclose(sample(0.99, 0.99), [0, 1, 0], atol=0.02)
    np.testing.assert_allclose(sample(0.0, 0.0), [0, 0, 1], atol=0.02)


def test_emitted_only_for_lights():
    scene = _scene_with([pt.Lambertian((0.5, 0.5, 0.5)),
                         pt.DiffuseLight((4, 5, 6))])
    flags = shade.SceneFlags.from_scene(scene)
    z = jnp.zeros(())
    e0 = shade.emitted(scene, flags, jnp.int32(0), z, z, jnp.zeros(3))
    e1 = shade.emitted(scene, flags, jnp.int32(1), z, z, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(e0), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e1), [4, 5, 6], atol=1e-6)


def _scatter(scene, mat_idx, normal, rd, key=0, front=True):
    flags = shade.SceneFlags.from_scene(scene)
    return shade.scatter(scene, flags, 16, jnp.int32(mat_idx),
                         jnp.zeros(3), jnp.asarray(normal, jnp.float32),
                         jnp.asarray(front), jnp.zeros(()), jnp.zeros(()),
                         jnp.asarray(rd, jnp.float32), jax.random.key(key))


def test_lambertian_scatter_upper_hemisphere():
    scene = _scene_with([pt.Lambertian((0.6, 0.3, 0.1))])
    for k in range(32):
        ok, o, d, a = _scatter(scene, 0, [0, 0, 1], [0, 0, -1], key=k)
        assert bool(ok)
        assert float(vec.vdot(d, jnp.array([0.0, 0.0, 1.0]))) > -1e-6
        np.testing.assert_allclose(np.asarray(a), [0.6, 0.3, 0.1], atol=1e-6)


def test_metal_perfect_mirror():
    scene = _scene_with([pt.Metal((0.9, 0.9, 0.9), 0.0)])
    rd = vec.normalize(jnp.array([1.0, 0.0, -1.0]))
    ok, o, d, a = _scatter(scene, 0, [0, 0, 1], rd)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(vec.normalize(d)),
                               np.asarray(vec.normalize(jnp.array([1.0, 0.0, 1.0]))),
                               atol=1e-5)


def test_dielectric_tir():
    """Total internal reflection: grazing exit from inside glass reflects."""
    scene = _scene_with([pt.Dielectric(1.5)])
    rd = vec.normalize(jnp.array([1.0, 0.0, -0.2]))  # shallow from inside
    ok, o, d, a = _scatter(scene, 0, [0, 0, 1], rd, front=False)
    assert bool(ok)
    # Reflected → z-component flips sign (stays on incident side).
    assert float(d[2]) > 0
    np.testing.assert_allclose(np.asarray(a), 1.0, atol=1e-6)


def test_dielectric_refracts_head_on():
    scene = _scene_with([pt.Dielectric(1.5)])
    rd = jnp.array([0.0, 0.0, -1.0])
    # Head-on: reflectance = ((1-1.5)/(2.5))^2 = 0.04 → almost always refract.
    refracted = 0
    for k in range(64):
        ok, o, d, a = _scatter(scene, 0, [0, 0, 1], rd, key=k)
        if float(d[2]) < 0:
            refracted += 1
    assert refracted > 55


def test_sss_volumetric_terminates_or_exits():
    scene = _scene_with([pt.SubsurfaceVolumetric((0.2, 0.5, 0.2), 0.08, 0.8, 0.7)])
    exits = 0
    for k in range(64):
        ok, o, d, a = _scatter(scene, 0, [0, 0, 1], [0, 0, -1], key=k)
        if bool(ok):
            exits += 1
            assert np.isfinite(np.asarray(o)).all()
            assert np.isfinite(np.asarray(d)).all()
    assert 0 < exits < 64  # both outcomes occur for this absorbing medium


def test_eval_texture_batched_matches_perlane():
    """Batched texture eval == per-lane eval on every family + both sparse
    and overflow noise paths (the compaction budget is 256)."""
    scene = _scene_with([
        pt.Lambertian(pt.NoiseTexture(2.0)),
        pt.Lambertian(pt.CheckerTexture(1.0, (1, 0, 0), (0, 0, 1))),
        pt.Lambertian((0.2, 0.4, 0.6)),
    ])
    flags = shade.SceneFlags.from_scene(scene)
    R = 512
    key = jax.random.key(3)
    pts = jax.random.uniform(key, (R, 3), minval=-5.0, maxval=5.0)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    v = jax.random.uniform(jax.random.fold_in(key, 2), (R,))

    for frac, name in ((0.02, "sparse"), (1.0, "overflow")):
        n_noise = int(R * frac)
        tex_idx = jnp.where(jnp.arange(R) < n_noise, scene.mat_tex[0],
                            jnp.where(jnp.arange(R) % 2 == 0,
                                      scene.mat_tex[1], scene.mat_tex[2]))
        got = shade.eval_texture_batched(scene, flags, tex_idx, u, v, pts)
        want = jax.vmap(lambda t, uu, vv, p: shade.eval_texture(
            scene, flags, t, uu, vv, p))(tex_idx, u, v, pts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=name)

    # valid mask: masked-out noise lanes may differ, valid lanes must match.
    tex_idx = jnp.where(jnp.arange(R) % 7 == 0, scene.mat_tex[0],
                        scene.mat_tex[2])
    valid = jnp.arange(R) % 2 == 0
    got = shade.eval_texture_batched(scene, flags, tex_idx, u, v, pts,
                                     valid=valid)
    want = jax.vmap(lambda t, uu, vv, p: shade.eval_texture(
        scene, flags, t, uu, vv, p))(tex_idx, u, v, pts)
    np.testing.assert_allclose(np.asarray(got)[np.asarray(valid)],
                               np.asarray(want)[np.asarray(valid)],
                               atol=1e-6)
