"""Golden-image regression tests at graded scene complexity (SURVEY.md §4:
the reference's de-facto strategy — golden scenes per docs/TESTING_GUIDE.md —
made automatic: fixed seeds, tiny renders, compared against stored arrays).

Two robustness choices, both learned the hard way:

* Engine parameters (queue size, steps per wave) are FIXED here, not taken
  from the renderer's tuning heuristics — retuning perf knobs must not churn
  goldens.
* The comparison tolerates a small fraction of chaotic pixels.  A path
  tracer's trajectories are chaotic: any fusion-level float change (a new
  XLA version, a different device count, a relayout) can flip a dielectric
  coin or a closest-hit tie on isolated paths, moving single pixels by
  O(0.1) at 4 spp while the image is unchanged.  Real physics bugs shift
  *many* pixels; the assert therefore bounds the mean error tightly and the
  outlier count loosely.

Regenerate goldens (after an *intentional* change to sampling/shading):

    python -m pytest tests/test_golden.py --regen   # via conftest env!
    (or: python tests/test_golden.py --regen — but then goldens must be
     regenerated under the SAME device config the suite runs with)
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu import scenes as S
from path_tracer_tpu.ops import wavefront
from path_tracer_tpu.ops.shade import SceneFlags
from path_tracer_tpu.ops.types import RenderConfig

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# name -> (scene fn, width, spp, depth)  (BASELINE.json config ladder)
CASES = {
    "wavefront_comparison": (lambda: S.wavefront_comparison(), 32, 4, 6),
    "cornell_box": (lambda: S.cornell_box(), 24, 4, 6),
    "cornell_smoke": (lambda: S.cornell_smoke(), 24, 4, 8),
    "vol2_sec2_6_motion_dof": (lambda: S.vol2_sec2_6(), 32, 4, 6),
    "subsurface": (lambda: S.subsurface_scattering(), 24, 4, 8),
    "vol2_final_small": (lambda: S.vol2_final_scene(sphere_cluster=40), 24, 2, 6),
    # Mid-size flagship golden (VERDICT r3 #8): 128x72 @ 32 spp on the
    # 300-object final-scene family.  The 24-px goldens catch gross breaks
    # but a few-percent energy drift on one FEATURE (e.g. the r3 marble
    # 0.5x brightness bug) hides in their handful of affected pixels; at
    # 128x72x32spp every feature (marble, earth image, fog, motion blur,
    # glass) covers hundreds of pixels and the trimmed-mean bound of 3e-5
    # corresponds to a ~0.01% global energy drift (image mean ~0.3) — a
    # 1% drift on JUST the marble sphere (~4% of pixels here) moves the
    # trimmed mean by ~1e-4, still 3x the bound.
    "vol2_final_mid": (lambda: S.vol2_final_scene(sphere_cluster=300),
                       128, 32, 8),
    # High-poly stress (VERDICT r4 #4): the 51,200-triangle torus knot —
    # the scale regime the reference's 4,096-triangle cap cannot hold.
    "mesh_hipoly": (lambda: S.mesh_hipoly(), 32, 2, 6),
}


def _render(name):
    fn, width, spp, depth = CASES[name]
    world, cam = fn()
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    height = max(1, int(width / cam.aspect_ratio))
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       max_depth=depth)
    accum = jnp.zeros((height, width, 3), jnp.float32)
    out = wavefront.render_batch(scene, flags, bvh, cam.initialize(), cfg,
                                 accum, 0, spp, jax.random.key(123),
                                 queue_size=2048, steps_per_wave=8)
    return np.asarray(out) / spp


def _assert_golden_close(img, ref):
    """Tight on the *trimmed* mean, loose on chaotic outliers (≤1% of pixels).

    The mean is taken with the worst 1% of pixels excluded: a flipped
    light-carrying path ("firefly") at low spp moves one pixel by O(1) —
    e.g. a closest-hit tie on the shared edge of two ground quads resolving
    differently after a BVH-layout change — which would blow an untrimmed
    mean bound while the image is unchanged.  Real physics bugs shift many
    pixels, which the trimmed mean still catches; a global brightness drift
    is caught too (it moves every pixel).
    """
    assert img.shape == ref.shape
    d = np.abs(img - ref)
    assert np.isfinite(img).all()
    dpix = d.max(axis=-1).ravel()
    keep = max(1, int(np.ceil(dpix.size * 0.99)))
    trimmed = np.sort(dpix)[:keep]
    mean = float(trimmed.mean())
    outliers = float((dpix > 1e-4).mean())
    assert mean < 3e-5, f"trimmed mean abs diff {mean} too large"
    assert outliers <= 0.01, f"{outliers:.2%} pixels differ > 1e-4"


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {path} (run --regen)")
    img = _render(name)
    with np.load(path) as z:
        ref = z["img"]
    _assert_golden_close(img, ref)


def _regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in sorted(CASES):
        img = _render(name)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                            img=np.asarray(img, np.float32))
        print(f"wrote {name}: mean={float(np.mean(img)):.4f}")


if __name__ == "__main__":
    import sys

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        _regen()
    elif "--regen-one" in sys.argv:
        name = sys.argv[sys.argv.index("--regen-one") + 1]
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        img = _render(name)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                            img=np.asarray(img, np.float32))
        print(f"wrote {name}: mean={float(np.mean(img)):.4f}")
