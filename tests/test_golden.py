"""Golden-image regression tests at graded scene complexity (SURVEY.md §4:
the reference's de-facto strategy — golden scenes per docs/TESTING_GUIDE.md —
made automatic: fixed seeds, tiny renders, allclose against stored arrays).

Regenerate goldens (after an *intentional* change to sampling/shading):

    python tests/test_golden.py --regen
"""
import os

import numpy as np
import pytest

import path_tracer_tpu as pt
from path_tracer_tpu import scenes as S

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# name -> (scene fn, width, spp, depth)  (BASELINE.json config ladder)
CASES = {
    "wavefront_comparison": (lambda: S.wavefront_comparison(), 32, 4, 6),
    "cornell_box": (lambda: S.cornell_box(), 24, 4, 6),
    "cornell_smoke": (lambda: S.cornell_smoke(), 24, 4, 8),
    "vol2_sec2_6_motion_dof": (lambda: S.vol2_sec2_6(), 32, 4, 6),
    "subsurface": (lambda: S.subsurface_scattering(), 24, 4, 8),
    "vol2_final_small": (lambda: S.vol2_final_scene(sphere_cluster=40), 24, 2, 6),
}


def _render(name):
    fn, width, spp, depth = CASES[name]
    world, cam = fn()
    cam.img_width = width
    cam.samples_per_pixel = spp
    cam.max_depth = depth
    r = pt.Renderer(world, cam, engine="wavefront", seed=123)
    return r.render(spp=spp, batch=spp)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {path} (run --regen)")
    img = _render(name)
    with np.load(path) as z:
        ref = z["img"]
    assert img.shape == ref.shape
    np.testing.assert_allclose(img, ref, atol=1e-4, rtol=1e-3)


if __name__ == "__main__":
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in sorted(CASES):
            img = _render(name)
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                img=np.asarray(img, np.float32))
            print(f"wrote {name}: mean={float(np.mean(img)):.4f}")
