"""Inverse-rendering convergence: recover known Cornell parameters.

The north-star capability test (VERDICT r3 next-round #2): perturb the
light emission (x0.5) and the red wall albedo (repainted gray), optimize
with the data-parallel backward wavefront + unbiased two-sample gradients
(tools/train_demo.py drives the same entry points), and assert both
parameter rows come back within 5% relative error.  The reference cannot
express this at all (no gradients anywhere — SURVEY.md §2.7).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_cornell_inverse_rendering_recovers_params():
    from tools.train_demo import run_demo

    out = run_demo(steps=220, width=40, height=40, spp=4, target_spp=48,
                   max_depth=6, lr=0.1, seed=0, queue_size=2048,
                   steps_per_wave=8, log_every=50, verbose=True)
    err_albedo, err_emission = out["rel_err"]
    assert err_emission < 0.05, (
        f"light emission not recovered: {err_emission:.3f} rel err "
        f"(true {out['true'][1]}, got {out['recovered'][1]})")
    assert err_albedo < 0.05, (
        f"red-wall albedo not recovered: {err_albedo:.3f} rel err "
        f"(true {out['true'][0]}, got {out['recovered'][0]})")
    # The loss must actually have descended (not just wandered).
    first = out["history"][0]["loss"]
    last10 = sum(h["loss"] for h in out["history"][-10:]) / 10
    assert last10 < first * 0.5
