"""Multi-host rendering: 2 real OS processes × 2 virtual CPU devices each,
federated with ``jax.distributed.initialize`` + gloo collectives, must
produce the same image as a single-process render (SURVEY.md §2.8 — tested
with the fake-backend pattern since no TPU pod is attached).

The subprocesses drive the *public CLI* (``--coordinator/--num-processes/
--process-id/--local-devices``), so this also smoke-tests the multi-host
entry wiring end to end.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import path_tracer_tpu as pt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("scene,width,spp", [("wavefront_comparison", 32, 4)])
def test_two_process_render_matches_single(tmp_path, scene, width, spp):
    port = _free_port()
    out = str(tmp_path / "mh.npz")
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "path_tracer_tpu.render.cli",
               "--scene", scene, "--width", str(width), "--spp", str(spp),
               "--seed", "3",
               "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--local-devices", "2",
               "--out", out]
        env = dict(os.environ)
        # Subprocesses must pick their own backend via the CLI flags — drop
        # the parent test session's CPU-mesh overrides.
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = ""
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{o[-3000:]}"
    assert "2 local / 4 global devices" in outs[0] + outs[1]

    with np.load(out) as z:
        mh = z["img"]

    # Single-process reference (this test process: 8-device CPU mesh).
    world, cam = pt.scenes.SCENES[scene]()
    cam.img_width = width
    cam.samples_per_pixel = spp
    single = np.asarray(
        pt.Renderer(world, cam, engine="wavefront", seed=3).render(
            spp=spp, batch=spp))

    assert mh.shape == single.shape
    d = np.abs(mh - single)
    # Per-pixel radiance is keyed by (sample, pixel) → identical across any
    # sharding; tolerate float reassociation + the rare chaotic pixel from
    # the different compilation (same robustness rationale as test_golden).
    assert float(d.mean()) < 3e-5
    assert float((d.max(axis=-1) > 1e-4).mean()) <= 0.01


@pytest.mark.slow
def test_two_process_kill_and_resume(tmp_path):
    """Preemption story for the multi-host path (SURVEY §5.3/§5.4, VERDICT
    r3 #5): run the 2-process CLI with per-sample checkpoints, SIGINT it
    mid-render, rerun the same command, and require the resumed image to
    equal the uninterrupted run's bit-for-bit (batch boundaries aligned at
    1 sample; radiance is keyed by global (sample, pixel) so resume
    accumulates exactly the missing samples)."""
    import signal
    import time

    scene, width, spp = "wavefront_comparison", 32, 6

    def launch(out, ckpt=None):
        procs = []
        port = _free_port()
        for pid in range(2):
            cmd = [sys.executable, "-m", "path_tracer_tpu.render.cli",
                   "--scene", scene, "--width", str(width),
                   "--spp", str(spp), "--seed", "3", "--batch", "1",
                   "--coordinator", f"127.0.0.1:{port}",
                   "--num-processes", "2", "--process-id", str(pid),
                   "--local-devices", "2", "--out", out]
            if ckpt:
                cmd += ["--checkpoint", ckpt, "--checkpoint-every", "1"]
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env["JAX_PLATFORMS"] = ""
            procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                          stdout=subprocess.PIPE,
                                          stderr=subprocess.STDOUT,
                                          text=True))
        return procs

    def drain(procs, timeout=420):
        outs = []
        for p in procs:
            try:
                o, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(o)
        return outs

    # --- uninterrupted reference ---
    ref_out = str(tmp_path / "ref.npz")
    procs = launch(ref_out)
    outs = drain(procs)
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"ref process {i} failed:\n{o[-3000:]}"
    with np.load(ref_out) as z:
        ref = z["img"]

    # --- interrupted run: SIGINT once >= 2 samples are checkpointed ---
    ck = str(tmp_path / "mh.ckpt.npz")
    out2 = str(tmp_path / "resumed.npz")
    procs = launch(out2, ckpt=ck)
    deadline = time.time() + 400
    seen = 0
    while time.time() < deadline:
        if os.path.exists(ck):
            try:
                with np.load(ck) as z:
                    seen = int(z["samples_done"])
            except Exception:
                pass  # mid-replace; retry
            if seen >= 2:
                break
        if any(p.poll() is not None for p in procs):
            break  # finished before we could interrupt — fail below
        time.sleep(0.25)
    assert 0 < seen < spp, f"never saw a partial checkpoint (seen={seen})"
    for p in procs:
        p.send_signal(signal.SIGINT)
    try:
        drain(procs, timeout=120)
    except subprocess.TimeoutExpired:
        pass  # a SIGINT landing inside a collective may wedge; state is on disk
    with np.load(ck) as z:
        assert 0 < int(z["samples_done"]) < spp

    # --- resume: same command, runs to completion ---
    outs = drain(launch(out2, ckpt=ck))
    joined = outs[0] + outs[1]
    assert "resuming at sample" in joined, joined[-2000:]
    with np.load(out2) as z:
        resumed = z["img"]
    np.testing.assert_allclose(resumed, ref, atol=1e-7)
    with np.load(ck) as z:
        assert int(z["samples_done"]) == spp
