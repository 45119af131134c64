"""Persistent TPU job worker: keeps one warm JAX/TPU context and execs job
files, avoiding the multi-minute tunnel re-initialisation that a fresh
process pays (and the wedging that killing a mid-flight TPU client causes).

Protocol: drop ``<name>.py`` into the job dir; the worker execs it (sharing
one warm interpreter: jax + path_tracer_tpu preimported) and writes stdout +
traceback to ``<name>.out``, then renames the job to ``<name>.done``.
Stop with a job file containing ``WORKER_EXIT = True``.

Usage: python tools/tpu_worker.py [jobdir=/tmp/tpu_jobs]
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(JOBDIR, exist_ok=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp  # noqa: F401
    import numpy as np  # noqa: F401

    import path_tracer_tpu as pt  # noqa: F401

    # Warm the device with a trivial op.
    jax.block_until_ready(jnp.ones((8, 128)) + 1)
    with open(os.path.join(JOBDIR, "READY"), "w") as f:
        f.write(f"{time.time()} devices={jax.devices()}\n")
    print("worker ready", flush=True)

    shared = {"jax": jax, "jnp": jnp, "np": np, "pt": pt}
    while True:
        jobs = sorted(f for f in os.listdir(JOBDIR) if f.endswith(".py"))
        if not jobs:
            time.sleep(0.5)
            continue
        name = jobs[0]
        path = os.path.join(JOBDIR, name)
        with open(path) as f:
            src = f.read()
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            env = dict(shared)
            exec(compile(src, name, "exec"), env)
            status = "OK"
            if env.get("WORKER_EXIT"):
                sys.stdout = old
                os.rename(path, path[:-3] + ".done")
                with open(path[:-3] + ".out", "w") as f:
                    f.write(buf.getvalue() + "\nWORKER EXITING\n")
                return
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERROR"
        finally:
            sys.stdout = old
        with open(path[:-3] + ".out", "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[{status} in {time.time()-t0:.2f}s]\n")
        os.rename(path, path[:-3] + ".done")


if __name__ == "__main__":
    main()
