"""Gather roofline probes: is the BVH-traversal row gather at speed of light?

The wavefront traversal step issues ONE (R,)-indexed row gather from the
(B, 80) packed BVH4 node table per step, and round-2 measurement showed that
gather alone costs as much as the whole step — so the question "can a Pallas
kernel beat the XLA traversal?" reduces to "can anything on this chip gather
scattered rows faster than XLA's gather op?".  This tool measures every
alternative we could think of (results for v5e in docs/PERFORMANCE.md):

1. XLA gather: cost vs row width (flat → per-row issue-bound, not BW-bound),
   vs table size, vs dtype, vs index order (sorted == random).
2. One-hot MXU matmul "gather" (exact for f32 accumulation).
3. Pallas/Mosaic formulations of a vector gather — all fail to lower:
   Mosaic's only dynamic gather is lane-wise within replicated tables, which
   cannot express a per-lane row pointer chase at real scene sizes.

Run on the chip:  python tools/bench_gather.py      (or via tools/tpu_worker)
On CPU the numbers are meaningless; this is a TPU probe.
"""
import sys
import time

import jax
import jax.numpy as jnp

R = 16384


def bench(name, fn, arg, bytes_per_iter, iters=100, lanes=None):
    """Time ``fn(arg, n)``.  ``fn`` must genuinely perform ``n`` iterations
    of work (loop inside jit); ``lanes`` defaults to the global R."""
    lanes = lanes if lanes is not None else R
    try:
        x = fn(arg, 1)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        x = fn(arg, iters)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt / lanes * 1e9:6.2f} ns/lane  "
              f"{bytes_per_iter / dt / 1e9:7.1f} GB/s-eff")
    except Exception as e:  # lowering failures are data, not errors
        first = (str(e).splitlines() or [""])[0]
        print(f"{name}: FAIL {type(e).__name__}: {first[:160]}")


def xla_gathers():
    print("== XLA gather scaling (loop inside jit; indices perturbed per "
          "iter so nothing hoists) ==")

    def make(B, W, dtype):
        tab = jax.random.normal(jax.random.key(0), (B, W)).astype(dtype)
        idx0 = jax.random.randint(jax.random.key(2), (R,), 0, B)

        @jax.jit
        def loop(idx, n):
            def body(i, acc):
                rows = tab[((idx + i) % B).reshape(R // 128, 128)]
                return acc + rows.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, 0.0)

        return loop, idx0, R * W * jnp.dtype(dtype).itemsize

    for W in (8, 16, 28, 40, 80, 160):
        loop, idx, by = make(2048, W, jnp.float32)
        bench(f"gather B=2048 W={W:4d} f32 ", loop, idx, by)
    for B in (256, 2048, 65536):
        loop, idx, by = make(B, 80, jnp.float32)
        bench(f"gather B={B:5d} W=80  f32 ", loop, idx, by)
    loop, idx, by = make(2048, 80, jnp.bfloat16)
    bench("gather B=2048 W=80  bf16", loop, idx, by)
    loop, idx, by = make(2048, 80, jnp.float32)
    bench("gather sorted idx       ", loop, jnp.sort(idx), by)

    # Dense-stream baseline: the same bytes read contiguously.
    tab = jax.random.normal(jax.random.key(0), (R, 80), jnp.float32)

    @jax.jit
    def stream(z, n):
        def body(i, acc):
            return acc + (tab + i * 1e-12).sum()
        return jax.lax.fori_loop(0, n, body, z)

    bench("dense stream same bytes ", stream, jnp.float32(0), R * 80 * 4)


def onehot_mxu():
    print("== one-hot MXU matmul as a gather (exact: one nonzero per row) ==")
    for B in (512, 2048):
        tab = jax.random.normal(jax.random.key(0), (B, 80), jnp.float32)
        idx0 = jax.random.randint(jax.random.key(2), (R,), 0, B)

        @jax.jit
        def loop(idx, n, tab=tab, B=B):
            def body(i, acc):
                ix = (idx + i) % B
                oh = (ix[:, None] == jnp.arange(B)[None, :]).astype(jnp.float32)
                rows = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
                return acc + rows.sum()
            return jax.lax.fori_loop(0, n, body, 0.0)

        bench(f"onehot-dot B={B:4d} f32    ", loop, idx0, R * 80 * 4)


def pallas_formulations():
    print("== Pallas/Mosaic vector-gather formulations ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, W = 512, 80
    table = jax.random.normal(jax.random.key(0), (B, W), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (R,), 0, B)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(kernel, out_shape, args, n):
        # n real invocations (the lambdas below are timed per-iteration).
        out = None
        for _ in range(n):
            out = pl.pallas_call(kernel, out_shape=out_shape,
                                 in_specs=[vm] * len(args),
                                 out_specs=vm)(*args)
        return out

    def k_index(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    tableC = jnp.broadcast_to(table[:, :1], (B, 128))
    idxC = idx[:1024].reshape(8, 128)

    def k_taa(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    bench("pallas tab[idx, :]      ",
          lambda a, n: call(k_index, jax.ShapeDtypeStruct((R, W), jnp.float32),
                            (table, a), n), idx, R * W * 4, iters=10)
    bench("pallas jnp.take axis=0  ",
          lambda a, n: call(k_take, jax.ShapeDtypeStruct((R, W), jnp.float32),
                            (table, a), n), idx, R * W * 4, iters=10)
    bench("pallas take_along lane  ",
          lambda a, n: call(k_taa, jax.ShapeDtypeStruct((8, 128), jnp.float32),
                            (tableC, a), n), idxC, 1024 * 4, iters=10,
          lanes=1024)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    xla_gathers()
    onehot_mxu()
    pallas_formulations()
