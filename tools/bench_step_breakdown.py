"""On-chip breakdown of the tiled traversal step's per-lane cost.

Times variants of ``ops.traverse._step_tiled`` with pieces removed, doing
REAL traversal work: rays walk the real BVH, and a lane whose walk finishes
is refilled at a varying node so every lane stays live every step.  All
carry leaves feed the next step and the returned checksum, so XLA cannot
dead-code-eliminate any piece (the first version of this probe refilled
``cur`` unconditionally — the whole stack/sort chain was dead and measured
0.0 ns; see docs/PERFORMANCE.md's measurement caution).

    python tools/bench_step_breakdown.py [n_rays] [scene] [--cpu]

Variants: full | no_stack (descend near child only, drop the rest) |
no_sort (descend unsorted) | no_leaf (box-t instead of prim tests) |
one_family | no_box (prim tests only).  Variants change traversal
*behavior*; the point is per-step cost, not work count — steps are fixed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import path_tracer_tpu as pt  # noqa: E402
from path_tracer_tpu import scenes as S  # noqa: E402
from path_tracer_tpu.ops import intersect as isect  # noqa: E402
from path_tracer_tpu.ops.types import (PAYLOAD, PRIM_ROW,  # noqa: E402
                                       BVH_EMPTY_SLOT)

INF = isect.INF


def make_step(bvh, sd, variant):
    """A _step_tiled clone with pieces removed (same shapes/layout)."""
    nodes = bvh.nodes

    def step(carry, rox, roy, roz, ivx, ivy, ivz, rdx, rdy, rdz, rr,
             time, t_min, iota, refill):
        cur, stack, sp, best_t, best_pt, best_pi = carry
        rows = nodes[cur]
        row = jnp.moveaxis(rows, -1, 0)

        cand_t, cand_p = [], []
        for i in range(4):
            ptr = row[24 + i].astype(jnp.int32)
            b = 6 * i
            if variant == "no_box":
                hi, ti = (ptr < BVH_EMPTY_SLOT), t_min
            else:
                hi, ti = isect.hit_aabb_s(row[b], row[b + 1], row[b + 2],
                                          row[b + 3], row[b + 4], row[b + 5],
                                          rox, roy, roz, ivx, ivy, ivz,
                                          t_min, best_t)
                hi = hi & (ptr < BVH_EMPTY_SLOT)
            is_leaf = ptr < 0
            if variant == "no_leaf":
                closer = (hi & is_leaf) & (ti < best_t)
                best_t = jnp.where(closer, ti, best_t)
                best_pt = jnp.where(closer, ptr, best_pt)
            else:
                mask = ((True, False, False) if variant == "one_family"
                        else bvh.prim_mask)
                pr = [row[PAYLOAD + PRIM_ROW * i + j] for j in range(14)]
                lhit, lt = isect.hit_prim_row_s(
                    pr, rox, roy, roz, rdx, rdy, rdz, rr, time, t_min,
                    best_t, mask=mask)
                closer = (hi & is_leaf) & lhit & (lt < best_t)
                best_t = jnp.where(closer, lt, best_t)
                best_pt = jnp.where(closer, pr[0].astype(jnp.int32), best_pt)
                best_pi = jnp.where(closer, pr[1].astype(jnp.int32), best_pi)
            cand_t.append(jnp.where(hi & ~is_leaf, ti, INF))
            cand_p.append(ptr)

        if variant != "no_sort":
            def cswap(a, b):
                swap = cand_t[a] > cand_t[b]
                ta = jnp.where(swap, cand_t[b], cand_t[a])
                tb = jnp.where(swap, cand_t[a], cand_t[b])
                pa = jnp.where(swap, cand_p[b], cand_p[a])
                pb = jnp.where(swap, cand_p[a], cand_p[b])
                cand_t[a], cand_t[b] = ta, tb
                cand_p[a], cand_p[b] = pa, pb

            for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                cswap(a, b)

        valid = [t < INF for t in cand_t]

        if variant == "no_stack":
            # Descend the near child only; a drained lane refills.
            nxt = jnp.where(valid[0], cand_p[0], refill)
        else:
            depth_cap = jnp.int32(sd)
            for k in (3, 2, 1):
                push = (iota == sp[None]) & valid[k][None]
                stack = jnp.where(push, cand_p[k][None], stack)
                sp = jnp.minimum(sp + valid[k].astype(jnp.int32), depth_cap)
            can_pop = sp > 0
            popped = jnp.sum(jnp.where(iota == (sp - 1)[None], stack, 0),
                             axis=0)
            nxt = jnp.where(valid[0], cand_p[0],
                            jnp.where(can_pop, popped, refill))
            done = (~valid[0]) & ~can_pop
            # Refilled lanes restart with a reset best so they keep testing.
            best_t = jnp.where(done, 1e9, best_t)
            sp = sp - ((~valid[0]) & can_pop).astype(jnp.int32)
        return nxt, stack, sp, best_t, best_pt, best_pi

    return step


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "vol2_final_scene"
    world, cam = S.SCENES[scene_name]()
    scene = pt.compile_scene(world)
    bvh = pt.build_from_scene(scene)
    sd = bvh.max_stack
    n_nodes = bvh.nodes.shape[0]
    print(f"scene={scene_name} nodes={n_nodes} sd={sd} rays={n_rays} "
          f"mask={bvh.prim_mask}", flush=True)

    R = n_rays
    shape = (R // 128, 128)
    key = jax.random.key(0)
    k = iter(jax.random.split(key, 12))
    # Rays aimed at the scene so walks are deep and lanes stay busy.
    lookfrom = jnp.asarray(cam.lookfrom, jnp.float32)
    scale = float(jnp.maximum(1.0, jnp.linalg.norm(lookfrom))) or 10.0
    ro = lookfrom + jax.random.normal(next(k), (R, 3)) * 0.1 * scale
    tgt = jax.random.uniform(next(k), (R, 3), minval=-0.5, maxval=0.5) * scale
    rd = tgt - ro
    g = lambda a: a.reshape(shape)  # noqa: E731
    rox, roy, roz = g(ro[:, 0]), g(ro[:, 1]), g(ro[:, 2])
    rdx, rdy, rdz = g(rd[:, 0]), g(rd[:, 1]), g(rd[:, 2])
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    rr = rdx * rdx + rdy * rdy + rdz * rdz
    tme = jnp.zeros(shape)
    t_min = jnp.full(shape, 1e-3)
    iota = jax.lax.broadcasted_iota(jnp.int32, (sd,) + shape, 0)
    refill0 = jax.random.randint(next(k), shape, 0, n_nodes, jnp.int32)
    root = jnp.maximum(bvh.root, 0)
    cur0 = jnp.full(shape, root, jnp.int32)
    stack0 = jnp.zeros((sd,) + shape, jnp.int32)
    sp0 = jnp.zeros(shape, jnp.int32)
    bt0 = jnp.full(shape, 1e9)

    N_STEPS = 64

    def make_loop(variant):
        step = make_step(bvh, sd, variant)

        @jax.jit
        def loop(cur, stack, sp, bt):
            def body(i, c):
                refill = (refill0 + i) % n_nodes
                return step(c, rox, roy, roz, ivx, ivy, ivz,
                            rdx, rdy, rdz, rr, tme, t_min, iota, refill)
            z = jnp.full(shape, -1, jnp.int32)
            out = jax.lax.fori_loop(0, N_STEPS, body,
                                    (cur, stack, sp, bt, z, z))
            # Checksum over every carry leaf: nothing is dead.
            return (out[3].sum() + out[0].sum() + out[2].sum()
                    + out[4].sum() + out[1][0].sum())

        return loop

    results = {}
    for variant in ["full", "no_stack", "no_sort", "no_leaf", "one_family",
                    "no_box"]:
        loop = make_loop(variant)
        t0 = time.perf_counter()
        out = loop(cur0, stack0, sp0, bt0)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = loop(cur0, stack0, sp0, bt0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        ns = dt / (R * N_STEPS) * 1e9
        results[variant] = ns
        print(f"{variant:12s} {ns:7.2f} ns/lane/step   "
              f"(compile {compile_s:.1f}s)", flush=True)

    full = results["full"]
    for v, ns in results.items():
        if v != "full":
            print(f"  {v:12s} saves {full - ns:6.2f} ns "
                  f"({(full - ns) / full * 100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
