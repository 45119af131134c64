"""Multi-chip rendering + differentiable training over a device mesh.

The distributed layer the reference lacks entirely (SURVEY.md §2.7/§2.8):

* **Data parallel**: pixels are sharded across the mesh axis ``"d"`` via
  ``shard_map``; every device traces its own tile with the scene SoA +
  flattened BVH replicated (the default for scenes that fit HBM).  Ray
  independence means the forward pass needs *zero* collectives — accumulation
  stays device-local and the output image is sharded by rows.
* **Gradient parallel**: :func:`train_step` computes per-shard pixel loss and
  ``psum``s parameter gradients over ICI, the renderer analogue of
  data-parallel training (BASELINE.json north star).
* **Multi-host**: the same code runs under ``jax.distributed.initialize``;
  tests exercise it on a virtual 8-device CPU mesh
  (``--xla_force_host_platform_device_count``), the fake-backend pattern from
  SURVEY.md §4.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import integrator
from ..ops.shade import SceneFlags
from ..ops.types import RenderConfig


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_devices: int | None = None) -> None:
    """Join a multi-host JAX job (SURVEY.md §2.8 — the first-class layer the
    reference lacks).  Call once per process before any backend use.

    ``coordinator`` is ``host:port`` of process 0.  ``local_devices`` forces
    the per-process CPU device count (the multi-host fake-backend pattern:
    N processes × M virtual CPU devices federate into an N·M-device fleet
    with gloo cross-process collectives; on real TPU pods leave it None and
    the platform supplies the local chips).

    NOTE: config.update, not env vars — this environment pre-imports jax at
    interpreter start (sitecustomize), so JAX_PLATFORMS/XLA_FLAGS set by the
    caller's own code arrive too late.
    """
    if local_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_devices))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "d") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) job."""
    import numpy as np

    return Mesh(np.array(jax.devices()), (axis,))


def render_distributed(world, camera, *, engine_cfg: RenderConfig | None = None,
                       spp: int | None = None, seed: int = 0,
                       queue_size: int = 4096, steps_per_wave: int = 16,
                       checkpoint_path: str | None = None,
                       checkpoint_every: int = 0, batch: int = 0):
    """Multi-host entry: compile on every host, render the wavefront engine
    data-parallel over the global mesh, all-gather the image → full (H, W, 3)
    numpy array on every host (identical across hosts; process 0 writes).

    Every host must call this with the same world/camera/seed (the usual
    SPMD contract).  Scene tables are replicated; pixels are sharded; the
    forward pass needs zero collectives — only the final image gather rides
    the network.

    ``checkpoint_path`` makes the render preemption-safe (SURVEY.md
    §5.3/§5.4 for the *multi-host* path, VERDICT r3 #5): the run proceeds
    in ``batch``-sample rounds, process 0 atomically writes
    ``{accum-sum, samples_done, fingerprint}`` every ``checkpoint_every``
    samples AND on KeyboardInterrupt, and a restarted job (all processes
    read the shared file) resumes at the recorded sample.  Per-sample
    radiance is keyed by the global ``(sample, pixel)`` id, so a resumed
    run accumulates exactly the samples the uninterrupted run would —
    with aligned batch boundaries the final image is bit-identical.
    """
    import os

    import numpy as np

    from ..models.compile import compile_scene
    from ..ops.bvh_build import build_from_scene

    cfg = engine_cfg or RenderConfig(
        width=camera.img_width, height=camera.img_height,
        samples_per_pixel=camera.samples_per_pixel,
        max_depth=camera.max_depth)
    spp = spp if spp is not None else cfg.samples_per_pixel
    scene = compile_scene(world)
    bvh = build_from_scene(scene)
    flags = SceneFlags.from_scene(scene)
    cam_a = camera.initialize()
    mesh = global_mesh()

    def fingerprint() -> str:
        # Same digest recipe as render.Renderer._fingerprint: refusing a
        # checkpoint from a different scene/camera/config is what makes
        # resume safe rather than silently blending two renders.  The seed
        # and engine shape knobs are part of the digest because bit-identical
        # resume is only true within one sample stream: resuming with a
        # different --seed would silently blend two independent streams, and
        # queue_size/steps_per_wave change per-sample accumulation order.
        import hashlib

        h = hashlib.sha256()
        for leaf in jax.tree.leaves(scene):
            a = np.asarray(leaf)
            h.update(a.shape.__repr__().encode())
            h.update(a.tobytes())
        for leaf in jax.tree.leaves(cam_a):
            h.update(np.asarray(leaf).tobytes())
        h.update(repr(cfg).encode())
        h.update(repr((seed, queue_size, steps_per_wave)).encode())
        return h.hexdigest()

    def gather(img):
        if jax.process_count() == 1:
            return np.asarray(img)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(img, tiled=True))

    accum = np.zeros((cfg.height, cfg.width, 3), np.float32)
    done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        with np.load(checkpoint_path) as z:
            saved = str(z["fingerprint"])
            mine = fingerprint()
            if saved != mine:
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} was written by a "
                    f"different scene/camera/config (fingerprint "
                    f"{saved[:12]}… != {mine[:12]}…)")
            accum = z["accum"].astype(np.float32)
            done = int(z["samples_done"])
        print(f"resuming at sample {done}/{spp}", flush=True)

    def save():
        if checkpoint_path and jax.process_index() == 0:
            tmp = checkpoint_path + ".tmp.npz"
            np.savez(tmp, accum=accum, samples_done=done,
                     fingerprint=fingerprint())
            os.replace(tmp, checkpoint_path)

    step = batch or checkpoint_every or spp
    key = jax.random.key(seed)
    last_saved_q = done // checkpoint_every if checkpoint_every else 0
    try:
        while done < spp:
            n = min(step, spp - done)
            img = render_sharded_wavefront(
                scene, flags, bvh, cam_a, cfg, key, mesh, spp=n,
                queue_size=queue_size, steps_per_wave=steps_per_wave,
                start_sample=done)
            # One-tuple commit: a KeyboardInterrupt can only land before or
            # after BOTH accum and done move, so an interrupt-time save is
            # always consistent (accum never contains uncounted samples).
            accum, done = accum + gather(img) * n, done + n
            print(f"sample {done}/{spp}", flush=True)
            if checkpoint_every and done // checkpoint_every > last_saved_q \
                    and done < spp:
                last_saved_q = done // checkpoint_every
                save()
    except KeyboardInterrupt:
        save()
        raise
    save()
    return accum / max(done, 1)


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: the traversal while_loop seeds its carry from
    # replicated constants and updates it with device-varying data; the
    # varying-manual-axes type check rejects that mix even though the program
    # is correct (each device runs an independent carry).
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def _pixel_blocks(cfg: RenderConfig, n_dev: int):
    npix = cfg.width * cfg.height
    per = -(-npix // n_dev)  # ceil; padded tail pixels are traced + dropped
    total = per * n_dev
    return jnp.arange(total, dtype=jnp.int32).reshape(n_dev, per), npix


def _render_sharded_impl(scene, flags: SceneFlags, bvh, cam, cfg: RenderConfig,
                         base_key, mesh: Mesh, spp: int,
                         differentiable: bool = False):
    """Render ``spp`` samples with pixels sharded over ``mesh`` → (H, W, 3).

    Scene/BVH/camera are closure captures → replicated on every device; only
    the pixel-index block is sharded.  No collectives in the hot path.
    """
    n_dev = mesh.devices.size
    idxs, npix = _pixel_blocks(cfg, n_dev)
    tracer = (integrator.trace_ray_scan if differentiable
              else integrator.trace_ray)

    def trace_pixel(sample_idx, pix_idx):
        from ..ops import camera as cam_ops
        px = (pix_idx % cfg.width).astype(jnp.float32)
        py = (pix_idx // cfg.width).astype(jnp.float32)
        key_p = jax.random.fold_in(
            jax.random.fold_in(base_key, sample_idx), pix_idx)
        o, d, t = cam_ops.get_ray(cam, px, py, jax.random.fold_in(key_p, 7))
        return tracer(scene, flags, bvh, cam, cfg, o, d, t, key_p)

    def device_fn(idx_block):  # (1, per) on each device
        local = idx_block[0]

        def sample_body(s, acc):
            return acc + jax.vmap(lambda i: trace_pixel(s, i))(local)

        acc = jax.lax.fori_loop(0, spp, sample_body,
                                jnp.zeros((local.shape[0], 3), jnp.float32))
        return (acc / spp)[None]

    colors = _shard_map(device_fn, mesh, (P("d", None),), P("d", None))(idxs)
    return colors.reshape(-1, 3)[:npix].reshape(cfg.height, cfg.width, 3)


render_sharded = partial(jax.jit, static_argnames=(
    "flags", "cfg", "spp", "mesh", "differentiable"))(_render_sharded_impl)


@partial(jax.jit, static_argnames=("flags", "cfg", "mesh", "spp",
                                   "queue_size", "steps_per_wave",
                                   "start_sample"))
def render_sharded_wavefront(scene, flags: SceneFlags, bvh, cam,
                             cfg: RenderConfig, base_key, mesh: Mesh,
                             spp: int = 1, queue_size: int = 4096,
                             steps_per_wave: int = 24,
                             start_sample: int = 0):
    """Data-parallel *wavefront* render: one slot pool per device → (H,W,3).

    The production engine's multi-chip path: each device runs a
    self-contained wavefront pool (suspended traversal, path regeneration,
    no atomics) over a contiguous block of the flattened frame.  RNG keys
    fold global pixel ids, so the image equals the single-device wavefront
    render up to per-pixel accumulation order; the forward pass needs zero
    collectives (ray independence), exactly like :func:`render_sharded`.
    """
    from ..ops import wavefront

    n_dev = mesh.devices.size
    npix = cfg.width * cfg.height
    per = -(-npix // n_dev)
    offs = (jnp.arange(n_dev, dtype=jnp.int32) * per).reshape(n_dev, 1)

    def device_fn(off):
        acc = wavefront.render_batch(
            scene, flags, bvh, cam, cfg, jnp.zeros((per, 3), jnp.float32),
            start_sample, spp, base_key, queue_size=queue_size,
            steps_per_wave=steps_per_wave, pix_offset=off[0, 0], n_pix=per)
        return acc[None]

    colors = _shard_map(device_fn, mesh, (P("d", None),),
                        P("d", None, None))(offs)
    return (colors.reshape(-1, 3)[:npix] / spp).reshape(
        cfg.height, cfg.width, 3)


def calibrate_n_waves(scene, flags, bvh, cam, cfg: RenderConfig, key,
                      spp: int = 1, queue_size: int = 4096,
                      steps_per_wave: int = 12, margin: float = 1.5) -> int:
    """Size the differentiable wavefront's fixed trip count: run one stats
    forward and pad the measured wave count (over-provisioned trips
    short-circuit through lax.cond, so the margin is nearly free)."""
    from ..ops import wavefront

    accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    _, stats = wavefront.render_batch(scene, flags, bvh, cam, cfg, accum, 0,
                                      spp, key, queue_size=queue_size,
                                      steps_per_wave=steps_per_wave,
                                      with_stats=True)
    return int(int(stats["waves"]) * margin) + 8


def make_train_step(flags: SceneFlags, cfg: RenderConfig, mesh: Mesh,
                    spp: int = 1, lr: float = 1e-2,
                    engine: str = "wavefront", queue_size: int = 4096,
                    steps_per_wave: int = 12, n_waves: int = 192,
                    unbiased: bool = False, ckpt_every: int = 1):
    """Build a jitted data-parallel SGD step on scene parameters.

    ``params`` is a dict of SceneArrays leaf overrides (e.g. ``tex_c1``,
    ``mat_fuzz``) — the gradient targets from the north star ("pixel
    gradients w.r.t. material/texture/emission parameters").  Each device
    differentiates the loss of its own pixel shard, then parameter
    gradients are explicitly ``psum``-all-reduced over the mesh axis with
    XLA free to overlap the reduction with remaining backward work
    (SURVEY.md §2.7).

    ``engine="wavefront"`` (default) runs the **backward wavefront**
    (:func:`~.ops.wavefront.render_batch_diff`): measured 2.55× the cost of
    a forward wavefront sample on-chip — 57× round 1's per-lane gradient
    path.  Size ``n_waves`` with :func:`calibrate_n_waves` (finished trips
    short-circuit, so generous is cheap) and check the returned ``aux``
    dict: ``aux["paths_done"] == aux["paths_total"]`` certifies the loss
    integrated every path.  ``engine="megakernel"`` keeps the fixed-trip
    tiled scan (:mod:`~.ops.integrator_tiled`) as the oracle.

    ``unbiased=True`` uses the two-sample ("dual-buffer") gradient
    estimator: two INDEPENDENT renders ``X_a ⊥ X_b`` per step and the
    surrogate ``Σ 2·stop_grad(X_a − target)·X_b``, whose gradient is an
    unbiased estimate of ``∇(E[X] − target)²``.  The naive single-render
    MSE additionally differentiates the estimator's *variance* — gradient
    descent then darkens albedos to suppress MC noise (a well-known
    inverse-rendering failure mode; observed here: a 0.65-albedo wall
    driven to 0.04).  The reported loss stays the honest MSE of the
    two-render mean.

    Returns ``step(params, scene, bvh, cam, key, target) ->
    (new_params, loss, grads, aux)``.
    """
    import dataclasses

    def make_loss(scene, bvh, cam, key, off, local_idx, tgt_block, npix,
                  per):
        def render_once(scene_p, key):
            if engine == "wavefront":
                from ..ops import wavefront
                img, stats = wavefront.render_batch_diff(
                    scene_p, flags, bvh, cam, cfg,
                    jnp.zeros_like(tgt_block), 0, spp, key,
                    queue_size=queue_size, steps_per_wave=steps_per_wave,
                    n_waves=n_waves, pix_offset=off, n_pix=per,
                    ckpt_every=ckpt_every)
                aux = {"paths_done": stats["paths"],
                       "paths_total": stats["total"]}
                return img / spp, aux
            from ..ops import integrator_tiled

            def sample_body(s, acc):
                return acc + integrator_tiled.render_sample_tiled(
                    scene_p, flags, bvh, cam, cfg, s, key,
                    pix_idx=local_idx)

            # zeros_like(tgt_block) (not jnp.zeros): inherits the
            # manual-mesh type of the shard_map operand.
            acc = jax.lax.fori_loop(0, spp, sample_body,
                                    jnp.zeros_like(tgt_block)) / spp
            aux = {"paths_done": jnp.zeros((), jnp.int32),
                   "paths_total": jnp.zeros((), jnp.int32)}
            return acc, aux

        def local_loss(params):
            scene_p = dataclasses.replace(scene, **params)
            # Padded tail pixels (idx >= npix) carry zero weight.
            wt = (local_idx < npix).astype(jnp.float32)[:, None]
            if not unbiased:
                acc, aux = render_once(scene_p, key)
                loss = jnp.sum(wt * (acc - tgt_block) ** 2) / (npix * 3)
                return loss, aux
            sg = jax.lax.stop_gradient
            acc_a, aux_a = render_once(scene_p, jax.random.fold_in(key, 1))
            acc_b, aux_b = render_once(scene_p, jax.random.fold_in(key, 2))
            resid = sg(acc_a) - tgt_block
            # Gradient path: 2·(X_a − t)·X_b summed (X_a detached);
            # value path: the true MSE of the mean, reported for logging.
            surrogate = jnp.sum(wt * 2.0 * resid * acc_b) / (npix * 3)
            mse = jnp.sum(
                wt * (sg(0.5 * (acc_a + acc_b)) - tgt_block) ** 2) / (npix * 3)
            loss = surrogate - sg(surrogate) + mse
            aux = jax.tree.map(lambda a, b: a + b, aux_a, aux_b)
            return loss, aux

        return local_loss

    @jax.jit
    def step(params, scene, bvh, cam, key, target):
        n_dev = mesh.devices.size
        idxs, npix = _pixel_blocks(cfg, n_dev)
        per = idxs.shape[1]
        tgt = target.reshape(-1, 3)
        pad = idxs.size - tgt.shape[0]
        tgt = jnp.concatenate([tgt, jnp.zeros((pad, 3), tgt.dtype)])
        tgt = tgt.reshape(n_dev, -1, 3)
        offs = (jnp.arange(n_dev, dtype=jnp.int32) * per).reshape(n_dev, 1)

        def device_fn(params_op, off, idx_block, tgt_block):
            local_loss = make_loss(scene, bvh, cam, key, off[0], idx_block[0],
                                   tgt_block[0], npix, per)
            (loss, aux), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params_op)
            # Cross-device gradient reduction rides ICI (psum).
            loss = jax.lax.psum(loss, "d")
            grads = jax.tree.map(lambda g: jax.lax.psum(g, "d"), grads)
            aux = jax.tree.map(lambda a: jax.lax.psum(a, "d"), aux)
            return loss, grads, aux

        # params go in as explicit replicated operands (not closure captures)
        # so their tangent types live in the manual mesh context.
        loss, grads, aux = _shard_map(
            device_fn, mesh,
            (jax.tree.map(lambda _: P(), params), P("d", None),
             P("d", None), P("d", None, None)),
            (P(), jax.tree.map(lambda _: P(), params),
             {"paths_done": P(), "paths_total": P()}))(
                 params, offs, idxs, tgt)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss, grads, aux

    return step
