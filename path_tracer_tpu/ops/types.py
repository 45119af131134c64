"""Device-side pytree types: scene SoA, flat BVH, camera, render config.

These replace the reference's Taichi field declarations
(``/root/reference/src/render_server/taichi_renderer/fields.py``) with plain
``jnp`` arrays in registered dataclasses.  Two deliberate departures from the
reference's design:

* **No hard caps.** The reference statically allocates 2048 spheres / 4096
  triangles / 2048 quads / 8192 BVH nodes (fields.py:14-18) and silently
  overflows on ``vol2_final_scene``.  Here every array is padded to a
  power-of-two bucket at compile time, so one jitted executable covers a
  family of scene sizes and nothing overflows.
* **Unified material/texture tables.**  The reference duplicates material and
  texture SoA per primitive type (fields.py:70-113); here every primitive
  carries one ``mat`` index into a single table, which is what lets the shader
  evaluate materials as masked lanes instead of per-prim-type dispatch.

All leaves are data (traced); the pad counts live in array shapes.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

Array = jax.Array

# --- enums (match the reference's compile-time constants, scene_compiler.py:10-25) ---
PRIM_SPHERE = 0
PRIM_QUAD = 1
PRIM_TRIANGLE = 2

MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_EMISSIVE = 3
MAT_ISOTROPIC = 4
MAT_SSS_SIMPLE = 5       # reference material.py:145-174 (CPU-only there; on-device here)
MAT_SSS_VOLUMETRIC = 6   # reference material.py:176-276 (CPU-only there; on-device here)

TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2
TEX_NOISE = 3

BG_SOLID = 0     # fields.bg_color (solid background)
BG_GRADIENT = 1  # RTiOW vol-1 white->blue sky gradient

# Sentinel BVH child / primitive values.
BVH_NONE = -1
# Empty BVH4 child slot pointer: 2^23 (exactly representable in f32, above
# any real interior index, below leaf-encoding range).
BVH_EMPTY_SLOT = 1 << 23

# Packed traversal-row layout (see PackedBVH).  PRIM_ROW floats per leaf
# payload; a K-wide node row holds K AABBs [0:6K], K child ptrs [6K:7K],
# padding up to the next multiple of 8 (keeps the payload 8-aligned for the
# (NODE_ROW,)+grid sublane view), then K embedded payloads.  K=4 (default):
# boxes [0:24], ptrs [24:28], payload at 32, row = 96 floats.
PRIM_ROW = 16


def bvh_layout(branching: int):
    """(ptr_off, payload_off, node_row) for a ``branching``-wide node row."""
    ptr = 6 * branching
    pay = -(-7 * branching // 8) * 8  # ceil to sublane multiple
    return ptr, pay, pay + PRIM_ROW * branching


PAYLOAD = bvh_layout(4)[1]   # 32
NODE_ROW = bvh_layout(4)[2]  # 96


def _register(cls):
    data_fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields, [])
    return cls


@_register
@dataclass
class SceneArrays:
    """The whole scene as one pytree of padded SoA arrays.

    Replaces the 11-tuple from ``scene_compiler.compile_scene``
    (scene_compiler.py:931-965) plus the per-type material/texture/medium
    fields (fields.py:25-153).  Padded entries are inert: they are never
    referenced by BVH leaves, and brute-force oracles mask with ``*_valid``.
    """

    # Spheres: motion blur as two centers lerped by ray time (fixes the
    # reference's GPU t=0 sampling gap, scene_compiler.py:161-166).
    sph_c0: Array          # (Ns, 3) center at time 0
    sph_c1: Array          # (Ns, 3) center at time 1
    sph_rad: Array         # (Ns,)
    sph_mat: Array         # (Ns,) int32 material index
    sph_valid: Array       # (Ns,) bool

    # Quads: corner Q, edge vectors u/v, cached plane data (quad.py:11-33).
    qd_q: Array            # (Nq, 3)
    qd_u: Array            # (Nq, 3)
    qd_v: Array            # (Nq, 3)
    qd_n: Array            # (Nq, 3) unit normal
    qd_w: Array            # (Nq, 3) n_raw / (n_raw . n_raw)
    qd_d: Array            # (Nq,) plane offset D
    qd_mat: Array          # (Nq,) int32
    qd_valid: Array        # (Nq,) bool

    # Triangles: vertex + precomputed edges + normal + per-vertex UV
    # (triangle.py:10-53; UVs generalise the reference's barycentric output).
    tr_v0: Array           # (Nt, 3)
    tr_e1: Array           # (Nt, 3) v1 - v0
    tr_e2: Array           # (Nt, 3) v2 - v0
    tr_n: Array            # (Nt, 3) unit face normal
    tr_mat: Array          # (Nt,) int32
    tr_valid: Array        # (Nt,) bool

    # Unified material table (material.py:9-277).
    mat_type: Array        # (M,) int32 MAT_*
    mat_tex: Array         # (M,) int32 albedo/emit texture index
    mat_fuzz: Array        # (M,) metal fuzz
    mat_ir: Array          # (M,) dielectric index of refraction
    mat_g: Array           # (M,) HG anisotropy (SSS volumetric)
    mat_sigma_s: Array     # (M,) SSS scatter coeff
    mat_sigma_a: Array     # (M,) SSS absorb coeff
    mat_scatter_dist: Array  # (M,) SSS-simple scatter distance

    # Texture table (texture.py:10-90).
    tex_type: Array        # (T,) int32 TEX_*
    tex_c1: Array          # (T, 3) primary color (solid / checker even)
    tex_c2: Array          # (T, 3) checker odd color
    tex_scale: Array       # (T,) checker inv-scale or noise scale
    tex_img: Array         # (T,) int32 image index or -1

    # Image-texture stack, padded to common dims (fields.py:117-119 analogue;
    # no 16-image cap).  (I, Hmax, Wmax, 3) float32 in [0,1].
    img_data: Array
    img_hw: Array          # (I, 2) int32 actual (h, w)

    # Constant-medium registry: per primitive, -1 or an index into the medium
    # table (scene_compiler.py:854-928; fields.py:126-138).
    sph_medium: Array      # (Ns,) int32
    qd_medium: Array       # (Nq,) int32
    tr_medium: Array       # (Nt,) int32
    med_density: Array     # (Mv,)
    med_tex: Array         # (Mv,) int32 albedo texture index

    # Perlin tables (fields.py:148-153).
    perlin_vec: Array      # (256, 3)
    perlin_perm: Array     # (3, 256) int32


@_register
@dataclass
class FlatBVH:
    """Flattened BVH node array (sah_bvh_builder.py:338-418 layout).

    ``left``/``right`` index into the node array for interior nodes; leaves
    have ``prim_type >= 0`` and reference exactly one primitive.  Node 0 is
    the root.  Padded nodes are unreachable.
    """

    bb_min: Array          # (B, 3)
    bb_max: Array          # (B, 3)
    left: Array            # (B,) int32
    right: Array           # (B,) int32
    prim_type: Array       # (B,) int32, BVH_NONE for interior
    prim_idx: Array        # (B,) int32


@dataclass
class PackedBVH:
    """Gather-optimised traversal layout (derived from :class:`FlatBVH`).

    The TPU analogue of the reference's ``@ti.dataclass BVHNode`` packing
    (fields.py:52-63), designed so each traversal step issues ONE wide-row
    gather instead of ~10 scalar-array gathers:

    * ``nodes`` (B, node_row) f32 — one row per *interior* BVH-K node
      (binary SAH tree collapsed log2(K) levels at a time; ``bvh_layout(K)``
      gives the offsets — row = 96 floats at K=4, 184 at K=8): the K
      children's AABBs at [6i : 6i+6], K child pointers at [ptr_off+i]
      (exact small floats; int32 ≤ 2^24), padding to the next sublane
      multiple, and — when child i is a leaf — that child's full
      PRIM_ROW-float prim row embedded at
      [payload+16i : payload+16(i+1)].  One row gather therefore serves an
      entire traversal step: 4 box tests, descent pointers, AND leaf
      geometry.  (Measured: HBM gather cost is flat in row width, so wide
      rows halve per-ray gathers for free versus BVH2.)  Empty slots carry
      a sentinel pointer.
    * ``prims`` (P, PRIM_ROW=16) f32 — one row per BVH leaf in DFS order
      (traversal locality): [prim_type, orig_idx, 12 geometry floats, pad].
      Spheres pack c0 / (c1−c0) / radius²; quads pack the PRECOMPUTED plane
      (unit n̂, d = n̂·Q) and planar basis rows (A = v×w with A·Q, B = w×u
      with B·Q), making the in-flight test 3 dots + 2 fmas; triangles pack
      v0/e1/e2.  Used for the single-prim-scene root; the hot path reads
      embedded rows.
    * ``root`` () int32 pointer: ≥0 interior index, else ``-(leaf_id+1)``.
    """

    nodes: Array
    prims: Array
    root: Array
    # STATIC metadata (jit-specialisation, not traced): which primitive
    # families exist in the scene — lets the leaf intersector compile out
    # absent families (e.g. no triangles → drop Möller–Trumbore entirely).
    prim_mask: tuple = (True, True, True)  # (spheres, quads, triangles)
    # STATIC exact worst-case traversal stack need for THIS tree (computed
    # in pack_bvh).  traversal_init clamps the configured stack depth to it:
    # the one-hot stack push/pop work per step is linear in stack depth, so
    # a 2048-node SAH tree (need ≈ 12-16) pays ~3× less than the fixed 48.
    max_stack: int = 48
    # STATIC node arity K (4 or 8): the binary SAH tree is collapsed
    # log2(K) levels per packed row.  Wider rows do more work per step;
    # at production batch sizes the step is overhead-bound (see
    # docs/PERFORMANCE.md round-2 breakdown), so K=8 trades ~free extra
    # math for ~half the steps per ray.
    branching: int = 4


jax.tree_util.register_dataclass(
    PackedBVH, ["nodes", "prims", "root"],
    ["prim_mask", "max_stack", "branching"])


@_register
@dataclass
class CameraArrays:
    """Precomputed camera bases (camera.py:34-72 ``initialize``)."""

    origin: Array          # (3,) lookfrom
    pixel00: Array         # (3,) center of pixel (0, 0)
    du: Array              # (3,) pixel delta u (x / width)
    dv: Array              # (3,) pixel delta v (y / height)
    defocus_u: Array       # (3,) defocus disk basis
    defocus_v: Array       # (3,)
    defocus_angle: Array   # () degrees; <= 0 disables DoF (camera.py:121-127)
    bg_color: Array        # (3,) solid background
    bg_type: Array         # () int32 BG_SOLID | BG_GRADIENT


@dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (one frozen dataclass replaces the
    reference's scattered flags — see SURVEY.md §5.6).  Hashable → jit-static.
    """

    width: int = 400
    height: int = 225
    samples_per_pixel: int = 16
    max_depth: int = 16
    # Extra loop budget for volume passthrough / SSS events that do not count
    # as scatter bounces (kernels.py:1105-1110 keeps depth fixed there).
    max_iters: int | None = None
    rr_min_depth: int = 5        # kernels.py:1049 RR_MIN_DEPTH
    rr_max_prob: float = 0.95    # kernels.py:1051 RR_MAX_PROB
    use_russian_roulette: bool = True
    sss_max_steps: int = 32      # material.py:196 caps at 64; 32 is plenty
    t_min: float = 1e-3
    t_max: float = 1e9
    stack_depth: int = 48        # kernels.py:654 uses 64; SAH trees are shallower
    # Wavefront engine tuning (None → per-scene heuristic in the Renderer:
    # the round-2 on-chip sweep peaks at 16384/16 for big scenes, 4096/6 for
    # shallow ones — docs/PERFORMANCE.md).  Exposed here so production runs
    # can pin measured values instead of the heuristic.
    queue_size: int | None = None      # wavefront slot-pool size
    steps_per_wave: int | None = None  # suspended-traversal steps per wave
    ctrl_den: int | None = None        # run control when ready*den >= slots
    sample_stride: int | None = None   # in-slot samples per work item
                                       # (multi-sample accumulation window)

    @property
    def iters(self) -> int:
        return self.max_iters if self.max_iters is not None else self.max_depth + 8


def pad_to(n: int, minimum: int = 8) -> int:
    """Next power-of-two bucket ≥ n (and ≥ minimum)."""
    m = max(int(n), minimum)
    return 1 << (m - 1).bit_length()
