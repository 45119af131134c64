"""Device-side camera ray generation.

Replaces the reference's ``get_ray`` Taichi kernel (kernels.py:176-201) and
the CPU ``camera.get_ray`` (camera.py:129-137): jittered pixel sampling,
defocus-disk depth of field, and a random ray time in [0,1) for motion blur
(which the reference GPU path drops — kernels.py:181-183).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import rng
from .types import BG_GRADIENT, CameraArrays


def get_ray(cam: CameraArrays, px, py, key):
    """One primary ray for pixel (px, py) → (origin, direction, time).

    ``px``/``py`` are float pixel coordinates (x to the right, y down).
    """
    u = jax.random.uniform(key, (5,))
    sample = (cam.pixel00
              + (px + u[0] - 0.5) * cam.du
              + (py + u[1] - 0.5) * cam.dv)
    disk = rng.random_in_unit_disk(u[2:4])
    dof_origin = cam.origin + disk[0] * cam.defocus_u + disk[1] * cam.defocus_v
    origin = jnp.where(cam.defocus_angle <= 0.0, cam.origin, dof_origin)
    direction = sample - origin
    time = u[4]
    return origin, direction, time


def background_color(cam: CameraArrays, rd):
    """Solid background or the vol-1 gradient sky.

    The reference hardcodes a solid ``fields.bg_color`` on GPU; the CPU path
    stores ``camera.background``.  The gradient is the classic
    ``lerp(white, (0.5, 0.7, 1.0), 0.5*(unit_dir.y + 1))`` sky.
    """
    unit = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True).clip(1e-12)
    a = 0.5 * (unit[..., 1] + 1.0)
    gradient = (1.0 - a[..., None]) * jnp.ones(3) + a[..., None] * jnp.array([0.5, 0.7, 1.0])
    return jnp.where(cam.bg_type == BG_GRADIENT, gradient, cam.bg_color)
