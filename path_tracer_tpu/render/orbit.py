"""Orbit-camera controls + progressive restart — the InteractiveViewer's
camera machinery without the GUI.

The reference's ``InteractiveViewer`` (interactive_viewer.py:18-451) couples
three things: a Tk window, orbit-camera mouse control, and
accumulation-restart-on-change.  Per the BASELINE north star the GUI is
replaced by progressive offline rendering; this module keeps the other two
as a headless utility so a driving process (a notebook, an RPC loop, a
turntable script) can orbit the camera and keep rendering:

* :class:`OrbitCamera` — spherical-coordinate orbit about ``lookat`` with
  the reference's conventions: azimuth from the -Z axis
  (``atan2(x, -z)``, interactive_viewer.py:52-70), elevation clamped to
  ±89° against gimbal lock (:101-129), per-pixel rotation velocity.
* :func:`restart` / :meth:`Renderer.move_camera` semantics — camera changes
  re-derive the device camera arrays and reset the accumulation state
  (interactive_viewer.py:131-149 ``restart_rendering``), after which the
  ordinary progressive ``render()`` loop continues from sample 0.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..models.camera import Camera


@dataclass
class OrbitCamera:
    """Spherical-coordinate orbit control around ``camera.lookat``."""

    camera: Camera
    # Degrees of rotation per pixel of drag (interactive_viewer.py:40-43).
    rotation_velocity: tuple = (0.5, 0.3)

    def __post_init__(self):
        offset = np.asarray(self.camera.lookfrom, float) - np.asarray(
            self.camera.lookat, float)
        self.radius = float(np.linalg.norm(offset))
        # Azimuth from the -Z axis in the XZ plane; elevation from the plane.
        self.theta = math.atan2(offset[0], -offset[2])
        self.phi = (math.asin(offset[1] / self.radius)
                    if self.radius > 0 else 0.0)

    def _to_cartesian(self) -> np.ndarray:
        cos_phi = math.cos(self.phi)
        return self.radius * np.array([
            cos_phi * math.sin(self.theta),
            math.sin(self.phi),
            -cos_phi * math.cos(self.theta)])

    def rotate(self, delta_x: float, delta_y: float) -> Camera:
        """Orbit by a (right, down) drag in pixels; returns the camera.

        Mirrors ``rotate_camera`` (interactive_viewer.py:101-129): pixel
        deltas scale by ``rotation_velocity`` degrees/pixel and elevation
        clamps to ±89°.
        """
        self.theta += math.radians(delta_x * self.rotation_velocity[0])
        self.phi += math.radians(delta_y * self.rotation_velocity[1])
        max_phi = math.radians(89.0)
        self.phi = max(-max_phi, min(max_phi, self.phi))
        self.camera.lookfrom = (np.asarray(self.camera.lookat, float)
                                + self._to_cartesian())
        return self.camera

    def zoom(self, factor: float) -> Camera:
        """Scale the orbit radius (scroll-wheel analogue); factor < 1 moves
        closer."""
        self.radius = max(1e-6, self.radius * float(factor))
        self.camera.lookfrom = (np.asarray(self.camera.lookat, float)
                                + self._to_cartesian())
        return self.camera


def restart(renderer, camera: Camera | None = None) -> None:
    """Apply a camera change to a :class:`~.renderer.Renderer` and reset its
    progressive accumulation (interactive_viewer.py:131-149).

    The next ``renderer.render(spp=...)`` call integrates the new view from
    sample 0; the scene compile and BVH are untouched (camera changes are
    cheap — only the 9-leaf CameraArrays re-derive, the analogue of the
    reference's ``_upload_camera_to_gpu``).
    """
    import jax.numpy as jnp

    if camera is not None:
        renderer.camera = camera
    renderer.cam_arrays = renderer.camera.initialize()
    renderer.accum = jnp.zeros(
        (renderer.cfg.height, renderer.cfg.width, 3), jnp.float32)
    renderer.samples_done = 0
