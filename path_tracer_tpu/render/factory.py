"""RendererFactory: reference-compatible construction seam.

The reference exposes ``RendererFactory.create('gpu'|'cpu'|'taichi', world,
cam, img_path)`` (renderer_factory.py:13-44) as its pluggable-backend API.
This keeps that entry point for users migrating from it, mapping the
reference's backend names onto this framework's engines:

==========  =====================================================
reference    here
==========  =====================================================
'taichi'     wavefront engine (the accelerator path)
'gpu'        wavefront engine (the reference's GpuRenderer was a stub)
'cpu'        megakernel engine (the depth-first oracle)
==========  =====================================================

plus the native names 'wavefront' / 'megakernel'.
"""
from __future__ import annotations

from .renderer import Renderer

_ALIASES = {
    "taichi": "wavefront",
    "gpu": "wavefront",
    "cpu": "megakernel",
    "wavefront": "wavefront",
    "megakernel": "megakernel",
}


class RendererFactory:
    """Reference-style factory (renderer_factory.py:13-44)."""

    @staticmethod
    def create(renderer_type: str, world, camera, img_path: str | None = None,
               **kwargs) -> Renderer:
        engine = _ALIASES.get(renderer_type)
        if engine is None:
            raise ValueError(
                f"unknown renderer type {renderer_type!r}; expected one of "
                f"{sorted(_ALIASES)}")
        r = Renderer(world, camera, engine=engine, **kwargs)
        if img_path is not None:
            r.default_image_path = img_path
        return r

    @staticmethod
    def available_renderers():
        return sorted(_ALIASES)
