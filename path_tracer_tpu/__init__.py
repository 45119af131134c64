"""path_tracer_tpu — a TPU-native differentiable wavefront path tracer.

Built from scratch in JAX/XLA with the full capability surface of the
reference ``fakhirsh/path-tracer-python`` (see SURVEY.md): spheres (with
motion blur), quads, triangles, OBJ meshes, Klein bottles, constant-medium
volumes, 7 material families, 4 texture families, SAH-BVH acceleration,
megakernel + wavefront engines, progressive accumulation with checkpointing,
and multi-chip sharding via ``jax.sharding``.

Quick start::

    import path_tracer_tpu as pt
    world, cam = pt.scenes.cornell_box()
    image = pt.render_scene(world, cam)  # (H, W, 3) float radiance
"""

from .models.camera import Camera
from .models.compile import compile_scene
from .models.geometry import (ConstantMedium, Hittable, HittableList,
                              KleinBottle, Mesh, Quad, Sphere, Triangle, box)
from .models.materials import (Dielectric, DiffuseLight, Isotropic, Lambertian,
                               Material, Metal, SubsurfaceSimple,
                               SubsurfaceVolumetric)
from .models.textures import (CheckerTexture, ImageTexture, NoiseTexture,
                              SolidColor, Texture)
from .ops.bvh_build import build_from_scene
from .ops.types import CameraArrays, FlatBVH, RenderConfig, SceneArrays
from .render.factory import RendererFactory
from .render.renderer import Renderer, render_scene
from . import scenes

__all__ = [
    "Camera", "CameraArrays", "CheckerTexture", "ConstantMedium", "Dielectric",
    "DiffuseLight", "FlatBVH", "Hittable", "HittableList", "ImageTexture",
    "Isotropic", "KleinBottle", "Lambertian", "Material", "Mesh", "Metal",
    "NoiseTexture", "Quad", "RenderConfig", "Renderer", "RendererFactory", "SceneArrays",
    "SolidColor", "Sphere", "SubsurfaceSimple", "SubsurfaceVolumetric",
    "Texture", "Triangle", "box", "build_from_scene", "compile_scene",
    "render_scene",
]

__version__ = "0.1.0"
