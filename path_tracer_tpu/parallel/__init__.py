"""Distributed rendering strategies (SURVEY.md §2.7/§2.8).

* :mod:`.render_dist` — data parallel (pixels sharded, scene replicated;
  the default) + psum gradient training.
* :mod:`.scene_shard` — tensor parallel (scene sharded by primitive, rays
  replicated; for scenes that outgrow one chip's HBM).
"""
from .render_dist import (make_mesh, make_train_step, render_sharded,
                          render_sharded_wavefront)
from .scene_shard import render_tp, shard_scene

__all__ = ["make_mesh", "make_train_step", "render_sharded",
           "render_sharded_wavefront", "render_tp", "shard_scene"]
