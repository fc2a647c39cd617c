"""Core render pipeline: batched geometry stage + tile rasterizer.

TPU-first redesign of renderer.rs:96-384 (see SURVEY.md §2.3, §7):

- The geometry stage (``geometry.py``) runs the vertex shader over the whole
  index buffer at once (vmapped / MXU matmuls) and converts the reference's
  dynamic clip-polygon Vec growth into fixed-shape masked arrays.
- The rasterizer exploits the key algebraic fact that the reference's
  sequential "rhw >= depth overwrites" loop (renderer.rs:360-366) is
  equivalent to a per-pixel **lexicographic argmax over (rhw, submission
  order)** — a pure reduction with no scatters. Shading is then *deferred*:
  one gather of the winning triangle's attributes per pixel and a single
  vectorized pixel-shader pass (``shade.py``).
- ``raster_jnp.py`` is the portable XLA implementation (also the CPU test
  oracle at scale); ``raster_pallas.py`` is the TPU kernel.
"""

from f_renderer_tpu.pipeline.types import TriangleBuffer
from f_renderer_tpu.pipeline.geometry import geometry_process
from f_renderer_tpu.pipeline.raster_jnp import rasterize_jnp
from f_renderer_tpu.pipeline.shade import shade_deferred
from f_renderer_tpu.pipeline.render import render_frame, RenderConfig

__all__ = [
    "TriangleBuffer",
    "geometry_process",
    "rasterize_jnp",
    "shade_deferred",
    "render_frame",
    "RenderConfig",
]
