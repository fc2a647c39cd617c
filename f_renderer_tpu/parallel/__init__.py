"""Multi-device sharding (SURVEY.md §2.3 — first-class in the TPU build).

The renderer's parallel axes are triangles and framebuffer tiles, not
data/tensor shards: geometry is data-parallel over faces ("dp"), raster +
shading are spatial-parallel over framebuffer row slabs ("sp"). The only
collective is an all_gather of the compact triangle setup over dp (rides
ICI); framebuffer slabs never need merging because tiles are disjoint and
the (rhw, order) reduction is computed locally per slab.
"""

from f_renderer_tpu.parallel.sharding import make_render_mesh, render_frame_sharded

__all__ = ["make_render_mesh", "render_frame_sharded"]
