"""Sparse-voxel-octree raycaster (reference: examples/src/bin/voxel.rs).

TPU-first redesign: the pointer-based recursive octree (voxel.rs:453-458)
flattens into index arrays; for the hot ray march the SVO is *densified*
into a 2^(level+1)³ color/occupancy grid — exactly equivalent for point
queries (all cube extents are powers of two, so cell arithmetic is exact in
f32) — turning the recursive find_leaf descent (voxel.rs:357-385) into a
single 3D gather per march step, vectorized over all rays.
"""

from f_renderer_tpu.voxel.octree import SvoArrays, Voxel, densify, flatten, gen_randomly
from f_renderer_tpu.voxel.raycast import (
    VoxelRenderConfig,
    cube_intersect,
    render_voxel_frame,
)

__all__ = [
    "SvoArrays",
    "Voxel",
    "densify",
    "flatten",
    "gen_randomly",
    "VoxelRenderConfig",
    "cube_intersect",
    "render_voxel_frame",
]
