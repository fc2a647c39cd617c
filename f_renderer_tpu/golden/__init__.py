"""Slow, obviously-correct scalar NumPy oracle of the reference pipeline.

Used to generate golden images/values for tests (SURVEY.md §4): the reference
has no tests of its own, so correctness is anchored by this line-by-line
scalar re-implementation of renderer.rs semantics (f32 math, integer edge
functions, every quirk in SURVEY.md §7.3), cross-checked by unit tests.
"""

from f_renderer_tpu.golden.scalar import (
    GoldenVertex,
    geometry_processing,
    rasterization,
    render_scene,
)

__all__ = [
    "GoldenVertex",
    "geometry_processing",
    "rasterization",
    "render_scene",
]
