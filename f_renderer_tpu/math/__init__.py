"""L0 math utilities (reference: matrix_util.rs, vector_util.rs)."""

from f_renderer_tpu.math.transforms import (
    normalize,
    reflect,
    set_identity,
    set_look_at,
    set_perspective,
    set_rotate,
    set_scale,
    transform_points_h,
)

__all__ = [
    "normalize",
    "reflect",
    "set_identity",
    "set_look_at",
    "set_perspective",
    "set_rotate",
    "set_scale",
    "transform_points_h",
]
