"""Pipeline data types.

The reference's ``Vertex<T>`` (renderer.rs:387-409) is an AoS record with a
generic varying payload. The TPU-native form is a SoA **triangle setup
buffer**: fixed-shape arrays over M triangle slots, invalid slots masked.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleBuffer:
    """Raster-ready triangle setup (post geometry stage, winding repaired).

    Fields (M = triangle slot count, C = flattened varying channels):

    - ``spi``: (M, 3, 2) i32 — integer screen coords (renderer.rs:233-234)
    - ``spf``: (M, 3, 2) f32 — float screen coords (renderer.rs:229-230)
    - ``rhw``: (M, 3) f32 — 1/w per vertex (renderer.rs:223)
    - ``ctx``: (M, 3, C) f32 — flattened ShaderContext varyings
    - ``top_left``: (M, 3) bool — top-left edge flags for edges 0→1, 1→2,
      2→0 (renderer.rs:318-320), computed after winding repair
    - ``valid``: (M,) bool — slot holds a real triangle
    - ``order``: (M, ) i32 — submission order (face-major, fan-minor); the
      depth-tie tiebreaker reproducing the reference's sequential overwrite
    - ``ps_index``: (M,) i32 — draw index selecting the pixel-shader uniform
      (the reference mutates ``ps_uniform.place`` per triangle-index range,
      phong.rs:364-370)
    """

    spi: jnp.ndarray
    spf: jnp.ndarray
    rhw: jnp.ndarray
    ctx: jnp.ndarray
    top_left: jnp.ndarray
    valid: jnp.ndarray
    order: jnp.ndarray
    ps_index: jnp.ndarray

    @property
    def num_slots(self) -> int:
        return self.spi.shape[0]

    @property
    def num_channels(self) -> int:
        return self.ctx.shape[-1]

    def concat(self, other: "TriangleBuffer") -> "TriangleBuffer":
        return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self, other)
