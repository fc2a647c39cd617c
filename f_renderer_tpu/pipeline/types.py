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

    Fields (M = triangle slot count, C = flattened varying channels).
    ALL per-vertex data is **planar** — the slot dim M sits last, on the
    128-lane axis. A slot-major (M, 3, 2) layout puts the tiny trailing
    dims on the (sublane, lane) tile and every slice/select over it runs
    at a fraction of VPU width; the ctx field moved first (measured
    ~10 ms of stress4k geometry+prep was ctx staging in the stacked
    layout), spi/spf/rhw/top_left followed in r3 (pack_setup read them
    column-wise — a transpose per packed row).

    - ``spi``: (3, 2, M) i32 — integer screen coords [vertex][x|y][slot]
      (renderer.rs:233-234)
    - ``spf``: (3, 2, M) f32 — float screen coords (renderer.rs:229-230)
    - ``rhw``: (3, M) f32 — 1/w per vertex (renderer.rs:223)
    - ``ctx``: (3C, M) f32 — flattened ShaderContext varyings, planar
      row-major (v0 ch0..C-1, v1 ch0..C-1, v2 ch0..C-1)
    - ``top_left``: (3, M) bool — top-left edge flags for edges 0→1, 1→2,
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
        return self.spi.shape[-1]

    @property
    def num_channels(self) -> int:
        return self.ctx.shape[0] // 3

    def ctx_stacked(self) -> jnp.ndarray:
        """ctx as (M, 3, C) — for tests / scalar comparisons, not hot paths."""
        c = self.num_channels
        return jnp.moveaxis(self.ctx.reshape(3, c, -1), -1, 0)

    def concat(self, other: "TriangleBuffer") -> "TriangleBuffer":
        # All per-vertex fields are planar with the slot dim last.
        return TriangleBuffer(
            spi=jnp.concatenate([self.spi, other.spi], axis=-1),
            spf=jnp.concatenate([self.spf, other.spf], axis=-1),
            rhw=jnp.concatenate([self.rhw, other.rhw], axis=-1),
            ctx=jnp.concatenate([self.ctx, other.ctx], axis=-1),
            top_left=jnp.concatenate([self.top_left, other.top_left], axis=-1),
            valid=jnp.concatenate([self.valid, other.valid], axis=0),
            order=jnp.concatenate([self.order, other.order], axis=0),
            ps_index=jnp.concatenate([self.ps_index, other.ps_index], axis=0),
        )
