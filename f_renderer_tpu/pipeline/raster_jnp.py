"""Tile rasterizer, portable XLA implementation (reference: renderer.rs:269-384).

Key reformulation (SURVEY.md §2.3): the reference's sequential per-triangle
depth loop — ``if rhw < depth: skip; else overwrite`` (renderer.rs:362-366) —
makes the accepted-rhw sequence at each pixel monotone nondecreasing, so the
final surviving triangle is exactly the **lexicographic argmax of
(rhw, submission order)** over covering triangles. That turns rasterization
into a pure per-pixel reduction (no scatter, no write hazards — the "race
detection" story of SURVEY.md §5 is solved algebraically), and lets triangles
be stored in any physical order.

This module computes per-pixel ``(winner triangle id, depth)``; shading is
deferred (see shade.py). The image is processed in tiles (vmap over tiles ×
fori_loop over triangles) so the working set stays bounded; the Pallas TPU
kernel (raster_pallas.py) mirrors the same math.

Exact reference semantics reproduced per pixel:

- integer edge functions on rounded coords with i32 wraparound
  (renderer.rs:329-331; Rust release-mode overflow wraps, as does jnp int32)
- top-left fill rule with asymmetric threshold ``E < (top_left ? 0 : 1)``
  (renderer.rs:333-341)
- bbox from spi clamped to the range, exclusive upper bounds
  (renderer.rs:285-298, 322-324)
- barycentric |perp-dot| areas from spf at pixel centers, ``s == 0`` skip
  (renderer.rs:343-354)
- depth = interpolated rhw, ties pass (renderer.rs:360-366)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f_renderer_tpu.pipeline.types import TriangleBuffer

ORDER_NONE = jnp.int32(-2147483648)


def _cdiv(a, b):
    return -(-a // b)


def rasterize_jnp(
    tri: TriangleBuffer,
    width: int,
    height: int,
    *,
    tile: tuple[int, int] = (64, 128),
    origin: tuple = (0, 0),
    full_size: tuple | None = None,
):
    """Rasterize to per-pixel (winner, depth).

    Returns ``(winner (H, W) i32 — triangle slot id or -1, depth (H, W) f32
    — rhw, 0.0 where unwritten)``.

    ``origin=(y0, x0)`` renders the sub-rect [y0, y0+height) × [x0, x0+width)
    of a ``full_size=(H_full, W_full)`` frame — the reference's
    width_range/height_range concept (renderer.rs:269-298), used for
    multi-device tile sharding.
    """
    th, tw = tile
    y_origin, x_origin = origin
    fh, fw = full_size if full_size is not None else (height, width)
    nty, ntx = _cdiv(height, th), _cdiv(width, tw)
    m = tri.num_slots

    tile_ids = jnp.arange(nty * ntx, dtype=jnp.int32)
    oy = y_origin + (tile_ids // ntx) * th
    ox = x_origin + (tile_ids % ntx) * tw

    # Clamped bbox per triangle (renderer.rs:285-298). The sequential
    # min/clamp loop is equivalent to clamp(min(...)), clamp(max(...)).
    sx = tri.spi[:, 0]  # (3, M) planes — TriangleBuffer is planar
    sy = tri.spi[:, 1]
    min_x = jnp.clip(jnp.min(sx, axis=0), 0, fw)
    max_x = jnp.clip(jnp.max(sx, axis=0), 0, fw)
    min_y = jnp.clip(jnp.min(sy, axis=0), 0, fh)
    max_y = jnp.clip(jnp.max(sy, axis=0), 0, fh)

    def tile_body(oy0, ox0):
        cy = oy0 + jnp.arange(th, dtype=jnp.int32)[:, None]  # (th, 1)
        cx = ox0 + jnp.arange(tw, dtype=jnp.int32)[None, :]  # (1, tw)
        pcx = cx.astype(jnp.float32) + 0.5
        pcy = cy.astype(jnp.float32) + 0.5

        def body(i, carry):
            depth, worder, winner = carry
            p = tri.spi[..., i]  # (3, 2)
            spf = tri.spf[..., i]  # (3, 2)
            rhw3 = tri.rhw[..., i]  # (3,)
            tl = tri.top_left[..., i]  # (3,)

            in_bbox = (
                (cx >= min_x[i])
                & (cx < max_x[i])
                & (cy >= min_y[i])
                & (cy < max_y[i])
            )

            def edge(a, b):
                return -(cx - a[0]) * (b[1] - a[1]) + (cy - a[1]) * (b[0] - a[0])

            e01 = edge(p[0], p[1])
            e12 = edge(p[1], p[2])
            e20 = edge(p[2], p[0])
            thr = jnp.where(tl, 0, 1)  # (3,)
            cover = (
                in_bbox
                & (e01 >= thr[0])
                & (e12 >= thr[1])
                & (e20 >= thr[2])
            )

            s0x = spf[0, 0] - pcx
            s0y = spf[0, 1] - pcy
            s1x = spf[1, 0] - pcx
            s1y = spf[1, 1] - pcy
            s2x = spf[2, 0] - pcx
            s2y = spf[2, 1] - pcy
            a = jnp.abs(s1x * s2y - s1y * s2x)
            b = jnp.abs(s2x * s0y - s2y * s0x)
            c = jnp.abs(s0x * s1y - s0y * s1x)
            s = a + b + c
            cover = cover & (s != 0.0)
            inv_s = 1.0 / s
            a = a * inv_s
            b = b * inv_s
            c = c * inv_s
            rhw = rhw3[0] * a + rhw3[1] * b + rhw3[2] * c

            o = tri.order[i]
            accept = (
                cover
                & tri.valid[i]
                & ((rhw > depth) | ((rhw >= depth) & (o > worder)))
            )
            depth = jnp.where(accept, rhw, depth)
            worder = jnp.where(accept, o, worder)
            winner = jnp.where(accept, jnp.int32(i), winner)
            return depth, worder, winner

        init = (
            jnp.zeros((th, tw), jnp.float32),
            jnp.full((th, tw), ORDER_NONE),
            jnp.full((th, tw), -1, jnp.int32),
        )
        depth, _, winner = jax.lax.fori_loop(0, m, body, init)
        return depth, winner

    depth_t, winner_t = jax.vmap(tile_body)(oy, ox)  # (T, th, tw)
    depth = (
        depth_t.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3).reshape(nty * th, ntx * tw)
    )
    winner = (
        winner_t.reshape(nty, ntx, th, tw)
        .transpose(0, 2, 1, 3)
        .reshape(nty * th, ntx * tw)
    )
    return winner[:height, :width], depth[:height, :width]
