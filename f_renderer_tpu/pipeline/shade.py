"""Deferred shading pass (reference: renderer.rs:343-381, executed per
surviving pixel instead of per covered pixel).

Given the per-pixel winning triangle id from the rasterizer, gather that
triangle's vertex attributes, recompute the barycentrics at the pixel
center, perspective-correct-interpolate the varying context
(renderer.rs:368-378), and run the user pixel shader once per pixel —
vectorized over the whole frame. Final u8 packing matches vec4_to_u8_array
(renderer.rs:7-14); background pixels keep the fill color.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from f_renderer_tpu.pipeline.types import TriangleBuffer
from f_renderer_tpu.shaders.api import ContextCodec


def interpolate_context(
    tri: TriangleBuffer,
    winner: jnp.ndarray,
    width: int,
    height: int,
    *,
    origin: tuple = (0, 0),
):
    """Per-pixel perspective-correct varying interpolation.

    Returns ``(ctx (H, W, C) f32, ps_index (H, W) i32)`` for the winning
    triangle at each pixel (garbage where winner < 0 — mask downstream).
    ``origin=(y0, x0)``: global coords of this sub-rect's top-left pixel.
    """
    h, w = winner.shape
    y0, x0 = origin
    wid = jnp.maximum(winner, 0)
    # Planar single-axis flat takes per (vertex, component) plane — the
    # multi-dim ``tri.spf[wid]`` gather form lowers far worse on TPU
    # (CLAUDE.md gather lesson; TriangleBuffer is planar since r3).
    sfx = [jnp.take(tri.spf[v, 0], wid) for v in range(3)]  # (H, W) each
    sfy = [jnp.take(tri.spf[v, 1], wid) for v in range(3)]
    rhw3 = [jnp.take(tri.rhw[v], wid) for v in range(3)]
    nc = tri.num_channels

    px = x0 + jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    py = y0 + jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    sx = [sfx[v] - px for v in range(3)]
    sy = [sfy[v] - py for v in range(3)]

    def perp(i, j):
        return jnp.abs(sx[i] * sy[j] - sy[i] * sx[j])

    a = perp(1, 2)
    b = perp(2, 0)
    c = perp(0, 1)
    inv_s = 1.0 / (a + b + c)
    la, lb, lc = a * inv_s, b * inv_s, c * inv_s

    rhw = rhw3[0] * la + rhw3[1] * lb + rhw3[2] * lc
    w_corr = 1.0 / jnp.where(rhw != 0.0, rhw, 1.0)  # renderer.rs:368
    coef = [rhw3[0] * la * w_corr, rhw3[1] * lb * w_corr, rhw3[2] * lc * w_corr]
    if nc:
        ctx = jnp.stack(
            [
                jnp.take(tri.ctx[0 * nc + ch], wid) * coef[0]
                + jnp.take(tri.ctx[1 * nc + ch], wid) * coef[1]
                + jnp.take(tri.ctx[2 * nc + ch], wid) * coef[2]
                for ch in range(nc)
            ],
            axis=-1,
        )  # (H, W, C)
    else:
        ctx = jnp.zeros((h, w, 0), jnp.float32)
    return ctx, jnp.take(tri.ps_index, wid)


def shade_from_planes(
    ctx: jnp.ndarray,
    ps_idx: jnp.ndarray,
    winner: jnp.ndarray,
    pixel_shader: Callable,
    ps_uniform,
    codec: ContextCodec,
    *,
    background=(0, 0, 0, 255),
    vectorized: bool = True,
):
    """Shade from pre-interpolated context planes (rasterize_interp_pallas).

    ``ctx`` (H, W, C) f32, ``ps_idx``/``winner`` (H, W) i32. Same pixel-shader
    contract as shade_deferred; background applied where winner < 0.

    ``vectorized=True`` calls the pixel shader ONCE with (H, W)-batched
    context leaves — shaders must broadcast (last-axis reductions), which all
    built-ins do. Per-pixel vmap lowers texture/table gathers far worse on
    TPU; set ``vectorized=False`` only for scalar-style custom shaders.
    """
    # Background pixels carry garbage ctx; ps_index = -1 marks them so
    # samplers can exclude them (their color is replaced below anyway).
    ps_idx = jnp.where(winner >= 0, ps_idx, -1)
    if vectorized:
        color = pixel_shader(ps_uniform, codec.unflatten(ctx), ps_idx)
    else:

        def shade_one(flat, idx):
            return pixel_shader(ps_uniform, codec.unflatten(flat), idx)

        color = jax.vmap(jax.vmap(shade_one))(ctx, ps_idx)  # (H, W, 4)
    u8 = jnp.clip(color * 255.0, 0.0, 255.0).astype(jnp.uint8)
    bg = jnp.asarray(background, jnp.uint8)
    return jnp.where((winner >= 0)[..., None], u8, bg[None, None, :])


def shade_deferred(
    tri: TriangleBuffer,
    winner: jnp.ndarray,
    pixel_shader: Callable,
    ps_uniform,
    codec: ContextCodec,
    *,
    background=(0, 0, 0, 255),
    origin: tuple = (0, 0),
    vectorized: bool = True,
):
    """Run the pixel shader over the frame; returns (H, W, 4) uint8.

    ``pixel_shader(ps_uniform, context_pytree, ps_index) -> rgba (..., 4)``.
    See shade_from_planes for the ``vectorized`` contract.
    """
    h, w = winner.shape
    ctx_flat, ps_idx = interpolate_context(tri, winner, w, h, origin=origin)
    return shade_from_planes(
        ctx_flat,
        ps_idx,
        winner,
        pixel_shader,
        ps_uniform,
        codec,
        background=background,
        vectorized=vectorized,
    )
