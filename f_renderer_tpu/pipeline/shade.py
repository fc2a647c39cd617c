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
    spf = tri.spf[wid]  # (H, W, 3, 2)
    rhw3 = tri.rhw[wid]  # (H, W, 3)
    nc = tri.num_channels
    ctx3 = jnp.moveaxis(
        tri.ctx[:, wid].reshape(3, nc, h, w), (0, 1), (-2, -1)
    )  # (H, W, 3, C)

    px = x0 + jnp.arange(w, dtype=jnp.float32)[None, :, None] + 0.5
    py = y0 + jnp.arange(h, dtype=jnp.float32)[:, None, None] + 0.5
    sx = spf[..., 0] - px  # (H, W, 3)
    sy = spf[..., 1] - py

    def perp(i, j):
        return jnp.abs(sx[..., i] * sy[..., j] - sy[..., i] * sx[..., j])

    a = perp(1, 2)
    b = perp(2, 0)
    c = perp(0, 1)
    s = a + b + c
    inv_s = 1.0 / s
    lam = jnp.stack([a, b, c], axis=-1) * inv_s[..., None]  # (H, W, 3)

    rhw = jnp.sum(rhw3 * lam, axis=-1)
    w_corr = 1.0 / jnp.where(rhw != 0.0, rhw, 1.0)  # renderer.rs:368
    coef = rhw3 * lam * w_corr[..., None]  # (H, W, 3)
    ctx = jnp.sum(ctx3 * coef[..., None], axis=-2)  # (H, W, C)
    return ctx, tri.ps_index[wid]


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
