"""Pallas TPU tile rasterizer (the hot kernel; reference: renderer.rs:269-384).

Same math as raster_jnp.py — per-pixel lexicographic (rhw, order) argmax —
executed as a Pallas kernel gridded over framebuffer tiles:

- grid = (tiles_y, tiles_x); each program owns one (th, tw) tile; the
  depth/worder/winner carries live in registers/VMEM for the whole triangle
  loop and only the final result is stored.
- Triangle setup lives in **HBM** as (M, fields) arrays (no VMEM capacity
  limit on scene size). Triangles are processed in chunks: a per-chunk bbox
  union (prefetched to SMEM) gives an O(1) whole-chunk skip; hit chunks are
  DMA'd into a VMEM scratch block and looped per triangle.
- Per-triangle fields are scalar-read from an SMEM scratch block (SMEM
  supports arbitrary dynamic indexing; VMEM does not) and broadcast against
  the (th, tw) tile by the VPU.
- The per-pixel fill rule / edge functions / barycentric / depth math is
  bit-identical to raster_jnp.py (renderer.rs:322-366 semantics).

The lexicographic (rhw, order) merge is associative, so any triangle
partitioning order gives the reference result exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f_renderer_tpu.pipeline.types import TriangleBuffer

ORDER_NONE = -2147483648

# tri_i32 field columns
_P0X, _P0Y, _P1X, _P1Y, _P2X, _P2Y = range(6)
_TL01, _TL12, _TL20 = 6, 7, 8
_ORDER = 9
_MINX, _MAXX, _MINY, _MAXY = 10, 11, 12, 13
NF_I = 16  # 14 used + pad to sublane multiple
# tri_f32 field columns
_S0X, _S0Y, _S1X, _S1Y, _S2X, _S2Y = range(6)
_RHW0, _RHW1, _RHW2 = 6, 7, 8
NF_F = 16  # 9 used + pad to sublane multiple


def _cdiv(a, b):
    return -(-a // b)


def pack_setup(tri: TriangleBuffer, width: int, height: int, m_pad: int):
    """Pack a TriangleBuffer into field-major (NF_I, m_pad) i32 + (NF_F, m_pad) f32.

    Field-major so per-chunk DMA slices the (lane) triangle dimension at
    128-aligned offsets. Invalid slots get an empty bbox (min=max=0) so they
    can never hit a tile — no separate valid flag needed in the kernel.
    """
    m = tri.num_slots
    sx = tri.spi[:, :, 0]
    sy = tri.spi[:, :, 1]
    valid = tri.valid
    min_x = jnp.where(valid, jnp.clip(jnp.min(sx, axis=1), 0, width), 0)
    max_x = jnp.where(valid, jnp.clip(jnp.max(sx, axis=1), 0, width), 0)
    min_y = jnp.where(valid, jnp.clip(jnp.min(sy, axis=1), 0, height), 0)
    max_y = jnp.where(valid, jnp.clip(jnp.max(sy, axis=1), 0, height), 0)
    cols_i = jnp.stack(
        [
            sx[:, 0],
            sy[:, 0],
            sx[:, 1],
            sy[:, 1],
            sx[:, 2],
            sy[:, 2],
            tri.top_left[:, 0].astype(jnp.int32),
            tri.top_left[:, 1].astype(jnp.int32),
            tri.top_left[:, 2].astype(jnp.int32),
            tri.order,
            min_x,
            max_x,
            min_y,
            max_y,
        ],
        axis=0,
    )
    cols_f = jnp.stack(
        [
            tri.spf[:, 0, 0],
            tri.spf[:, 0, 1],
            tri.spf[:, 1, 0],
            tri.spf[:, 1, 1],
            tri.spf[:, 2, 0],
            tri.spf[:, 2, 1],
            tri.rhw[:, 0],
            tri.rhw[:, 1],
            tri.rhw[:, 2],
        ],
        axis=0,
    )

    def pad_to(rows, nf, dtype):
        out = jnp.zeros((nf, m_pad), dtype)
        return out.at[: rows.shape[0], :m].set(rows.astype(dtype))

    return pad_to(cols_i, NF_I, jnp.int32), pad_to(cols_f, NF_F, jnp.float32)


def chunk_bounds(tri_i32, chunk: int):
    """Per-chunk bbox union over chunks of triangles → (5, nchunks) i32.

    Rows: min_x, max_x, min_y, max_y, any_valid. Invalid slots have empty
    bboxes so plain min/max unions are correct; any_valid = union nonempty.
    """
    m_pad = tri_i32.shape[1]
    nchunks = m_pad // chunk

    def r(col):
        return tri_i32[col].reshape(nchunks, chunk)

    cminx = jnp.min(r(_MINX), axis=1)
    cmaxx = jnp.max(r(_MAXX), axis=1)
    cminy = jnp.min(r(_MINY), axis=1)
    cmaxy = jnp.max(r(_MAXY), axis=1)
    cany = ((cmaxx > cminx) & (cmaxy > cminy)).astype(jnp.int32)
    return jnp.stack([cminx, cmaxx, cminy, cmaxy, cany])


def _raster_kernel(
    cb_ref,  # SMEM (5, nchunks)
    tri_i_ref,  # ANY/HBM (NF_I, m_pad)
    tri_f_ref,  # ANY/HBM (NF_F, m_pad)
    depth_in_ref,
    worder_in_ref,
    winner_in_ref,
    depth_ref,
    worder_ref,
    winner_ref,
    vi_ref,  # SMEM scratch (NF_I, chunk) i32
    vf_ref,  # SMEM scratch (NF_F, chunk) f32
    sem_i,
    sem_f,
    *,
    th: int,
    tw: int,
    chunk: int,
    id_base: int,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    oy = ty * th
    ox = tx * tw

    cy = oy + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    cx = ox + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    pcx = cx.astype(jnp.float32) + 0.5
    pcy = cy.astype(jnp.float32) + 0.5

    def make_tri_body(ci):
        def tri_body(t, carry):
            depth, worder, winner = carry
            tri_id = id_base + ci * chunk + t

            def i32f(col):
                return vi_ref[col, t]  # scalar (SMEM dynamic indexing)

            def f32f(col):
                return vf_ref[col, t]

            minx = i32f(_MINX)
            maxx = i32f(_MAXX)
            miny = i32f(_MINY)
            maxy = i32f(_MAXY)
            in_bbox = (cx >= minx) & (cx < maxx) & (cy >= miny) & (cy < maxy)

            p0x, p0y = i32f(_P0X), i32f(_P0Y)
            p1x, p1y = i32f(_P1X), i32f(_P1Y)
            p2x, p2y = i32f(_P2X), i32f(_P2Y)
            e01 = -(cx - p0x) * (p1y - p0y) + (cy - p0y) * (p1x - p0x)
            e12 = -(cx - p1x) * (p2y - p1y) + (cy - p1y) * (p2x - p1x)
            e20 = -(cx - p2x) * (p0y - p2y) + (cy - p2y) * (p0x - p2x)
            cover = (
                in_bbox
                & (e01 >= 1 - i32f(_TL01))
                & (e12 >= 1 - i32f(_TL12))
                & (e20 >= 1 - i32f(_TL20))
            )

            s0x = f32f(_S0X) - pcx
            s0y = f32f(_S0Y) - pcy
            s1x = f32f(_S1X) - pcx
            s1y = f32f(_S1Y) - pcy
            s2x = f32f(_S2X) - pcx
            s2y = f32f(_S2Y) - pcy
            a = jnp.abs(s1x * s2y - s1y * s2x)
            b = jnp.abs(s2x * s0y - s2y * s0x)
            c = jnp.abs(s0x * s1y - s0y * s1x)
            s = a + b + c
            cover = cover & (s != 0.0)
            inv_s = 1.0 / s
            rhw = (
                f32f(_RHW0) * (a * inv_s)
                + f32f(_RHW1) * (b * inv_s)
                + f32f(_RHW2) * (c * inv_s)
            )

            o = i32f(_ORDER)
            accept = cover & ((rhw > depth) | ((rhw >= depth) & (o > worder)))
            depth = jnp.where(accept, rhw, depth)
            worder = jnp.where(accept, o, worder)
            winner = jnp.where(accept, tri_id, winner)
            return depth, worder, winner

        return tri_body

    def chunk_body(ci, carry):
        chit = (
            (cb_ref[4, ci] != 0)
            & (cb_ref[0, ci] < ox + tw)
            & (cb_ref[1, ci] > ox)
            & (cb_ref[2, ci] < oy + th)
            & (cb_ref[3, ci] > oy)
        )

        def do_chunk(cr):
            dma_i = pltpu.make_async_copy(
                tri_i_ref.at[:, pl.ds(ci * chunk, chunk)], vi_ref, sem_i
            )
            dma_f = pltpu.make_async_copy(
                tri_f_ref.at[:, pl.ds(ci * chunk, chunk)], vf_ref, sem_f
            )
            dma_i.start()
            dma_f.start()
            dma_i.wait()
            dma_f.wait()
            return jax.lax.fori_loop(0, chunk, make_tri_body(ci), cr)

        return jax.lax.cond(chit, do_chunk, lambda cr: cr, carry)

    nchunks = cb_ref.shape[1]
    init = (depth_in_ref[:], worder_in_ref[:], winner_in_ref[:])
    depth, worder, winner = jax.lax.fori_loop(0, nchunks, chunk_body, init)
    depth_ref[:] = depth
    worder_ref[:] = worder
    winner_ref[:] = winner


def _raster_call(
    cb,
    tri_i32,
    tri_f32,
    depth0,
    worder0,
    winner0,
    *,
    th,
    tw,
    chunk,
    id_base,
    interpret,
):
    h_pad, w_pad = depth0.shape
    grid = (h_pad // th, w_pad // tw)
    nchunks = cb.shape[1]
    tile_spec = pl.BlockSpec((th, tw), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _raster_kernel, th=th, tw=tw, chunk=chunk, id_base=id_base
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, nchunks), lambda ty, tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            tile_spec,
            tile_spec,
            tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((NF_I, chunk), jnp.int32),
            pltpu.SMEM((NF_F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cb, tri_i32, tri_f32, depth0, worder0, winner0)


def rasterize_pallas(
    tri: TriangleBuffer,
    width: int,
    height: int,
    *,
    tile: tuple[int, int] = (128, 128),
    chunk: int = 256,
    interpret: bool = False,
):
    """Rasterize to per-pixel (winner (H,W) i32, depth (H,W) f32).

    ``chunk`` must be a multiple of 128 (DMA lane alignment).
    """
    assert chunk % 128 == 0, "chunk must be a multiple of 128"
    th, tw = tile
    h_pad = _cdiv(height, th) * th
    w_pad = _cdiv(width, tw) * tw
    m = tri.num_slots
    m_pad = _cdiv(m, chunk) * chunk

    tri_i32, tri_f32 = pack_setup(tri, width, height, m_pad)
    cb = chunk_bounds(tri_i32, chunk)

    depth0 = jnp.zeros((h_pad, w_pad), jnp.float32)
    worder0 = jnp.full((h_pad, w_pad), ORDER_NONE, jnp.int32)
    winner0 = jnp.full((h_pad, w_pad), -1, jnp.int32)

    depth, worder, winner = _raster_call(
        cb,
        tri_i32,
        tri_f32,
        depth0,
        worder0,
        winner0,
        th=th,
        tw=tw,
        chunk=chunk,
        id_base=0,
        interpret=interpret,
    )
    return winner[:height, :width], depth[:height, :width]
