"""Pallas TPU bilinear texture sampler.

XLA per-pixel texel gathers cost ~24 ms/frame at 1080p on v5e (the best
formulation — baselines/profile_texture.py); this kernel replaces them with
in-VMEM lookups:

- The texture stack lives in VMEM channel-major as (4, T·Hmax, Wpad=128) —
  one sublane row per texture row, lanes = texture x. Requires Wmax ≤ 128
  (the hardware lane width); wider textures fall back to the XLA path.
- Pixels are processed in (BS, 128) blocks. Per block the kernel computes
  the touched texture-row range [rmin, rmax] (dynamic fori bounds) and for
  each row in range does one 128-lane dynamic gather per x-tap per channel
  (``jnp.take_along_axis`` — Mosaic lane gather, supported on v5e+), masked
  by the per-pixel bilinear row weight. Spatially coherent uv (the raster
  case) touches only a few rows per block, so cost ≈ O(rows touched).
- Bilinear semantics replicate FrameBuffer::sample_2d (renderer.rs:516-538)
  including the width-clamp-on-y quirk and fract() weights; pixels with
  ps_index < 0 (background) are excluded from the row range and produce
  garbage — callers mask by winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def _sample_kernel(
    dims_ref,  # SMEM (T, 2) i32 — (h, w) per texture
    ps_ref,  # (BS, 128) i32
    u_ref,  # (BS, 128) f32
    v_ref,  # (BS, 128) f32
    tex_ref,  # VMEM (4, T*Hmax, 128) f32
    out_ref,  # (4, BS, 128) f32
    *,
    t_count: int,
    hmax: int,
    bs: int,
    replicate_clamp_bug: bool,
):
    ps = ps_ref[...]
    u = u_ref[...]
    v = v_ref[...]
    h = jnp.zeros((bs, LANES), jnp.int32)
    w = jnp.zeros((bs, LANES), jnp.int32)
    for t in range(t_count):
        sel = ps == t
        h = jnp.where(sel, dims_ref[t, 0], h)
        w = jnp.where(sel, dims_ref[t, 1], w)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf
    y = v * hf
    a = x - jnp.trunc(x)
    b = y - jnp.trunc(y)
    x = jnp.where(jnp.isnan(x), 0.0, x)
    y = jnp.where(jnp.isnan(y), 0.0, y)
    y_hi = (w if replicate_clamp_bug else h) - 1  # renderer.rs:523-525 quirk
    x1 = jnp.clip(jnp.trunc(x), 0.0, wf - 1.0).astype(jnp.int32)
    y1 = jnp.clip(jnp.trunc(y), 0.0, y_hi.astype(jnp.float32)).astype(jnp.int32)
    x2 = jnp.minimum(x1 + 1, w - 1)
    y2 = jnp.minimum(y1 + 1, y_hi)
    # Invalid (background) pixels: ps < 0 → harmless in-bounds indices.
    valid = ps >= 0
    x1 = jnp.maximum(x1, 0)
    x2 = jnp.maximum(x2, 0)
    row1 = jnp.where(valid, ps * hmax + jnp.maximum(y1, 0), 0)
    row2 = jnp.where(valid, ps * hmax + jnp.maximum(y2, 0), 0)

    nrows = t_count * hmax
    rmin = jnp.min(jnp.where(valid, row1, nrows - 1))
    rmax = jnp.max(jnp.where(valid, row2, 0))

    wx1 = 1.0 - a
    wx2 = a
    wy1 = 1.0 - b
    wy2 = b

    def row_body(r, acc):
        wy = jnp.where(row1 == r, wy1, 0.0) + jnp.where(row2 == r, wy2, 0.0)
        new = []
        for c in range(4):
            trow = jnp.broadcast_to(tex_ref[c, r, :][None, :], (bs, LANES))
            g1 = jnp.take_along_axis(trow, x1, axis=1)
            g2 = jnp.take_along_axis(trow, x2, axis=1)
            new.append(acc[c] + wy * (wx1 * g1 + wx2 * g2))
        return tuple(new)

    acc = jax.lax.fori_loop(
        rmin,
        rmax + 1,
        row_body,
        tuple(jnp.zeros((bs, LANES), jnp.float32) for _ in range(4)),
    )
    for c in range(4):
        out_ref[c] = acc[c]


def sample_bilinear_pallas(
    data: jnp.ndarray,  # (T, Hmax, Wmax, 4) f32
    dims: jnp.ndarray,  # (T, 2) i32
    index: jnp.ndarray,  # (...,) i32, -1 = invalid
    uv: jnp.ndarray,  # (..., 2) f32
    *,
    block: int = 8,
    replicate_clamp_bug: bool = True,
    interpret: bool = False,
):
    """Bilinear-sample the stack at batched (index, uv). Returns (..., 4) f32.

    Requires Wmax ≤ 128. Output for index < 0 pixels is garbage (callers
    mask); out-of-range uv follows the reference clamp semantics.
    """
    t, hmax, wmax = data.shape[0], data.shape[1], data.shape[2]
    assert wmax <= LANES, "texture wider than 128 lanes — use the XLA path"
    shape = index.shape
    p = 1
    for s in shape:
        p *= s
    rows = _cdiv(max(p, 1), LANES)
    rows_pad = _cdiv(rows, block) * block
    ppad = rows_pad * LANES

    def flat_pad(arr, fill):
        flat = arr.reshape(-1)
        return jnp.pad(flat, (0, ppad - p), constant_values=fill).reshape(
            rows_pad, LANES
        )

    ps2 = flat_pad(index.astype(jnp.int32), -1)
    u2 = flat_pad(uv[..., 0].astype(jnp.float32), 0.0)
    v2 = flat_pad(uv[..., 1].astype(jnp.float32), 0.0)

    # channel-major, x padded to the 128 lanes
    texcm = jnp.transpose(data.astype(jnp.float32), (3, 0, 1, 2)).reshape(
        4, t * hmax, wmax
    )
    if wmax < LANES:
        texcm = jnp.pad(texcm, ((0, 0), (0, 0), (0, LANES - wmax)))

    kernel = functools.partial(
        _sample_kernel,
        t_count=t,
        hmax=hmax,
        bs=block,
        replicate_clamp_bug=replicate_clamp_bug,
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // block,),
        in_specs=[
            pl.BlockSpec((t, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block, LANES), lambda i: (i, 0)),
            pl.BlockSpec(
                (4, t * hmax, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((4, block, LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, rows_pad, LANES), jnp.float32),
        interpret=interpret,
    )(dims.astype(jnp.int32), ps2, u2, v2, texcm)
    return jnp.moveaxis(out, 0, -1).reshape(-1, 4)[:p].reshape(shape + (4,))
