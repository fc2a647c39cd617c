"""Pallas TPU bilinear texture sampler over the packed RGBA8 stack.

XLA per-pixel texel gathers cost ~24 ms/frame at 1080p on v5e (the best
formulation — baselines/profile_texture.py); this kernel replaces them with
in-VMEM lookups:

- Textures live in VMEM as ``TextureStack.packed``: one i32 per texel
  (RGBA8), texture x split into pages of 128 lanes, PAGE-MAJOR with 8-row
  aligned blocks — flat row = (t·pages + page)·Hmax8 + y (texture.py:
  pack_rgba8). 4 bytes/texel (vs 16 for the r1 channel-major f32 layout)
  and **any texture width**, not just ≤128.
- Pixels are processed in (BS, 128) blocks. Sampling loops over textures
  (static, T is small); per texture it computes the touched row range
  [y_lo, y_hi] × page range [p_lo, p_hi] from only the pixels that select
  that texture, then per (row, page) does one 128-lane dynamic gather per
  x-tap (``jnp.take_along_axis`` — Mosaic lane gather, v5e+), unpacks the
  four u8 channels, and accumulates with the per-pixel bilinear weights.
  Per-texture ranges mean a block straddling two draws pays
  y_span(A) + y_span(B), not the whole distance between their stack rows.
- Bilinear semantics replicate FrameBuffer::sample_2d (renderer.rs:516-538)
  including the width-clamp-on-y quirk and fract() weights; texel values
  are u8/255 exactly (f32 division) so results match the XLA f32 path.
- Pixels with ps_index < 0 (background) are excluded from the ranges and
  produce garbage — callers mask by winner. uv that the width-clamp quirk
  sends past a texture's real height reads stack padding (zeros) here vs
  clamped garbage in the XLA path — both are out-of-contract garbage
  (SURVEY.md §7.3.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Inner-loop formulation (A/B knobs, baselines/profile_sampler_taps.py +
# profile_sampler_unroll.py, which sweeps any PROFILE_MODES list):
#   "taps"  — select each pixel's 4 raw packed texels inside the (row, page)
#             loop (2 compares + 4 selects/iter) and defer ALL weight math +
#             u8 unpacking to one post-loop block per texture (~15 ops/iter).
#   "tapsU" — taps with the (row, page) nest flattened and unrolled U×: the
#             per-trip latency chain (scalar index → dynamic row load → 2
#             lane gathers → selects) is what bounds the loop (not issues),
#             so U independent chains/trip overlap it. Measured phong1080
#             (3×512², paired): taps 8.07 → taps4 6.22 → taps8 5.72 ms.
#   "grpU"  — 8-row GROUP loop: one aligned (8, 128) tile load per group
#             (the page-major packed layout makes groups contiguous), then
#             a static 8-row unroll of broadcast + 2 lane gathers + exact
#             (row, page)-match selects. 8× fewer loop trips than taps and
#             no per-row dynamic loads or div/mod; U unrolls the group loop.
#   "rows"  — the r2-r4 body: per-row weight folding + per-tap unpack-fma
#             (~44 ops/iter, the 60%-of-phong1080 roofline line item).
import os as _os

# Default from the r4 TPU ladder (process-paired, identical checksums):
# taps 8.07 → taps2 6.81 → taps4 6.22 → taps8 5.72-6.01 (taps12/16
# plateau); grp 5.93 / grp2 5.68 / grp4 5.72 vs taps8 5.85 same-process.
# grp2 wins by ~3%; the frame now sits at the 1-issue @1.70 GHz roofline
# (5.02 ms band edge, profile_phong_roofline.py) — the remaining gap is
# issue count, not latency.
TAP_MODE = _os.environ.get("FR_SAMPLER", "grp2")


def _cdiv(a, b):
    return -(-a // b)


def _unpack_u8(g, c):
    """Channel c of packed RGBA8 i32 → f32 in [0,1] (exactly k/255)."""
    return ((g >> (8 * c)) & 0xFF).astype(jnp.float32) / 255.0


def _unpack_u8_raw(g, c):
    """Channel c of packed RGBA8 i32 → f32 in [0, 255] (the /255 is
    deferred to one multiply on the accumulated planes)."""
    return ((g >> (8 * c)) & 0xFF).astype(jnp.float32)


def _rmin(x):
    """Cross-lane min, sublane-reduced first: a (bs, 128) full reduction
    costs ~200 cycles lowered whole; axis-0 first is a bs/8-vreg vector op
    and only the final (1, 128) pays the cross-lane tree (VERDICT r2 #1c)."""
    return jnp.min(jnp.min(x, axis=0, keepdims=True))


def _rmax(x):
    return jnp.max(jnp.max(x, axis=0, keepdims=True))


def sample_packed_planar(
    tex_ref,  # VMEM ref (T·pages·Hmax8, 128) i32 — page-major packed stack
    dims,  # SMEM ref (T, 2) i32 or concrete array
    ps,  # (bs, 128) i32 — per-pixel texture id, -1 = invalid
    u,  # (bs, 128) f32
    v,  # (bs, 128) f32
    *,
    t_count: int,
    hmax: int,
    pages: int,
    replicate_clamp_bug: bool = True,
    opaque: bool = False,
):
    """Shared in-kernel sampling core → 4 (bs, 128) f32 channel planes.

    Usable from any Pallas kernel that keeps the packed stack in VMEM
    (the standalone sampler below and the fused renderer's epilogue).

    The texel (row, page) loop is the measured phong1080 hot spot
    (~3.7 ms of the 8.1 ms frame at 3×512², profile_phong_split), so its
    body is dieted: sel folds into the x-weights once per texture instead
    of two mask ops per tap; the /255 is deferred to one multiply per
    plane after the loop (an accumulation-order change of last-ulp size —
    within the fused-vs-jnp and golden budgets); with ``opaque`` (every
    real texel alpha = 255, a static TextureStack flag) alpha accumulates
    as the plain weight sum, exactly w·1.0 per tap.

    Two layout variants were measured SLOWER on TPU and removed (r3 A/B,
    BASELINE.md): (sub_rows, 128) strip sampling with per-strip ranges
    (8.4 → 10.6/11.6 ms phong1080 — uv y-span does not shrink with block
    height on real meshes) and predivided f32 channel planes replacing the
    per-tap unpack/divide with 4 lane gathers (13.9 ms phong1080 — the
    12.6 MB resident stack starves VMEM; and Mosaic-vs-XLA divide
    lowerings differ by ulps, breaking bit-parity on hardware).
    """
    shape = ps.shape
    from f_renderer_tpu.shaders.texture import hmax_padded

    hmax_pad = hmax_padded(hmax)  # texture.py:pack_rgba8 row padding
    acc = tuple(jnp.zeros(shape, jnp.float32) for _ in range(4))
    for t in range(t_count):
        sel = ps == t
        h_t = dims[t, 0]
        w_t = dims[t, 1]
        wf = w_t.astype(jnp.float32)
        hf = h_t.astype(jnp.float32)
        x = u * wf
        y = v * hf
        # NaN-guard BEFORE the fracts: the hoisted sel-masked x-weights
        # must not carry NaN through masked pixels (NaN · 0 = NaN). Valid
        # pixels are untouched — their x/y are never NaN.
        x = jnp.where(jnp.isnan(x), 0.0, x)
        y = jnp.where(jnp.isnan(y), 0.0, y)
        a = x - jnp.trunc(x)
        b = y - jnp.trunc(y)
        y_hi_clamp = (w_t if replicate_clamp_bug else h_t) - 1
        x1 = jnp.clip(jnp.trunc(x), 0.0, wf - 1.0).astype(jnp.int32)
        y1 = jnp.clip(
            jnp.trunc(y), 0.0, y_hi_clamp.astype(jnp.float32)
        ).astype(jnp.int32)
        x1 = jnp.maximum(x1, 0)
        y1 = jnp.maximum(y1, 0)
        x2 = jnp.minimum(x1 + 1, w_t - 1)
        y2 = jnp.minimum(y1 + 1, y_hi_clamp)
        # Reference-panic region (width-clamp quirk past the texture height):
        # clamp to the stack rows, matching the XLA path (texture.py).
        y1 = jnp.minimum(y1, hmax - 1)
        y2 = jnp.minimum(y2, hmax - 1)
        lane1 = x1 & (LANES - 1)
        lane2 = x2 & (LANES - 1)
        px1 = x1 >> 7
        px2 = x2 >> 7
        # sel folded into the x-weights once per texture (not per tap).
        wx1 = jnp.where(sel, 1.0 - a, 0.0)
        wx2 = jnp.where(sel, a, 0.0)
        wy1 = 1.0 - b
        wy2 = b

        big = jnp.int32(2**30)
        y_lo = jnp.clip(_rmin(jnp.where(sel, y1, big)), 0, hmax - 1)
        y_hi = jnp.clip(_rmax(jnp.where(sel, y2, -1)), -1, hmax - 1)
        if pages > 1:
            p_lo = jnp.clip(_rmin(jnp.where(sel, px1, big)), 0, pages - 1)
            p_hi = jnp.clip(_rmax(jnp.where(sel, px2, -1)), -1, pages - 1)
        base_t = t * pages * hmax_pad  # page-major: row = base + pg·H8 + y

        if TAP_MODE.startswith("taps") or TAP_MODE.startswith("grp"):
            # Raw-tap selection: the loop only RESOLVES each pixel's four
            # packed texels (t11=(y1,x1), t12=(y1,x2), t21=(y2,x1),
            # t22=(y2,x2)) via i32 selects; weights + unpack + fma happen
            # ONCE per texture after the loop. ~15 vector ops/iteration vs
            # ~44 for the per-row weight-fold body — yet measured only
            # textured1080 3.37 → 3.27 ms, phong1080 8.27 → 8.42 (noise)
            # in isolated paired A/Bs (profile_sampler_taps.py): the loop
            # is LATENCY/CONTROL-bound per iteration (dynamic row load +
            # gathers + fori_loop overhead), not issue-bound, so the
            # arithmetic diet barely moves it. Kept (never worse, bit-
            # identical checksums, and the lighter body is the base for
            # iteration-count reductions). Non-sel pixels resolve garbage
            # taps but their weights are sel-masked to 0.0 and u8 unpack is
            # always finite, so they contribute exact zeros, as before.
            def tap_select(taps, yy, row, page):
                t11, t12, t21, t22 = taps
                trow = jnp.broadcast_to(tex_ref[pl.ds(row, 1), :], shape)
                g1 = jnp.take_along_axis(trow, lane1, axis=1)
                g2 = jnp.take_along_axis(trow, lane2, axis=1)
                my1 = y1 == yy
                my2 = y2 == yy
                if pages > 1:
                    mp1 = px1 == page
                    mp2 = px2 == page
                    t11 = jnp.where(my1 & mp1, g1, t11)
                    t12 = jnp.where(my1 & mp2, g2, t12)
                    t21 = jnp.where(my2 & mp1, g1, t21)
                    t22 = jnp.where(my2 & mp2, g2, t22)
                else:
                    t11 = jnp.where(my1, g1, t11)
                    t12 = jnp.where(my1, g2, t12)
                    t21 = jnp.where(my2, g1, t21)
                    t22 = jnp.where(my2, g2, t22)
                return (t11, t12, t21, t22)

            zero = jnp.zeros(shape, jnp.int32)
            if TAP_MODE.startswith("grp"):
                # 8-row group loop over the page-major stack: one ALIGNED
                # (8, 128) tile load per (group, page), then a static 8-row
                # unroll of sublane broadcast + 2 lane gathers + exact
                # (row, page)-match selects. Vs taps: 8× fewer loop trips,
                # no per-row dynamic loads, the 8 rows' gather chains are
                # independent (latency overlap), and ~11 ops/row vs ~15.
                # Resolution stays an exact selection of the same packed
                # texels — bit-identical results.
                unroll = int(TAP_MODE[3:]) if len(TAP_MODE) > 3 else 1
                g_lo = y_lo >> 3
                g_hi = y_hi >> 3

                def grp_select(taps, gg, pg, mp1, mp2):
                    t11, t12, t21, t22 = taps
                    tile = tex_ref[
                        pl.ds(base_t + pg * hmax_pad + gg * 8, 8), :
                    ]
                    sub1 = y1 - gg * 8
                    sub2 = y2 - gg * 8
                    if mp1 is None:  # single page: row match only
                        m11 = m12 = sub1
                        m21 = m22 = sub2
                    else:  # fold the page match into the row index
                        m11 = jnp.where(mp1, sub1, -1)
                        m12 = jnp.where(mp2, sub1, -1)
                        m21 = jnp.where(mp1, sub2, -1)
                        m22 = jnp.where(mp2, sub2, -1)
                    for h in range(8):
                        trow = jnp.broadcast_to(tile[h][None, :], shape)
                        g1 = jnp.take_along_axis(trow, lane1, axis=1)
                        g2 = jnp.take_along_axis(trow, lane2, axis=1)
                        t11 = jnp.where(m11 == h, g1, t11)
                        t12 = jnp.where(m12 == h, g2, t12)
                        t21 = jnp.where(m21 == h, g1, t21)
                        t22 = jnp.where(m22 == h, g2, t22)
                    return (t11, t12, t21, t22)

                if pages > 1:
                    p_span = jnp.maximum(p_hi + 1 - p_lo, 0)
                    total = jnp.maximum(g_hi + 1 - g_lo, 0) * p_span
                else:
                    total = jnp.maximum(g_hi + 1 - g_lo, 0)

                def gstep(i, taps):
                    if pages > 1:
                        gg = g_lo + i // p_span
                        pg = p_lo + i % p_span
                        return grp_select(taps, gg, pg, px1 == pg, px2 == pg)
                    return grp_select(taps, g_lo + i, 0, None, None)

                def gu_body(kk, taps):
                    i0 = kk * unroll
                    for j in range(unroll):
                        taps = gstep(jnp.minimum(i0 + j, total - 1), taps)
                    return taps

                t11, t12, t21, t22 = jax.lax.fori_loop(
                    0,
                    (total + unroll - 1) // unroll,
                    gu_body,
                    (zero, zero, zero, zero),
                )
            elif (
                unroll := int(TAP_MODE[4:]) if len(TAP_MODE) > 4 else 1
            ) > 1:
                # "tapsU" (U=2,4,...): flatten (row, page) into one trip
                # count and unroll the fori body U×. The per-iteration
                # latency chain (scalar row index → dynamic VMEM row load →
                # 2 lane gathers → selects) serializes across fori trips
                # (Mosaic doesn't software-pipeline while loops); U
                # independent chains per trip let the scheduler overlap
                # them. Tail duplicates (flat index clamped to total−1)
                # re-select identical taps — idempotent, bit-exact.
                if pages > 1:
                    p_span = jnp.maximum(p_hi + 1 - p_lo, 0)
                    total = jnp.maximum(y_hi + 1 - y_lo, 0) * p_span
                else:
                    total = jnp.maximum(y_hi + 1 - y_lo, 0)

                def step(i, taps):
                    if pages > 1:
                        yy = y_lo + i // p_span
                        pg = p_lo + i % p_span
                        return tap_select(
                            taps, yy, base_t + pg * hmax_pad + yy, pg
                        )
                    yy = y_lo + i
                    return tap_select(taps, yy, base_t + yy, 0)

                def u_body(k, taps):
                    i0 = k * unroll
                    for j in range(unroll):
                        taps = step(jnp.minimum(i0 + j, total - 1), taps)
                    return taps

                t11, t12, t21, t22 = jax.lax.fori_loop(
                    0,
                    (total + unroll - 1) // unroll,
                    u_body,
                    (zero, zero, zero, zero),
                )
            else:

                def y_body(yy, taps):
                    if pages == 1:
                        return tap_select(taps, yy, base_t + yy, 0)

                    def p_body(pg, taps):
                        return tap_select(
                            taps, yy, base_t + pg * hmax_pad + yy, pg
                        )

                    return jax.lax.fori_loop(p_lo, p_hi + 1, p_body, taps)

                t11, t12, t21, t22 = jax.lax.fori_loop(
                    y_lo, y_hi + 1, y_body, (zero, zero, zero, zero)
                )
            # Tap order (y1,px1), (y1,px2), (y2,px1), (y2,px2) matches the
            # old row/page-ascending accumulation order bit-for-bit for the
            # common y1<y2 pixel; y1==y2 edge pixels reassociate
            # wx·(wy1+wy2) into wx·wy1 + wx·wy2 (last-ulp, inside the
            # fused-vs-jnp budget and closer to the XLA oracle's 4-product
            # form, texture.py:197-202).
            w11 = wx1 * wy1
            w12 = wx2 * wy1
            w21 = wx1 * wy2
            w22 = wx2 * wy2
            acc = tuple(
                acc[c]
                + w11 * _unpack_u8_raw(t11, c)
                + w12 * _unpack_u8_raw(t12, c)
                + w21 * _unpack_u8_raw(t21, c)
                + w22 * _unpack_u8_raw(t22, c)
                for c in range(3)
            ) + (
                (
                    acc[3] + (w11 + w12 + w21 + w22)
                    if opaque
                    else acc[3]
                    + w11 * _unpack_u8_raw(t11, 3)
                    + w12 * _unpack_u8_raw(t12, 3)
                    + w21 * _unpack_u8_raw(t21, 3)
                    + w22 * _unpack_u8_raw(t22, 3)
                ),
            )
        else:

            def tap_accum(acc, row, page, wy_row):
                trow = jnp.broadcast_to(tex_ref[pl.ds(row, 1), :], shape)
                g1 = jnp.take_along_axis(trow, lane1, axis=1)
                g2 = jnp.take_along_axis(trow, lane2, axis=1)
                if pages > 1:
                    w1 = jnp.where(px1 == page, wx1, 0.0) * wy_row
                    w2 = jnp.where(px2 == page, wx2, 0.0) * wy_row
                else:
                    w1 = wx1 * wy_row
                    w2 = wx2 * wy_row
                out = [
                    acc[c]
                    + w1 * _unpack_u8_raw(g1, c)
                    + w2 * _unpack_u8_raw(g2, c)
                    for c in range(3)
                ]
                if opaque:
                    out.append(acc[3] + (w1 + w2))
                else:
                    out.append(
                        acc[3]
                        + w1 * _unpack_u8_raw(g1, 3)
                        + w2 * _unpack_u8_raw(g2, 3)
                    )
                return tuple(out)

            def y_body(yy, acc):
                wy_row = jnp.where(y1 == yy, wy1, 0.0) + jnp.where(
                    y2 == yy, wy2, 0.0
                )
                if pages == 1:
                    return tap_accum(acc, base_t + yy, 0, wy_row)

                def p_body(pg, acc):
                    return tap_accum(
                        acc, base_t + pg * hmax_pad + yy, pg, wy_row
                    )

                return jax.lax.fori_loop(p_lo, p_hi + 1, p_body, acc)

            acc = jax.lax.fori_loop(y_lo, y_hi + 1, y_body, acc)
    # One correctly-rounded division per plane (not a reciprocal multiply).
    return (
        acc[0] / 255.0,
        acc[1] / 255.0,
        acc[2] / 255.0,
        acc[3] if opaque else acc[3] / 255.0,
    )


def _sample_kernel(
    dims_ref,  # SMEM (T, 2) i32
    ps_ref,  # (BS, 128) i32
    u_ref,  # (BS, 128) f32
    v_ref,  # (BS, 128) f32
    tex_ref,  # VMEM (T·Hmax·pages, 128) i32
    out_ref,  # (4, BS, 128) f32
    *,
    t_count: int,
    hmax: int,
    pages: int,
    replicate_clamp_bug: bool,
    opaque: bool,
):
    acc = sample_packed_planar(
        tex_ref,
        dims_ref,
        ps_ref[...],
        u_ref[...],
        v_ref[...],
        t_count=t_count,
        hmax=hmax,
        pages=pages,
        replicate_clamp_bug=replicate_clamp_bug,
        opaque=opaque,
    )
    for c in range(4):
        out_ref[c] = acc[c]


def sample_bilinear_pallas(
    packed: jnp.ndarray,  # (T·pages·Hmax8, 128) i32 — TextureStack.packed
    dims: jnp.ndarray,  # (T, 2) i32
    index: jnp.ndarray,  # (...,) i32, -1 = invalid
    uv: jnp.ndarray,  # (..., 2) f32
    *,
    hmax: int,
    pages: int,
    block: int = 8,
    replicate_clamp_bug: bool = True,
    interpret: bool = False,
    opaque: bool = False,
):
    """Bilinear-sample the packed stack at batched (index, uv) → (..., 4) f32.

    Output for index < 0 pixels is garbage (callers mask); out-of-range uv
    follows the reference clamp semantics.
    """
    from f_renderer_tpu.shaders.texture import hmax_padded

    t = dims.shape[0]
    hmax_pad = hmax_padded(hmax)
    assert packed.shape[0] == t * hmax_pad * pages, (
        packed.shape, t, hmax, hmax_pad, pages,
    )
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

    kernel = functools.partial(
        _sample_kernel,
        t_count=t,
        hmax=hmax,
        pages=pages,
        replicate_clamp_bug=replicate_clamp_bug,
        opaque=opaque,
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
                packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((4, block, LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, rows_pad, LANES), jnp.float32),
        interpret=interpret,
    )(dims.astype(jnp.int32), ps2, u2, v2, packed)
    return jnp.moveaxis(out, 0, -1).reshape(-1, 4)[:p].reshape(shape + (4,))
