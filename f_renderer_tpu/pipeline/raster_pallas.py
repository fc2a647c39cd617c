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
- Triangle slots are pre-sorted (compact_sort): valid first, spatially
  grouped by bbox tile, so chunk bbox unions are tile-local and the skip
  test rejects almost all (tile, chunk) pairs.
- Per-triangle fields are scalar-read from an SMEM scratch block (SMEM
  supports arbitrary dynamic indexing; VMEM does not) and broadcast against
  the (th, tw) tile by the VPU.
- The per-pixel fill rule / edge functions / barycentric / depth math is
  bit-identical to raster_jnp.py (renderer.rs:322-366 semantics).

Two entry points:

- :func:`rasterize_pallas` → (winner, depth): ids for deferred shading.
- :func:`rasterize_interp_pallas` → (ctx planes, ps_index, winner, depth):
  additionally performs the perspective-correct varying interpolation
  (renderer.rs:368-378) *inside* the kernel for the currently-winning
  triangle. This exists because per-pixel gathers from the triangle table
  (shade.interpolate_context) lower to scalar loops on TPU — orders of
  magnitude slower than recomputing the interpolation densely in VMEM.

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

# tri_i32 field columns. Real fields are CONTIGUOUS in rows 0..11 with the
# four sublane-pad rows at the tail, so the prep's pair-order gather can
# fetch only NF_I_REAL rows (fused._pair_gather) and re-append the pad —
# the pad rows cost a write but never a gather read. Constraint: _SLOT/_PS
# must sit in rows [8, 16) — the deferred kernel DMAs that sublane-aligned
# half to VMEM for the chunk-deferred lane gathers.
# Edge functions are stored in AFFINE form: e(cx, cy) = A·cx + B·cy + C,
# precomputed at pack time. e01 = -(cx-p0x)(p1y-p0y) + (cy-p0y)(p1x-p0x)
# (renderer.rs:329-331) distributes to A01 = -(p1y-p0y), B01 = p1x-p0x,
# C01 = p0x(p1y-p0y) - p0y(p1x-p0x) — EXACT under wrapped i32 (the
# identity is polynomial over ℤ, and wrap is reduction mod 2³²). The
# kernel evaluates each edge in 4 vector ops instead of 6.
_A01, _B01, _C01, _A20, _B20, _C20 = range(6)
# 2·signed area = e01+e12+e20 (a per-triangle constant; same wrapped-ℤ
# argument) — the kernel derives e12 from it in 2 vector ops instead of 4.
_AREA2 = 6
_ORDER = 7
# Clamped bbox, PACKED two u16 per row: x | (y << 16). The bounds are
# clamped to [0, width/height] at pack time (and width/height < 32768 is
# asserted), so both halves are non-negative and `v >> 16` / `v & 0xFFFF`
# recover them exactly. One SMEM read + 2 scalar ALU ops replaces two SMEM
# reads per pair in the kernel's hot loop, and the i32 field block shrinks
# 14 → 12 rows — the prep's pair-order gather (the measured stress4k prep
# mountain) gathers 2 fewer rows per pair.
_MINXY = 8  # min_x | (min_y << 16)
_MAXXY = 9  # max_x | (max_y << 16)
_SLOT = 10  # original TriangleBuffer slot id (winner ids index that buffer)
# bits 0..7: ps_index (texture/draw selector; ≤256 draws — asserted at
# build); bits 8..10: the three top-left fill-rule flags (renderer.rs:26-29)
_PS = 11
PS_MASK = 0xFF
NF_I_REAL = 12
NF_I = 16


def _unpack_xy(v):
    """(x | y << 16) → (x, y); exact for clamped non-negative halves."""
    return v & 0xFFFF, v >> 16
# tri_f32 field columns
_S0X, _S0Y, _S1X, _S1Y, _S2X, _S2Y = range(6)
_RHW0, _RHW1, _RHW2 = 6, 7, 8
_CTX0 = 9  # fused-interp mode: 3*C varying channels, vertex-major
NF_F = 16  # base fields padded to sublane multiple (no ctx)


# Profiling-only knob (baselines/profile_kernel_floor.py): replaces the
# deferred pair-loop body with a stripped variant to attribute kernel time.
# None = production; "floor" = scalar reads only (+2 vector ops); "cover" =
# reads + integer cover block, no f32 barycentric/depth. NEVER set in
# production — outputs are garbage by design.
_DEBUG_PAIR_BODY = None

# Cover-test formulation (A/B knob, baselines/profile_cover.py). "or":
# fold the five tests into ONE compare on a sign-bit OR —
# (e01 | e12 | e20 | (maxx-1-cx) | (maxy-1-cy)) >= 0 — boolean-identical
# (all five ints are non-negative iff the OR's sign bit is clear; i32
# exact, coordinates never overflow), 7 vector ops vs 9. "and": the
# five-compare-AND chain (r1-r4).
import os as _os

_COVER_FORM = _os.environ.get("FR_COVER", "or")

# Pair-merge formulation for the unrolled deferred own-range loop (A/B knob,
# baselines/profile_merge.py). "seq": each unrolled pair's accept/select
# chain reads the previous pair's depth/worder — the whole group is one
# serial dependence chain (r1-r4). "tree": compute the group's pair
# candidates (rhw', order', pair id) carry-independently, reduce them in a
# binary tree, then fold once into the carry — the front-ends become
# instruction-level parallel and the dependence chain shrinks from
# `unroll` full bodies to one front-end + log2(unroll)+1 merges. EXACT by
# the merge algebra (module docstring): the per-pixel result is the strict
# lexicographic max of (rhw, order) over {background} ∪ pairs — associative
# and commutative (orders are unique per tile; the clamped-tail duplicate
# has equal keys AND equal payload, so either pick is identical), and a
# non-covered candidate masked to the background key (0.0, ORDER_NONE)
# can never win a strict comparison against the carry. Default "tree"
# (r5 paired A/B: stress4k seq:2 340.5 → tree:2 330.5 ms, identical
# checksums; tree:4/8 lose the gain again — register pressure); unroll=1
# configs take the plain path either way.
_MERGE_FORM = _os.environ.get("FR_MERGE", "tree")

# Strip-decomposition probe (baselines/profile_strip.py): TIMING-ONLY
# preview of a fragment-level pair decomposition. Groups of S = th//8 pairs
# are processed per loop trip, pair s restricted to the (8, tw) row-strip s
# of the tile — 1/S the vector work per pair, loop control and the carry
# merge amortized over the group. The REAL design needs strip-binned
# interleaved pair lists (prep work); this probe reuses the existing
# per-tile lists and pretends pair s belongs to strip s, so outputs are
# GARBAGE by design — it answers only "what does the kernel body cost in
# this shape". NEVER set in production.
_STRIP_PROBE = _os.environ.get("FR_STRIP_PROBE", "") == "1"


def _merge_pair_cand(acc, cand):
    """Fold one (rhw, order, payload) candidate into an accumulator by the
    strict lexicographic (rhw, order) max (renderer.rs:361-366 semantics:
    a challenger replaces the incumbent only when strictly greater)."""
    d, o, w = acc
    kd, ko, kw = cand
    take = (kd > d) | ((kd == d) & (ko > o))
    return (
        jnp.where(take, kd, d),
        jnp.where(take, ko, o),
        jnp.where(take, kw, w),
    )


def _tree_merge_cands(cands):
    """Binary-tree reduction of pair candidates (order-free by the merge
    algebra); halves the dependence depth vs a linear fold."""
    while len(cands) > 1:
        nxt = [
            _merge_pair_cand(cands[i], cands[i + 1])
            for i in range(0, len(cands) - 1, 2)
        ]
        if len(cands) % 2:
            nxt.append(cands[-1])
        cands = nxt
    return cands[0]


def _cdiv(a, b):
    return -(-a // b)


def _nf_f(n_ctx: int) -> int:
    return _cdiv(_CTX0 + 3 * n_ctx, 8) * 8 if n_ctx else NF_F


def pack_setup(
    tri: TriangleBuffer, width: int, height: int, m_pad: int, *, with_ctx: bool = False
):
    """Pack a TriangleBuffer into field-major (NF_I, m_pad) i32 + (nf, m_pad) f32.

    Field-major so per-chunk DMA slices the (lane) triangle dimension at
    128-aligned offsets. Invalid slots get an empty bbox (min=max=0) so they
    can never hit a tile — no separate valid flag needed in the kernel.
    With ``with_ctx``, the f32 block also carries the 3×C varying channels
    (vertex-major: v0 ch0..C-1, v1 ch0..C-1, v2 ch0..C-1).
    """
    m = tri.num_slots
    # The packed-u16 bbox rows need both halves in [0, 32767] (see the
    # _MINXY field comment); the clamps below guarantee it given this.
    assert 0 < width < 32768 and 0 < height < 32768, (width, height)
    sx = tri.spi[:, 0]  # (3, M) planes — TriangleBuffer is planar
    sy = tri.spi[:, 1]
    valid = tri.valid
    min_x = jnp.where(valid, jnp.clip(jnp.min(sx, axis=0), 0, width), 0)
    max_x = jnp.where(valid, jnp.clip(jnp.max(sx, axis=0), 0, width), 0)
    min_y = jnp.where(valid, jnp.clip(jnp.min(sy, axis=0), 0, height), 0)
    max_y = jnp.where(valid, jnp.clip(jnp.max(sy, axis=0), 0, height), 0)
    area2 = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (
        sy[1] - sy[0]
    ) * (sx[2] - sx[0])
    # Affine edge coefficients (see the field-constant comment above).
    dy01 = sy[1] - sy[0]
    dx01 = sx[1] - sx[0]
    a01, b01 = -dy01, dx01
    c01 = sx[0] * dy01 - sy[0] * dx01
    dy20 = sy[0] - sy[2]
    dx20 = sx[0] - sx[2]
    a20, b20 = -dy20, dx20
    c20 = sx[2] * dy20 - sy[2] * dx20
    # Fill-rule thresholds folded into the edge constants: the kernel's
    # cover test `e >= (top_left ? 0 : 1)` becomes `e' >= 0` with
    # c01 -= thr01, c20 -= thr20 and area2 -= (thr01 + thr12 + thr20)
    # (e12 is derived as area2 - e01 - e20, so its threshold must fold
    # into area2 along with the two it inherits from e01/e20). Exact in
    # wrapped-i32 arithmetic; saves the psf read + 3 threshold
    # computations per PAIR in the kernel's triangle loop. (Only a pixel
    # where some e == i32::MIN exactly could flip — garbage-coordinate
    # territory the bbox clamp already excludes in practice.)
    thr01 = 1 - tri.top_left[0].astype(jnp.int32)
    thr12 = 1 - tri.top_left[1].astype(jnp.int32)
    thr20 = 1 - tri.top_left[2].astype(jnp.int32)
    c01 = c01 - thr01
    c20 = c20 - thr20
    area2 = area2 - (thr01 + thr12 + thr20)
    # The top_left flags used to ride in bits 8-10 of this field; the
    # fill-rule fold above made them dead (every _PS read is & PS_MASK).
    ps_tl = tri.ps_index.astype(jnp.int32)
    cols_i = jnp.stack(
        [
            a01,
            b01,
            c01,
            a20,
            b20,
            c20,
            area2,
            tri.order,
            min_x | (min_y << 16),
            max_x | (max_y << 16),
            jnp.arange(m, dtype=jnp.int32),
            ps_tl,
        ],
        axis=0,
    )
    rows_f = [
        tri.spf[0, 0],
        tri.spf[0, 1],
        tri.spf[1, 0],
        tri.spf[1, 1],
        tri.spf[2, 0],
        tri.spf[2, 1],
        tri.rhw[0],
        tri.rhw[1],
        tri.rhw[2],
    ]
    n_ctx = tri.num_channels if with_ctx else 0
    cols_f = jnp.stack(rows_f, axis=0)
    if with_ctx and n_ctx:
        # ctx is already (3C, M) planar in the kernel's row order
        # (v0 ch0..C-1, v1 ..., v2 ...) — no per-channel slicing needed.
        cols_f = jnp.concatenate([cols_f, tri.ctx], axis=0)

    def pad_to(rows, nf, dtype):
        out = jnp.zeros((nf, m_pad), dtype)
        return out.at[: rows.shape[0], :m].set(rows.astype(dtype))

    return pad_to(cols_i, NF_I, jnp.int32), pad_to(cols_f, _nf_f(n_ctx), jnp.float32)


def compact_sort(tri_i32, tri_f32, tile: tuple[int, int], fw: int):
    """Sort triangle columns: valid first, spatially grouped by bbox tile.

    The per-pixel (rhw, order) lexicographic merge is associative and
    commutative over triangles, so any physical order is exact. Sorting (a)
    pushes invalid/empty slots to the tail — their chunks' bbox unions are
    empty and skip in O(1) — and (b) groups valid triangles by the tile of
    their bbox center, making each chunk's bbox union tile-local so the
    kernel's chunk-skip test rejects almost all (tile, chunk) pairs.
    """
    th, tw = tile
    minx, miny = _unpack_xy(tri_i32[_MINXY])
    maxx, maxy = _unpack_xy(tri_i32[_MAXXY])
    empty = (maxx <= minx) | (maxy <= miny)
    cty = ((miny + maxy) // 2) // th
    ctx_ = ((minx + maxx) // 2) // tw
    ntx = _cdiv(fw, tw)
    key = jnp.where(empty, jnp.int32(2**30), cty * ntx + ctx_)
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(key, iota, is_stable=True)
    return tri_i32[:, perm], tri_f32[:, perm]


def chunk_bounds(tri_i32, chunk: int):
    """Per-chunk bbox union over chunks of triangles → (5, nchunks) i32.

    Rows: min_x, max_x, min_y, max_y, any_valid. Invalid slots have empty
    bboxes so plain min/max unions are correct; any_valid = union nonempty.
    """
    m_pad = tri_i32.shape[1]
    nchunks = m_pad // chunk

    def r(col, half):
        x, y = _unpack_xy(tri_i32[col])
        return (x if half == 0 else y).reshape(nchunks, chunk)

    cminx = jnp.min(r(_MINXY, 0), axis=1)
    cmaxx = jnp.max(r(_MAXXY, 0), axis=1)
    cminy = jnp.min(r(_MINXY, 1), axis=1)
    cmaxy = jnp.max(r(_MAXXY, 1), axis=1)
    cany = ((cmaxx > cminx) & (cmaxy > cminy)).astype(jnp.int32)
    return jnp.stack([cminx, cmaxx, cminy, cmaxy, cany])


COARSE = 4  # coarse tile = COARSE×COARSE fine tiles (hierarchical binning)


def bin_pairs(
    tri_i32,
    tile: tuple[int, int],
    grid_hw: tuple[int, int],
    k: int,
    chunk: int,
    m_dummy: int,
    origin=(0, 0),
    kc: int = 6,
):
    """Hierarchical per-tile triangle lists via (tile, triangle) pair expansion.

    Three levels (each triangle lands in exactly one):

    - span ≤ ``k`` fine tiles → one exact pair per covered fine tile;
    - span ≤ ``kc`` *coarse* tiles (COARSE×COARSE fine tiles each) → one
      pair per covered coarse tile; the fine tiles inside gate per-triangle
      on a bbox test. This replaces the r1 every-tile spill scan for
      mid-size triangles (the stress4k 1M-tri killer: each of ~2k tiles
      paid a gate per spilled triangle);
    - larger → a shared spill bucket every tile scans (such triangles
      genuinely cover much of the screen, so gating them is cheap relative
      to their vector work).

    Pairs are sorted by key, giving contiguous ranges. Returns
    ``(pair_tri (Npad,) i32 — triangle ids, dummy ``m_dummy`` in padding,
    off (ntiles+ntilesc+2,) i32)`` where ``off[t]..off[t+1]`` is fine tile
    t's range, ``off[ntiles+c]..off[ntiles+c+1]`` coarse tile c's range and
    the final pair the spill range.

    The merge is idempotent (equal (rhw, order) re-encounters are rejected
    by the strict tiebreak), so boundary-chunk bleed between adjacent
    ranges is harmless.
    """
    th, tw = tile
    nty, ntx = grid_hw
    ntiles = nty * ntx
    ntyc = _cdiv(nty, COARSE)
    ntxc = _cdiv(ntx, COARSE)
    ntilesc = ntyc * ntxc
    big = jnp.int32(ntiles + ntilesc + 1)
    y_org, x_org = origin  # may be traced (sharded row slabs)
    bminx, bminy = _unpack_xy(tri_i32[_MINXY])
    bmaxx, bmaxy = _unpack_xy(tri_i32[_MAXXY])
    minx = jnp.clip(bminx - x_org, 0, ntx * tw)
    maxx = jnp.clip(bmaxx - x_org, 0, ntx * tw)
    miny = jnp.clip(bminy - y_org, 0, nty * th)
    maxy = jnp.clip(bmaxy - y_org, 0, nty * th)
    nonempty = (maxx > minx) & (maxy > miny)
    tx0 = minx // tw
    tx1 = jnp.maximum(maxx - 1, minx) // tw
    ty0 = miny // th
    ty1 = jnp.maximum(maxy - 1, miny) // th
    ncols = tx1 - tx0 + 1
    span = ncols * (ty1 - ty0 + 1)
    small = nonempty & (span <= k)
    # Coarse-level cover for the rest.
    ctx0, ctx1 = tx0 // COARSE, tx1 // COARSE
    cty0, cty1 = ty0 // COARSE, ty1 // COARSE
    ncolsc = ctx1 - ctx0 + 1
    cspan = ncolsc * (cty1 - cty0 + 1)
    mid = nonempty & ~small & (cspan <= kc)

    spill = nonempty & ~small & ~mid

    m = tri_i32.shape[1]
    tri_ids = jnp.arange(m, dtype=jnp.int32)
    # The three levels are mutually exclusive per triangle, so they share
    # the same max(k, kc) key slots (spill uses slot 0) — half the keys of
    # a per-level layout, halving the sort and the pair-order gathers.
    nk = max(k, kc)
    keys = []
    for j in range(nk):
        fine = ty0 + j // ncols, tx0 + j % ncols
        coarse = cty0 + j // ncolsc, ctx0 + j % ncolsc
        kj = jnp.where(
            small & (j < span) & (j < k),
            fine[0] * ntx + fine[1],
            jnp.where(
                mid & (j < cspan) & (j < kc),
                ntiles + coarse[0] * ntxc + coarse[1],
                jnp.where(spill & (j == 0), ntiles + ntilesc, big),
            ),
        )
        keys.append(kj)
    key = jnp.concatenate(keys)
    ptri = jnp.tile(tri_ids, nk)
    # sort_key_val is ~4.6x faster than argsort+gather on TPU at these
    # sizes (baselines/profile_sort.py: 1.1 ms vs 5.1 ms for 280k keys).
    # When (key, tri_id) fit in 31 bits together (they do up to ~2k tiles
    # × ~1M slots — the stress4k case), pack both into ONE i32 and sort a
    # single operand instead: each sort_key_val payload re-applies every
    # compare-stage permutation, so halving the operands cuts the sort
    # cost ~1/3. Exact: the merge is order-independent (associative,
    # idempotent), so the packed sort's tri-id tiebreak (vs sort_key_val's
    # positional stability) cannot change any pixel.
    nkeys_total = ntiles + ntilesc + 2
    id_bits = max((m - 1).bit_length(), 1)
    if nkeys_total.bit_length() + id_bits <= 31:
        packed = (key << id_bits) | ptri
        packed_s = jax.lax.sort(packed)
        key_s = packed_s >> id_bits
        ptri_s = packed_s & jnp.int32((1 << id_bits) - 1)
    else:
        key_s, ptri_s = jax.lax.sort_key_val(key, ptri, is_stable=True)
    off = jnp.searchsorted(
        key_s, jnp.arange(ntiles + ntilesc + 2, dtype=jnp.int32)
    ).astype(jnp.int32)
    n = ptri_s.shape[0]
    n_pad = _cdiv(n, chunk) * chunk
    ptri_s = jnp.concatenate(
        [ptri_s, jnp.full((n_pad - n,), m_dummy, jnp.int32)]
    )
    # Padding / invalid pairs point at the dummy (empty-bbox) slot.
    ptri_s = jnp.where(
        jnp.arange(n_pad) < off[ntiles + ntilesc + 1], ptri_s[:n_pad], m_dummy
    )
    return ptri_s, off


def bin_pairs_strip(
    tri_i32,
    tile: tuple[int, int],
    grid_hw: tuple[int, int],
    nk_s: int,
    chunk: int,
    m_dummy: int,
    origin=(0, 0),
    kc: int = 6,
):
    """Strip-interleaved per-tile pair lists for the fragment-level kernel.

    The whole-tile kernel pays ~th·tw/1024 vector registers of work per
    PAIR even though a typical stress-scene triangle covers ~16 pixels.
    This binning assigns each small triangle to the (8, tw) row-STRIPS its
    bbox covers (one pair per strip) and lays each tile's pair list out in
    GROUPS of S = th//8: position ``base + j·S + s`` holds the j-th pair of
    strip s (dummy-padded where strips are unbalanced). The kernel then
    processes S pairs per loop trip — pair s restricted to strip s — with
    1/S the vector work per pair and ONE carry merge per group (the S strip
    candidates cover disjoint rows). Exact: same cover/bary math per pixel,
    and the (rhw, order) merge is associative/idempotent over any pair
    order/duplication.

    Two regions in the returned pair array:

    - ``[0, B_fine)``: the strip-interleaved groups of BALANCED tiles
      (interleaved length S·Lmax ≤ 4/3 · pair count — the static bound
      that makes B_fine = ceil(4/3·nk·m) safe with no silent drops).
    - ``[B_fine, B_fine + nk·m)``: the plain (tile, strip)-sorted list.
      Imbalanced tiles' fine ranges point here (contiguous per tile) and
      run the kernel's ordinary per-pair loop; the coarse / spill sections
      also live here, as in :func:`bin_pairs`.

    Returns ``(ptri (B_fine + nk·m,) i32, off)`` where ``off`` has TWO
    entries per fine tile — ``off[2t] / off[2t+1]`` = start / end, regions
    distinguished by ``start >= B_fine`` — followed by the shared-boundary
    coarse offsets and the spill range:
    ``off[2·ntiles + c]..off[2·ntiles + c + 1]`` and the final pair.
    Balanced-tile group alignment: starts/lengths are multiples of S and
    S divides chunk, so no group straddles a chunk boundary.
    """
    th, tw = tile
    assert th % 8 == 0 and chunk % (th // 8) == 0, (th, chunk)
    S = th // 8
    nty, ntx = grid_hw
    ntiles = nty * ntx
    nstrips = ntiles * S
    ntyc = _cdiv(nty, COARSE)
    ntxc = _cdiv(ntx, COARSE)
    ntilesc = ntyc * ntxc
    big = jnp.int32(nstrips + ntilesc + 1)
    y_org, x_org = origin
    bminx, bminy = _unpack_xy(tri_i32[_MINXY])
    bmaxx, bmaxy = _unpack_xy(tri_i32[_MAXXY])
    minx = jnp.clip(bminx - x_org, 0, ntx * tw)
    maxx = jnp.clip(bmaxx - x_org, 0, ntx * tw)
    miny = jnp.clip(bminy - y_org, 0, nty * th)
    maxy = jnp.clip(bmaxy - y_org, 0, nty * th)
    nonempty = (maxx > minx) & (maxy > miny)
    tx0 = minx // tw
    tx1 = jnp.maximum(maxx - 1, minx) // tw
    gs0 = miny // 8
    gs1 = jnp.maximum(maxy - 1, miny) // 8
    ncols = tx1 - tx0 + 1
    nsrows = gs1 - gs0 + 1
    sp = ncols * nsrows
    small = nonempty & (sp <= nk_s)
    ty0 = miny // th
    ty1 = jnp.maximum(maxy - 1, miny) // th
    ctx0, ctx1 = tx0 // COARSE, tx1 // COARSE
    cty0, cty1 = ty0 // COARSE, ty1 // COARSE
    ncolsc = ctx1 - ctx0 + 1
    cspan = ncolsc * (cty1 - cty0 + 1)
    mid = nonempty & ~small & (cspan <= kc)
    spill = nonempty & ~small & ~mid

    m = tri_i32.shape[1]
    tri_ids = jnp.arange(m, dtype=jnp.int32)
    nk = max(nk_s, kc)
    keys = []
    for j in range(nk):
        gs = gs0 + j // ncols
        col = tx0 + j % ncols
        sty = gs // S
        skey = (sty * ntx + col) * S + (gs - sty * S)
        coarse = cty0 + j // ncolsc, ctx0 + j % ncolsc
        kj = jnp.where(
            small & (j < sp) & (j < nk_s),
            skey,
            jnp.where(
                mid & (j < cspan) & (j < kc),
                nstrips + coarse[0] * ntxc + coarse[1],
                jnp.where(spill & (j == 0), nstrips + ntilesc, big),
            ),
        )
        keys.append(kj)
    key = jnp.concatenate(keys)
    ptri = jnp.tile(tri_ids, nk)
    nkeys_total = nstrips + ntilesc + 2
    id_bits = max((m - 1).bit_length(), 1)
    if nkeys_total.bit_length() + id_bits <= 31:
        packed_s = jax.lax.sort((key << id_bits) | ptri)
        key_s = packed_s >> id_bits
        ptri_s = packed_s & jnp.int32((1 << id_bits) - 1)
    else:
        # The strip keyspace adds log2(S) bits over bin_pairs, so the
        # packed single-operand sort usually does not fit 31 bits at
        # 1M-slot scenes — pay the two-operand sort (~1.5x).
        key_s, ptri_s = jax.lax.sort_key_val(key, ptri, is_stable=True)

    n = nk * m
    bnd = jnp.searchsorted(
        key_s, jnp.arange(nstrips + ntilesc + 2, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = (bnd[1 : nstrips + 1] - bnd[:nstrips]).reshape(ntiles, S)
    l_max = counts.max(axis=1)
    count_tile = counts.sum(axis=1)
    inter_len = S * l_max
    # 4/3 balance bound: tiles whose interleave padding exceeds it keep the
    # plain list (region 2) — this is what makes B_fine a STATIC safe bound
    # (sum of accepted interleaved lengths <= 4/3 * total fine pairs).
    balanced = inter_len * 3 <= count_tile * 4
    fine_len = jnp.where(balanced, inter_len, 0)
    tile_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(fine_len, dtype=jnp.int32)]
    )
    b_fine = _cdiv(_cdiv(4 * n, 3) + 1, chunk) * chunk

    pos = jnp.arange(b_fine, dtype=jnp.int32)
    t_of = jnp.clip(
        jnp.searchsorted(tile_base, pos, side="right").astype(jnp.int32) - 1,
        0,
        ntiles - 1,
    )
    rel = pos - tile_base[t_of]
    jj = rel // S
    ss = rel - jj * S
    sidx = t_of * S + ss
    src = bnd[sidx] + jj
    valid = (pos < tile_base[ntiles]) & (src < bnd[sidx + 1])
    out_fine = jnp.where(valid, ptri_s[jnp.clip(src, 0, n - 1)], m_dummy)

    spill_end = bnd[nstrips + ntilesc + 1]
    out_sorted = jnp.where(
        jnp.arange(n, dtype=jnp.int32) < spill_end, ptri_s, m_dummy
    )
    ptri_out = jnp.concatenate([out_fine, out_sorted])

    t_idx = jnp.arange(ntiles, dtype=jnp.int32)
    plain_start = b_fine + bnd[t_idx * S]
    plain_end = b_fine + bnd[t_idx * S + S]
    fine_start = jnp.where(balanced, tile_base[:ntiles], plain_start)
    fine_end = jnp.where(balanced, tile_base[1:], plain_end)
    coarse_off = b_fine + bnd[nstrips:]
    off = jnp.concatenate(
        [
            jnp.stack([fine_start, fine_end], axis=1).reshape(-1),
            coarse_off,
        ]
    )
    return ptri_out, off, b_fine


def bin_direct(tri_i32, tile: tuple[int, int], grid_hw: tuple[int, int],
               origin=(0, 0)):
    """Single-copy per-slot binning (no pair expansion) → (perm, off).

    Each triangle is assigned to exactly ONE bucket: its fine tile if its
    clamped bbox spans one fine tile (69% of the 1M-tri stress scene at
    64-row tiles, baselines/profile_prep.py), else its coarse tile if it
    spans one COARSE×COARSE coarse tile, else the shared spill bucket
    (scanned by every tile, bbox-gated + chunk-skipped). Compared to
    :func:`bin_pairs` this sorts m keys instead of nk·m and the pair-order
    gather becomes a PERMUTATION of m slots instead of nk·m pairs —
    halving the two dominant stress4k prep costs at nk=2 — in exchange
    for multi-fine-span triangles running through the per-triangle-gated
    coarse/spill paths instead of exact fine lists.

    The returned ``off`` table has the same (ntiles+ntilesc+2,) layout as
    bin_pairs, so the kernel is unchanged: own ranges stay exact/ungated
    (a span-1 triangle covers only its fine tile by construction).
    """
    th, tw = tile
    nty, ntx = grid_hw
    ntiles = nty * ntx
    ntyc = _cdiv(nty, COARSE)
    ntxc = _cdiv(ntx, COARSE)
    ntilesc = ntyc * ntxc
    big = jnp.int32(ntiles + ntilesc + 1)
    y_org, x_org = origin
    bminx, bminy = _unpack_xy(tri_i32[_MINXY])
    bmaxx, bmaxy = _unpack_xy(tri_i32[_MAXXY])
    minx = jnp.clip(bminx - x_org, 0, ntx * tw)
    maxx = jnp.clip(bmaxx - x_org, 0, ntx * tw)
    miny = jnp.clip(bminy - y_org, 0, nty * th)
    maxy = jnp.clip(bmaxy - y_org, 0, nty * th)
    nonempty = (maxx > minx) & (maxy > miny)
    tx0 = minx // tw
    tx1 = jnp.maximum(maxx - 1, minx) // tw
    ty0 = miny // th
    ty1 = jnp.maximum(maxy - 1, miny) // th
    fine = nonempty & (tx1 == tx0) & (ty1 == ty0)
    ctx0, cty0 = tx0 // COARSE, ty0 // COARSE
    ctx1, cty1 = tx1 // COARSE, ty1 // COARSE
    midc = nonempty & ~fine & (ctx0 == ctx1) & (cty0 == cty1)
    key = jnp.where(
        fine,
        ty0 * ntx + tx0,
        jnp.where(
            midc,
            ntiles + cty0 * ntxc + ctx0,
            jnp.where(nonempty, ntiles + ntilesc, big),
        ),
    )
    m = tri_i32.shape[1]
    slots = jnp.arange(m, dtype=jnp.int32)
    nkeys_total = ntiles + ntilesc + 2
    id_bits = max((m - 1).bit_length(), 1)
    if nkeys_total.bit_length() + id_bits <= 31:
        packed_s = jax.lax.sort((key << id_bits) | slots)
        key_s = packed_s >> id_bits
        perm = packed_s & jnp.int32((1 << id_bits) - 1)
    else:
        key_s, perm = jax.lax.sort_key_val(key, slots, is_stable=True)
    off = jnp.searchsorted(
        key_s, jnp.arange(ntiles + ntilesc + 2, dtype=jnp.int32)
    ).astype(jnp.int32)
    return perm, off


# Deferred mode: per-pair scalar reads only touch the spf/rhw rows (0..8),
# but HBM DMA source slices must be sublane-aligned → copy 16 rows.
NF_SMEM_F = 16


def _make_kernel(
    *, th: int, tw: int, chunk: int, id_base: int, n_ctx: int, epilogue=None,
    binned: bool = False, deferred: bool = False, cross_prefetch: bool = False,
    bg_empty: int = 0, unroll: int = 1, strip: bool = False, b_fine: int = 0,
):
    """Build the raster kernel body.

    n_ctx=0 → winner/depth only; n_ctx>0 → additionally carries interpolated
    varying planes. With ``epilogue`` (fused shading, pipeline/fused.py) the
    trailing refs are (uni, dims, tex, rgba_out, depth_out, winner_out) and
    the epilogue consumes the final carries instead of the default stores.

    ``deferred`` (binned, n_ctx>0, chunk==tw==128 only): the triangle loop
    carries just (depth, worder, wpair) — wpair is the global pair index of
    the currently-winning pair — and at the END of each resident chunk a
    vectorized pass lane-gathers the winning pair's fields
    (``jnp.take_along_axis``, the texture-sampler technique), recomputes its
    barycentrics bit-exactly from the same spf inputs, and interpolates the
    C varying channels ONCE per pixel instead of per pair
    (renderer.rs:368-378). This removes ~3C+2 SMEM scalar reads and ~5C+4
    vector ops per *pair* for ~35 gathers + ~60 ops per *chunk* (amortized
    <1 op/pair at chunk=128). Chunk tables are DMA'd to SMEM (per-pair
    scalar reads) AND VMEM (the lane gathers) — VMEM cannot be scalar-
    indexed per pair, SMEM cannot be lane-gathered.

    ``cross_prefetch`` (binned): each program starts the NEXT tile's first
    chunk DMA before running its epilogue (scratch + semaphores persist
    across sequential grid programs), hiding the first-chunk DMA wait.
    Binned mode also skips all per-tile work (including the sampler
    epilogue's cross-lane range reductions) on tiles with no pairs at all.
    """
    if deferred:
        assert binned and n_ctx and chunk == tw, (binned, n_ctx, chunk, tw)
    if strip:
        # Strip-interleaved fine lists (bin_pairs_strip): deferred only,
        # group size S = th//8 must divide the chunk.
        assert deferred and th % 8 == 0 and chunk % (th // 8) == 0

    def kernel(cb_ref, origin_ref, tri_i_ref, tri_f_ref, *rest):
        wi_ref = wf_ref = sem_wi = sem_wf = None
        if epilogue is not None:
            if deferred:
                (uni_ref, dims_ref, tex_ref, rgba_ref, depth_ref, winner_ref,
                 vi_ref, vf_ref, wi_ref, wf_ref,
                 sem_i, sem_f, sem_wi, sem_wf) = rest
            else:
                (uni_ref, dims_ref, tex_ref, rgba_ref, depth_ref, winner_ref,
                 vi_ref, vf_ref, sem_i, sem_f) = rest
        elif n_ctx:
            if deferred:
                (depth_ref, worder_ref, winner_ref, ps_ref, ctx_ref,
                 vi_ref, vf_ref, wi_ref, wf_ref,
                 sem_i, sem_f, sem_wi, sem_wf) = rest
            else:
                (depth_ref, worder_ref, winner_ref, ps_ref, ctx_ref,
                 vi_ref, vf_ref, sem_i, sem_f) = rest
        else:
            (depth_ref, worder_ref, winner_ref,
             vi_ref, vf_ref, sem_i, sem_f) = rest

        ty = pl.program_id(0)
        tx = pl.program_id(1)
        oy = origin_ref[0] + ty * th
        ox = origin_ref[1] + tx * tw

        cy = oy + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        cx = ox + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        pcx = cx.astype(jnp.float32) + 0.5
        pcy = cy.astype(jnp.float32) + 0.5

        def make_tri_body(read_i, read_f, gated=None, pair_base=None):
            ungated = not binned if gated is None else not gated

            def tri_body(t, carry):
                # One packed SMEM read + 2 scalar ALU ops for both bounds.
                maxx, maxy = _unpack_xy(read_i(_MAXXY, t))
                if ungated:
                    # Exact per-tile lists: every pair in range belongs here
                    # (boundary bleed is masked by the cover tests); a scalar
                    # cond would cost more than it saves — its carry is ~12
                    # vector registers copied per skipped triangle (and the
                    # r3 per-strip-cond experiment measured 417 vs 372 ms on
                    # stress4k: per-pair scalar branches are not cheap).
                    return _tri_vector_work(t, maxx, maxy, carry)
                # Chunk-scan mode: most triangles in a DMA'd chunk miss this
                # tile; skipping their vector work (~60 VPU ops on the whole
                # tile) behind one scalar test is the main throughput lever.
                minx, miny = _unpack_xy(read_i(_MINXY, t))
                hit = (
                    (minx < ox + tw) & (maxx > ox) & (miny < oy + th) & (maxy > oy)
                )
                return jax.lax.cond(
                    hit,
                    lambda c: _tri_vector_work(t, maxx, maxy, c),
                    lambda c: c,
                    carry,
                )

            def _tri_vector_work(t, maxx, maxy, carry):
                if deferred:
                    depth, worder, wpair = carry
                elif n_ctx:
                    depth, worder, winner, ps, ctx = carry
                else:
                    depth, worder, winner = carry

                def i32f(col):
                    return read_i(col, t)

                def f32f(col):
                    return read_f(col, t)

                a01, b01, c01 = i32f(_A01), i32f(_B01), i32f(_C01)
                a20, b20, c20 = i32f(_A20), i32f(_B20), i32f(_C20)
                if _DEBUG_PAIR_BODY == "floor" and deferred:
                    si = (
                        a01 + b01 + c01 + a20 + b20 + c20
                        + i32f(_AREA2) + i32f(_ORDER) + i32f(_PS)
                    )
                    sf = (
                        f32f(_S0X) + f32f(_S0Y) + f32f(_S1X) + f32f(_S1Y)
                        + f32f(_S2X) + f32f(_S2Y)
                        + f32f(_RHW0) + f32f(_RHW1) + f32f(_RHW2)
                    )
                    bump = sf * 1e-38 + si.astype(jnp.float32) * 1e-38 - 3e38
                    return jnp.maximum(depth, bump), worder, wpair
                e01 = a01 * cx + b01 * cy + c01
                e20 = a20 * cx + b20 * cy + c20
                # e01+e12+e20 = 2·area — exact under i32 wrap, so e12 costs
                # 2 vector ops instead of 4.
                e12 = i32f(_AREA2) - e01 - e20
                # Fill-rule thresholds are pre-folded into c01/c20/area2
                # (pack_setup), so all three tests are against zero. Only
                # the EXCLUSIVE bbox max (renderer.rs:322-324) needs
                # explicit tests: a pixel passing all three edge tests lies
                # in the hull of the rounded spi, so cx >= minx and
                # cy >= miny (and the screen clamp) are implied.
                if _COVER_FORM == "or":
                    # One compare on the sign-bit OR (see _COVER_FORM).
                    cover = (
                        e01 | e12 | e20 | (maxx - 1 - cx) | (maxy - 1 - cy)
                    ) >= 0
                else:
                    cover = (
                        (e01 >= 0)
                        & (e12 >= 0)
                        & (e20 >= 0)
                        & (cx < maxx)
                        & (cy < maxy)
                    )
                if _DEBUG_PAIR_BODY == "cover" and deferred:
                    sf = (
                        f32f(_S0X) + f32f(_S0Y) + f32f(_S1X) + f32f(_S1Y)
                        + f32f(_S2X) + f32f(_S2Y)
                        + f32f(_RHW0) + f32f(_RHW1) + f32f(_RHW2)
                    )
                    depth = jnp.maximum(
                        depth, jnp.where(cover, sf * 1e-38 - 3e38, -3e38)
                    )
                    worder = jnp.where(
                        cover,
                        jnp.maximum(worder, i32f(_ORDER) - 2**30),
                        worder,
                    )
                    return depth, worder, wpair

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
                la = a * inv_s
                lb = b * inv_s
                lc = c * inv_s
                rhw0, rhw1, rhw2 = f32f(_RHW0), f32f(_RHW1), f32f(_RHW2)
                rhw = rhw0 * la + rhw1 * lb + rhw2 * lc

                o = i32f(_ORDER)
                accept = cover & ((rhw > depth) | ((rhw >= depth) & (o > worder)))
                depth = jnp.where(accept, rhw, depth)
                worder = jnp.where(accept, o, worder)
                if deferred:
                    # Only record WHICH pair won; fields/varyings are
                    # lane-gathered once per chunk in _deferred_update.
                    wpair = jnp.where(accept, pair_base + t, wpair)
                    return depth, worder, wpair
                winner = jnp.where(accept, id_base + i32f(_SLOT), winner)
                if not n_ctx:
                    return depth, worder, winner

                # Perspective-correct varying interpolation
                # (renderer.rs:368-378) for the currently-winning triangle;
                # overwritten on later accepts.
                w_corr = 1.0 / jnp.where(rhw != 0.0, rhw, 1.0)
                c0 = rhw0 * la * w_corr
                c1 = rhw1 * lb * w_corr
                c2 = rhw2 * lc * w_corr
                new_ctx = [
                    f32f(_CTX0 + ch) * c0
                    + f32f(_CTX0 + n_ctx + ch) * c1
                    + f32f(_CTX0 + 2 * n_ctx + ch) * c2
                    for ch in range(n_ctx)
                ]
                ctx = [
                    jnp.where(accept, new_ctx[ch], ctx[ch]) for ch in range(n_ctx)
                ]
                ps = jnp.where(accept, i32f(_PS) & PS_MASK, ps)
                return depth, worder, winner, ps, ctx

            return tri_body

        def make_pair_cand(read_i, read_f, pair_base):
            """Carry-independent pair front-end for _MERGE_FORM == "tree".

            Returns (rhw', order', pair_id) with non-covered pixels masked
            to the background key (0.0, ORDER_NONE). The math is op-for-op
            _tri_vector_work's deferred path (same reads, same expression
            shapes — bit-identical rhw), minus the carry-dependent
            accept/select tail; the exact-winner oracle tests pin the two
            bodies together.
            """

            def cand(t):
                maxx, maxy = _unpack_xy(read_i(_MAXXY, t))
                a01, b01, c01 = (
                    read_i(_A01, t), read_i(_B01, t), read_i(_C01, t)
                )
                a20, b20, c20 = (
                    read_i(_A20, t), read_i(_B20, t), read_i(_C20, t)
                )
                e01 = a01 * cx + b01 * cy + c01
                e20 = a20 * cx + b20 * cy + c20
                e12 = read_i(_AREA2, t) - e01 - e20
                if _COVER_FORM == "or":
                    cover = (
                        e01 | e12 | e20 | (maxx - 1 - cx) | (maxy - 1 - cy)
                    ) >= 0
                else:
                    cover = (
                        (e01 >= 0)
                        & (e12 >= 0)
                        & (e20 >= 0)
                        & (cx < maxx)
                        & (cy < maxy)
                    )
                s0x = read_f(_S0X, t) - pcx
                s0y = read_f(_S0Y, t) - pcy
                s1x = read_f(_S1X, t) - pcx
                s1y = read_f(_S1Y, t) - pcy
                s2x = read_f(_S2X, t) - pcx
                s2y = read_f(_S2Y, t) - pcy
                a = jnp.abs(s1x * s2y - s1y * s2x)
                b = jnp.abs(s2x * s0y - s2y * s0x)
                c = jnp.abs(s0x * s1y - s0y * s1x)
                s = a + b + c
                cover = cover & (s != 0.0)
                inv_s = 1.0 / s
                la = a * inv_s
                lb = b * inv_s
                lc = c * inv_s
                rhw = (
                    read_f(_RHW0, t) * la
                    + read_f(_RHW1, t) * lb
                    + read_f(_RHW2, t) * lc
                )
                key = jnp.where(cover, rhw, 0.0)
                o = jnp.where(cover, read_i(_ORDER, t), ORDER_NONE)
                return key, o, pair_base + t

            return cand

        def make_strip_cand(read_i, read_f, pair_base):
            """(8, tw)-strip front-end: op-for-op ``make_pair_cand`` with
            every plane restricted to row-strip ``s`` (rows 8s..8s+7 of the
            tile). Used by the strip-decomposition path: a group of S
            strip-candidates covers the tile with DISJOINT rows, so the
            concatenated group plane folds into the carry with ONE merge."""

            # (8, tw) coordinate planes built from fresh iotas — slicing the
            # (th, tw) tile planes (cx[8s:8s+8]) lowers to
            # vector_extract_strided_slice, which crashes Mosaic's
            # ApplyVectorLayout on v5e (measured: `Check failed:
            # limits[i] <= dim(i)`); a row-iota plus the per-strip scalar
            # offset is also cheaper. pcy8 adds 8.0·s to the f32 plane —
            # exact (integer-valued f32 well under 2^24).
            cx8_ = ox + jax.lax.broadcasted_iota(jnp.int32, (8, tw), 1)
            cy8_ = oy + jax.lax.broadcasted_iota(jnp.int32, (8, tw), 0)
            pcx8_ = cx8_.astype(jnp.float32) + 0.5
            pcy8_ = cy8_.astype(jnp.float32) + 0.5

            def cand(t, s):
                cx8 = cx8_
                cy8 = cy8_ + 8 * s
                pcx8 = pcx8_
                pcy8 = pcy8_ + jnp.float32(8.0 * s)
                maxx, maxy = _unpack_xy(read_i(_MAXXY, t))
                a01, b01, c01 = (
                    read_i(_A01, t), read_i(_B01, t), read_i(_C01, t)
                )
                a20, b20, c20 = (
                    read_i(_A20, t), read_i(_B20, t), read_i(_C20, t)
                )
                e01 = a01 * cx8 + b01 * cy8 + c01
                e20 = a20 * cx8 + b20 * cy8 + c20
                e12 = read_i(_AREA2, t) - e01 - e20
                if _COVER_FORM == "or":
                    cover = (
                        e01 | e12 | e20 | (maxx - 1 - cx8) | (maxy - 1 - cy8)
                    ) >= 0
                else:
                    cover = (
                        (e01 >= 0)
                        & (e12 >= 0)
                        & (e20 >= 0)
                        & (cx8 < maxx)
                        & (cy8 < maxy)
                    )
                s0x = read_f(_S0X, t) - pcx8
                s0y = read_f(_S0Y, t) - pcy8
                s1x = read_f(_S1X, t) - pcx8
                s1y = read_f(_S1Y, t) - pcy8
                s2x = read_f(_S2X, t) - pcx8
                s2y = read_f(_S2Y, t) - pcy8
                a = jnp.abs(s1x * s2y - s1y * s2x)
                b = jnp.abs(s2x * s0y - s2y * s0x)
                c = jnp.abs(s0x * s1y - s0y * s1x)
                ssum = a + b + c
                cover = cover & (ssum != 0.0)
                inv_s = 1.0 / ssum
                la = a * inv_s
                lb = b * inv_s
                lc = c * inv_s
                rhw = (
                    read_f(_RHW0, t) * la
                    + read_f(_RHW1, t) * lb
                    + read_f(_RHW2, t) * lc
                )
                key = jnp.where(cover, rhw, 0.0)
                o = jnp.where(cover, read_i(_ORDER, t), ORDER_NONE)
                w = jnp.full((8, tw), pair_base + t, jnp.int32)
                return key, o, w

            return cand

        if binned:
            # Spill triangles (span > k tiles) are scanned by every tile —
            # gate their vector work per-triangle; own-range pairs are exact.
            _make_slot_tri_body = lambda slot, gated=False, pair_base=None: (
                make_tri_body(
                    lambda col, t: vi_ref[slot, col, t],
                    lambda col, t: vf_ref[slot, col, t],
                    gated=gated,
                    pair_base=pair_base,
                )
            )
            _make_slot_cand = lambda slot, pair_base: make_pair_cand(
                lambda col, t: vi_ref[slot, col, t],
                lambda col, t: vf_ref[slot, col, t],
                pair_base,
            )
            _make_slot_strip_cand = lambda slot, pair_base: make_strip_cand(
                lambda col, t: vi_ref[slot, col, t],
                lambda col, t: vf_ref[slot, col, t],
                pair_base,
            )
        else:
            tri_body = make_tri_body(
                lambda col, t: vi_ref[col, t], lambda col, t: vf_ref[col, t]
            )

        def do_chunk(ci, cr):
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
            return jax.lax.fori_loop(0, chunk, tri_body, cr)

        def chunk_body(ci, carry):
            chit = (
                (cb_ref[4, ci] != 0)
                & (cb_ref[0, ci] < ox + tw)
                & (cb_ref[1, ci] > ox)
                & (cb_ref[2, ci] < oy + th)
                & (cb_ref[3, ci] > oy)
            )
            return jax.lax.cond(
                chit, lambda cr: do_chunk(ci, cr), lambda cr: cr, carry
            )

        zero = jnp.zeros((th, tw), jnp.float32)
        if deferred:
            init = (
                zero,
                jnp.full((th, tw), ORDER_NONE, jnp.int32),
                jnp.full((th, tw), -1, jnp.int32),  # wpair
                jnp.full((th, tw), -1, jnp.int32),  # winner
                jnp.zeros((th, tw), jnp.int32),  # ps
                [zero] * n_ctx,
            )
        elif n_ctx:
            init = (
                zero,
                jnp.full((th, tw), ORDER_NONE, jnp.int32),
                jnp.full((th, tw), -1, jnp.int32),
                jnp.zeros((th, tw), jnp.int32),
                [zero] * n_ctx,
            )
        else:
            init = (
                zero,
                jnp.full((th, tw), ORDER_NONE, jnp.int32),
                jnp.full((th, tw), -1, jnp.int32),
            )

        def _deferred_update(slot, pair_base, depth, wpair, winner, ps, ctx):
            """Interpolate varyings for pixels whose winning pair is in the
            resident chunk (renderer.rs:368-378, bit-exact: barycentrics are
            recomputed from the same spf field values and tile pixel centers
            that produced the accept in the triangle loop)."""
            off = wpair - pair_base
            mask = (off >= 0) & (off < chunk)
            lane = jnp.clip(off, 0, chunk - 1)

            def gf(row):
                trow = jnp.broadcast_to(
                    wf_ref[slot, pl.ds(row, 1), :], (th, tw)
                )
                return jnp.take_along_axis(trow, lane, axis=1)

            def gi(row):
                trow = jnp.broadcast_to(
                    wi_ref[slot, pl.ds(row, 1), :], (th, tw)
                )
                return jnp.take_along_axis(trow, lane, axis=1)

            s0x = gf(_S0X) - pcx
            s0y = gf(_S0Y) - pcy
            s1x = gf(_S1X) - pcx
            s1y = gf(_S1Y) - pcy
            s2x = gf(_S2X) - pcx
            s2y = gf(_S2Y) - pcy
            a = jnp.abs(s1x * s2y - s1y * s2x)
            b = jnp.abs(s2x * s0y - s2y * s0x)
            c = jnp.abs(s0x * s1y - s0y * s1x)
            inv_s = 1.0 / (a + b + c)
            w_corr = 1.0 / jnp.where(depth != 0.0, depth, 1.0)
            c0 = gf(_RHW0) * (a * inv_s) * w_corr
            c1 = gf(_RHW1) * (b * inv_s) * w_corr
            c2 = gf(_RHW2) * (c * inv_s) * w_corr
            ctx = [
                jnp.where(
                    mask,
                    gf(_CTX0 + ch) * c0
                    + gf(_CTX0 + n_ctx + ch) * c1
                    + gf(_CTX0 + 2 * n_ctx + ch) * c2,
                    ctx[ch],
                )
                for ch in range(n_ctx)
            ]
            winner = jnp.where(mask, id_base + gi(_SLOT - 8), winner)
            ps = jnp.where(mask, gi(_PS - 8) & PS_MASK, ps)
            return winner, ps, ctx

        if binned:
            # cb_ref is the pair-offset table (bin_pairs): own exact fine
            # range (ungated), then this tile's coarse-bin range and the
            # shared spill range (both bbox-gated per triangle).
            # Chunk DMAs are double-buffered (start i+1 while processing i)
            # so the ~µs HBM latency hides behind the triangle vector work.
            nty_g = pl.num_programs(0)
            ntx_g = pl.num_programs(1)
            ntiles = nty_g * ntx_g
            ntxc = _cdiv(ntx_g, COARSE)
            ntilesc = _cdiv(nty_g, COARSE) * ntxc
            t_lin = ty * ntx_g + tx
            # Strip mode: TWO off entries per fine tile (start, end — the
            # regions make shared boundaries impossible, bin_pairs_strip
            # docstring); coarse/spill sections shift accordingly.
            base_c = 2 * ntiles if strip else ntiles
            c_lin = base_c + (ty // COARSE) * ntxc + (tx // COARSE)
            if strip:
                start = cb_ref[2 * t_lin]
                end = cb_ref[2 * t_lin + 1]
            else:
                start = cb_ref[t_lin]
                end = cb_ref[t_lin + 1]
            c_start = cb_ref[c_lin]
            c_end = cb_ref[c_lin + 1]
            s_start = cb_ref[base_c + ntilesc]
            s_end = cb_ref[base_c + ntilesc + 1]
            c0 = start // chunk
            n_own = (end + chunk - 1) // chunk - c0
            cc0 = c_start // chunk
            n_coarse = (c_end + chunk - 1) // chunk - cc0
            s0 = s_start // chunk
            n_spill = (s_end + chunk - 1) // chunk - s0
            n_tot = n_own + n_coarse + n_spill

            def chunk_of(i):
                return jnp.where(
                    i < n_own,
                    c0 + i,
                    jnp.where(
                        i < n_own + n_coarse,
                        cc0 + (i - n_own),
                        s0 + (i - n_own - n_coarse),
                    ),
                )

            def dmas(slot, ci):
                out = [
                    pltpu.make_async_copy(
                        tri_i_ref.at[:, pl.ds(ci * chunk, chunk)],
                        vi_ref.at[slot],
                        sem_i.at[slot],
                    )
                ]
                if deferred:
                    # SMEM gets only the per-pair scalar rows; the full f32
                    # block (ctx rows included) and the slot/ps i32 rows go
                    # to VMEM for the chunk-deferred lane gathers.
                    out.append(
                        pltpu.make_async_copy(
                            tri_f_ref.at[:NF_SMEM_F, pl.ds(ci * chunk, chunk)],
                            vf_ref.at[slot],
                            sem_f.at[slot],
                        )
                    )
                    out.append(
                        pltpu.make_async_copy(
                            # rows 8..16 (sublane-aligned slice; only the
                            # _SLOT/_PS rows are gathered)
                            tri_i_ref.at[8:NF_I, pl.ds(ci * chunk, chunk)],
                            wi_ref.at[slot],
                            sem_wi.at[slot],
                        )
                    )
                    out.append(
                        pltpu.make_async_copy(
                            tri_f_ref.at[:, pl.ds(ci * chunk, chunk)],
                            wf_ref.at[slot],
                            sem_wf.at[slot],
                        )
                    )
                else:
                    out.append(
                        pltpu.make_async_copy(
                            tri_f_ref.at[:, pl.ds(ci * chunk, chunk)],
                            vf_ref.at[slot],
                            sem_f.at[slot],
                        )
                    )
                return out

            def start_dma_at(slot, ci):
                for d in dmas(slot, ci):
                    d.start()

            def start_dma(i):
                start_dma_at(jax.lax.rem(i, 2), chunk_of(i))

            if cross_prefetch:
                # Programs run sequentially on the core; program p's first
                # chunk was started by program p-1's epilogue-time prefetch
                # (scratch + semaphores persist across grid programs), so
                # only the very first program self-starts.
                @pl.when((t_lin == 0) & (n_tot > 0))
                def _():
                    start_dma(0)
            else:
                @pl.when(n_tot > 0)
                def _():
                    start_dma(0)

            def pipelined_chunk(i, cr):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_tot)
                def _():
                    start_dma(i + 1)

                ci = chunk_of(i)
                for d in dmas(slot, ci):
                    d.wait()
                is_own = i < n_own
                is_coarse = ~is_own & (i < n_own + n_coarse)
                r_start = jnp.where(
                    is_own, start, jnp.where(is_coarse, c_start, s_start)
                )
                r_end = jnp.where(
                    is_own, end, jnp.where(is_coarse, c_end, s_end)
                )
                lo = jnp.maximum(r_start - ci * chunk, 0)
                hi = jnp.minimum(r_end - ci * chunk, chunk)
                pair_base = ci * chunk
                if deferred:
                    core, aux = cr[:3], cr[3:]
                else:
                    core, aux = cr, None
                own_body = _make_slot_tri_body(
                    slot, gated=False, pair_base=pair_base
                )
                use_tree = (
                    unroll > 1
                    and deferred
                    and _MERGE_FORM == "tree"
                    and _DEBUG_PAIR_BODY is None
                )
                use_strip_probe = (
                    _STRIP_PROBE and deferred and th % 8 == 0
                )
                if use_strip_probe:
                    # TIMING-ONLY (_STRIP_PROBE docstring): garbage output.
                    own_cand_s = _make_slot_strip_cand(slot, pair_base)
                    S = th // 8

                    def own_loop(c):
                        n_g = (hi - lo + S - 1) // S

                        def body(j, cc):
                            t0 = lo + j * S
                            ks, os_, ws = [], [], []
                            for s in range(S):
                                k_, o_, w_ = own_cand_s(
                                    jnp.minimum(t0 + s, hi - 1), s
                                )
                                ks.append(k_)
                                os_.append(o_)
                                ws.append(w_)
                            cand = (
                                jnp.concatenate(ks, 0),
                                jnp.concatenate(os_, 0),
                                jnp.concatenate(ws, 0),
                            )
                            return _merge_pair_cand(cc, cand)

                        return jax.lax.fori_loop(0, n_g, body, c)
                elif use_tree:
                    # Tree-merged unrolled own-range loop (_MERGE_FORM
                    # docstring): per-group candidates are computed with no
                    # carry dependence, tree-reduced, and folded once into
                    # (depth, worder, wpair). Same clamped-tail idempotence
                    # as the seq unroll below.
                    own_cand = _make_slot_cand(slot, pair_base)

                    def own_loop(c):
                        n_u = (hi - lo + (unroll - 1)) // unroll

                        def body(j, cc):
                            t = lo + j * unroll
                            cands = [
                                own_cand(jnp.minimum(t + u, hi - 1))
                                for u in range(unroll)
                            ]
                            return _merge_pair_cand(
                                cc, _tree_merge_cands(cands)
                            )

                        return jax.lax.fori_loop(0, n_u, body, c)
                elif unroll > 1:
                    # Unrolled own-range loop: `unroll` pairs per iteration
                    # with NO tail masking — out-of-range steps clamp to the
                    # last pair and reprocess it, which the idempotent
                    # (rhw, order) merge rejects exactly (equal keys fail
                    # the strict tiebreak). Gives Mosaic's scheduler more
                    # independent scalar reads per loop iteration.
                    def own_loop(c):
                        n_u = (hi - lo + (unroll - 1)) // unroll

                        def body(j, cc):
                            t = lo + j * unroll
                            for u in range(unroll):
                                cc = own_body(
                                    jnp.minimum(t + u, hi - 1), cc
                                )
                            return cc

                        return jax.lax.fori_loop(0, n_u, body, c)
                else:
                    def own_loop(c):
                        return jax.lax.fori_loop(lo, hi, own_body, c)

                if strip:
                    # Region-1 fine ranges are strip-interleaved: S pairs
                    # per trip, pair s on row-strip s, one group merge
                    # (disjoint rows). Region-2 (imbalanced) tiles fall
                    # back to the plain per-pair loop above — region told
                    # by the tile's start offset (bin_pairs_strip).
                    own_cand_s = _make_slot_strip_cand(slot, pair_base)
                    S = th // 8
                    plain_own_loop = own_loop

                    def strip_loop(c):
                        n_g = (hi - lo) // S

                        def body(j, cc):
                            t0 = lo + j * S
                            ks, os_, ws = [], [], []
                            for s in range(S):
                                k_, o_, w_ = own_cand_s(t0 + s, s)
                                ks.append(k_)
                                os_.append(o_)
                                ws.append(w_)
                            cand = (
                                jnp.concatenate(ks, 0),
                                jnp.concatenate(os_, 0),
                                jnp.concatenate(ws, 0),
                            )
                            return _merge_pair_cand(cc, cand)

                        return jax.lax.fori_loop(0, n_g, body, c)

                    def own_loop(c):
                        return jax.lax.cond(
                            start < b_fine, strip_loop, plain_own_loop, c
                        )

                core = jax.lax.cond(
                    is_own,
                    own_loop,
                    lambda c: jax.lax.fori_loop(
                        lo, hi,
                        _make_slot_tri_body(
                            slot, gated=True, pair_base=pair_base
                        ),
                        c,
                    ),
                    core,
                )
                if not deferred:
                    return core
                winner, ps, ctx = _deferred_update(
                    slot, pair_base, core[0], core[2], aux[0], aux[1], aux[2]
                )
                return core + (winner, ps, ctx)

            out = jax.lax.fori_loop(0, n_tot, pipelined_chunk, init)

            if cross_prefetch:
                # Issue the NEXT tile's first-chunk DMA before our epilogue
                # so its ~µs HBM latency hides behind the shading work.
                nt = t_lin + 1

                @pl.when(nt < ntiles)
                def _():
                    ty2 = nt // ntx_g
                    tx2 = jax.lax.rem(nt, ntx_g)
                    c_lin2 = base_c + (ty2 // COARSE) * ntxc + (tx2 // COARSE)
                    if strip:
                        start2 = cb_ref[2 * nt]
                        end2 = cb_ref[2 * nt + 1]
                    else:
                        start2 = cb_ref[nt]
                        end2 = cb_ref[nt + 1]
                    cs2 = cb_ref[c_lin2]
                    ce2 = cb_ref[c_lin2 + 1]
                    n_own2 = (end2 + chunk - 1) // chunk - start2 // chunk
                    n_coarse2 = (ce2 + chunk - 1) // chunk - cs2 // chunk
                    first_ci = jnp.where(
                        n_own2 > 0,
                        start2 // chunk,
                        jnp.where(n_coarse2 > 0, cs2 // chunk, s0),
                    )

                    @pl.when(n_own2 + n_coarse2 + n_spill > 0)
                    def _():
                        start_dma_at(0, first_ci)

            if deferred:
                depth_o, worder_o, _wpair, winner_o, ps_o, ctx_o = out
                out = (depth_o, worder_o, winner_o, ps_o, ctx_o)

            # Pair-less tiles skip stores-from-carries AND the epilogue
            # (whose sampler range reductions cost ~µs even with nothing
            # selected) — one scalar test writes background directly.
            @pl.when(n_tot == 0)
            def _():
                if epilogue is not None:
                    rgba_ref[:] = jnp.full((th, tw), bg_empty, jnp.int32)
                    depth_ref[:] = jnp.zeros((th, tw), jnp.float32)
                    winner_ref[:] = jnp.full((th, tw), -1, jnp.int32)
                else:
                    depth_ref[:] = jnp.zeros((th, tw), jnp.float32)
                    worder_ref[:] = jnp.full((th, tw), ORDER_NONE, jnp.int32)
                    winner_ref[:] = jnp.full((th, tw), -1, jnp.int32)
                    if n_ctx:
                        ps_ref[:] = jnp.zeros((th, tw), jnp.int32)
                        for ch in range(n_ctx):
                            ctx_ref[ch] = jnp.zeros((th, tw), jnp.float32)

            @pl.when(n_tot > 0)
            def _():
                if epilogue is not None:
                    epilogue(
                        out[0], out[1], out[2], out[3], out[4],
                        (uni_ref, dims_ref, tex_ref, rgba_ref, depth_ref,
                         winner_ref),
                    )
                else:
                    depth_ref[:] = out[0]
                    worder_ref[:] = out[1]
                    winner_ref[:] = out[2]
                    if n_ctx:
                        ps_ref[:] = out[3]
                        for ch in range(n_ctx):
                            ctx_ref[ch] = out[4][ch]

            return

        nchunks = cb_ref.shape[1]
        out = jax.lax.fori_loop(0, nchunks, chunk_body, init)
        if epilogue is not None:
            epilogue(
                out[0], out[1], out[2], out[3], out[4],
                (uni_ref, dims_ref, tex_ref, rgba_ref, depth_ref, winner_ref),
            )
            return
        depth_ref[:] = out[0]
        worder_ref[:] = out[1]
        winner_ref[:] = out[2]
        if n_ctx:
            ps_ref[:] = out[3]
            for ch in range(n_ctx):
                ctx_ref[ch] = out[4][ch]

    return kernel


def _prep(tri, width, height, tile, chunk, origin, full_size, *, with_ctx):
    th, tw = tile
    y_origin, x_origin = origin
    fh, fw = full_size if full_size is not None else (height, width)
    h_pad = _cdiv(height, th) * th
    w_pad = _cdiv(width, tw) * tw
    m_pad = _cdiv(tri.num_slots, chunk) * chunk
    tri_i32, tri_f32 = pack_setup(tri, fw, fh, m_pad, with_ctx=with_ctx)
    tri_i32, tri_f32 = compact_sort(tri_i32, tri_f32, tile, fw)
    cb = chunk_bounds(tri_i32, chunk)
    origin_arr = jnp.stack(
        [jnp.asarray(y_origin, jnp.int32), jnp.asarray(x_origin, jnp.int32)]
    )
    return tri_i32, tri_f32, cb, origin_arr, h_pad, w_pad


def _call(
    cb, origin_arr, tri_i32, tri_f32, *, th, tw, chunk, id_base, n_ctx,
    h_pad, w_pad, interpret
):
    # Fence operands against XLA's cross-custom-call rewrites (see the
    # matching barriers in fused.py / voxel/raycast_pallas.py — measured
    # ~11x composed-program slowdowns without it).
    cb, origin_arr, tri_i32, tri_f32 = jax.lax.optimization_barrier(
        (cb, origin_arr, tri_i32, tri_f32)
    )
    grid = (h_pad // th, w_pad // tw)
    nchunks = cb.shape[1]
    nf_f = tri_f32.shape[0]
    tile_spec = pl.BlockSpec((th, tw), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM)
    kernel = _make_kernel(th=th, tw=tw, chunk=chunk, id_base=id_base, n_ctx=n_ctx)
    out_specs = [tile_spec, tile_spec, tile_spec]
    out_shape = [
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
        jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
    ]
    if n_ctx:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (n_ctx, th, tw), lambda ty, tx: (0, ty, tx), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_ctx, h_pad, w_pad), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, nchunks), lambda ty, tx: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda ty, tx: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.SMEM((NF_I, chunk), jnp.int32),
            pltpu.SMEM((nf_f, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cb, origin_arr, tri_i32, tri_f32)


def rasterize_pallas(
    tri: TriangleBuffer,
    width: int,
    height: int,
    *,
    tile: tuple[int, int] = (128, 128),
    chunk: int = 256,
    interpret: bool | None = None,
    origin: tuple = (0, 0),
    full_size: tuple | None = None,
):
    """Rasterize to per-pixel (winner (H,W) i32, depth (H,W) f32).

    ``chunk`` must be a multiple of 128 (DMA lane alignment).
    ``origin=(y0, x0)`` renders the sub-rect of a ``full_size`` frame (the
    reference's width_range/height_range concept, renderer.rs:269-298) —
    used for multi-device row-slab sharding. Origin may be traced.
    ``interpret`` defaults to pallas interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert chunk % 128 == 0, "chunk must be a multiple of 128"
    th, tw = tile
    tri_i32, tri_f32, cb, origin_arr, h_pad, w_pad = _prep(
        tri, width, height, tile, chunk, origin, full_size, with_ctx=False
    )
    depth, worder, winner = _call(
        cb, origin_arr, tri_i32, tri_f32,
        th=th, tw=tw, chunk=chunk, id_base=0, n_ctx=0,
        h_pad=h_pad, w_pad=w_pad, interpret=interpret,
    )
    return winner[:height, :width], depth[:height, :width]


def rasterize_interp_pallas(
    tri: TriangleBuffer,
    width: int,
    height: int,
    *,
    tile: tuple[int, int] = (128, 128),
    chunk: int = 256,
    interpret: bool | None = None,
    origin: tuple = (0, 0),
    full_size: tuple | None = None,
):
    """Rasterize + interpolate varyings in one kernel pass.

    Returns ``(ctx (H, W, C) f32, ps_index (H, W) i32, winner (H, W) i32,
    depth (H, W) f32)`` — ctx/ps are garbage where winner < 0; mask
    downstream. Equivalent to rasterize_pallas + shade.interpolate_context
    but without per-pixel gathers from the triangle table.
    ``interpret`` defaults to pallas interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert chunk % 128 == 0, "chunk must be a multiple of 128"
    th, tw = tile
    n_ctx = tri.num_channels
    tri_i32, tri_f32, cb, origin_arr, h_pad, w_pad = _prep(
        tri, width, height, tile, chunk, origin, full_size, with_ctx=True
    )
    depth, worder, winner, ps, ctx = _call(
        cb, origin_arr, tri_i32, tri_f32,
        th=th, tw=tw, chunk=chunk, id_base=0, n_ctx=n_ctx,
        h_pad=h_pad, w_pad=w_pad, interpret=interpret,
    )
    ctx = jnp.moveaxis(ctx[:, :height, :width], 0, -1)
    return (
        ctx,
        ps[:height, :width],
        winner[:height, :width],
        depth[:height, :width],
    )
