"""Pallas TPU ray-march kernel for the SVO raycaster.

The XLA march (raycast.py) pays a full-image gather per step — ~2.5 s/frame
at 960×540 on v5e. Here the march runs inside a kernel: the densified voxel
table (hit bit 24 + packed bgr, see raycast.py) lives in VMEM as
(r³/128, 128) i32 rows; each (BS, 128) ray block while-loops until all its
rays resolve, doing one hierarchical 128-lane gather set per step
(``jnp.take_along_axis`` — Mosaic lane gather).

Semantics are bit-identical to raycast.py's loop: query at p = start + t·dir
starting from t = 0, first hit wins, ``t = min(t + per_t, t_max)``
(voxel.rs:336-355), misses keep the background color.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Fixed-step group formulation (A/B knob, baselines/profile_voxel_steps.py):
#   "par" — compute the group's 8 candidate sample times upfront (a short
#           serial add/min chain — provably the same f32 values the gated
#           `t = min(t + per_t, tmax)` chain reaches) and run the 8 hit
#           queries as INDEPENDENT gather chains resolved by one priority
#           select. Bit-exact; overlaps the per-step gather latency the
#           serial form pays 8× (the voxel roofline's 2-3× gap driver).
#   "ser" — the r2-r4 body: 8 sequential gated steps.
STEP_MODE = _os.environ.get("FR_VOXEL_STEPS", "par")

# Queries per cross-lane exit check in "par" mode. Bigger groups amortize
# the jump phase + `jnp.any` over more candidates but waste queries past
# each lane's stop point (a lane that stops at step 1 still pays the whole
# group). PROFILE_GROUPS sweep at block=32 (profile_voxel_steps.py, TPU):
# g2 3.04 / g4 2.31-2.33 / g8 2.54 / g16 3.06 ms — 4 wins (the jump phase
# already lands rays ~2 steps from the next event, so long groups mostly
# query past the stop). Serial mode keeps its fixed 8.
GROUP = int(_os.environ.get("FR_VOXEL_GROUP", "4"))
# Fail at the knob, not deep inside kernel tracing (GROUP=0 would build an
# empty step group and IndexError on stops[0]).
assert GROUP >= 1, f"FR_VOXEL_GROUP must be >= 1, got {GROUP}"


def _cdiv(a, b):
    return -(-a // b)


def _march_kernel(
    sx_ref, sy_ref, sz_ref,  # (BS, 128) f32 — ray entry points
    dx_ref, dy_ref, dz_ref,  # (BS, 128) f32 — ray directions
    tmax_ref,  # (BS, 128) f32
    alive_ref,  # (BS, 128) i32 — 1 where the march should run
    tab_ref,  # VMEM (nhi, 128) i32 — voxel table (bit 24 = hit, bgr low)
    bits_ref,  # VMEM (nhib, 128) i32 — hit BITS only, 32 cells per word
    ttab_ref,  # VMEM (nhit, 128) f32 — the exact t_k = fl-accum of per_t
    out_ref,  # (BS, 128) i32 — packed bgra
    *,
    bs: int,
    nhi: int,
    nhib: int,
    nhit: int,
    r: int,
    length: float,
    per_t: float,
    bg_packed: int,
    dda: bool = False,
):
    sx, sy, sz = sx_ref[...], sy_ref[...], sz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmax = tmax_ref[...]
    cell_inv = jnp.float32(r / length)
    tab = tab_ref[...]  # (nhi, 128) in registers
    bits = bits_ref[...]  # (nhib, 128) in registers

    def lookup(flat):
        hi = flat // LANES
        lo = flat % LANES
        acc = jnp.zeros((bs, LANES), jnp.int32)
        for h in range(nhi):
            row = jnp.broadcast_to(tab[h][None, :], (bs, LANES))
            g = jnp.take_along_axis(row, lo, axis=1)
            acc = jnp.where(hi == h, g, acc)
        return acc

    def cell_flat(t):
        px = sx + t * dx
        py = sy + t * dy
        pz = sz + t * dz
        inside = (
            (px >= 0.0) & (px < length)
            & (py >= 0.0) & (py < length)
            & (pz >= 0.0) & (pz < length)
        )
        ix = jnp.clip((px * cell_inv).astype(jnp.int32), 0, r - 1)
        iy = jnp.clip((py * cell_inv).astype(jnp.int32), 0, r - 1)
        iz = jnp.clip((pz * cell_inv).astype(jnp.int32), 0, r - 1)
        return (ix * r + iy) * r + iz, inside

    def query_hit(t):
        # Hit test only: one 32-cells-per-word bit gather per step instead
        # of the nhi-row packed-color select (4 gathers at level 3) — the
        # march needs the color only once, after it resolves.
        flat, inside = cell_flat(t)
        word = flat >> 5
        hi = word // LANES
        lo = word % LANES
        acc = jnp.zeros((bs, LANES), jnp.int32)
        for h in range(nhib):
            row = jnp.broadcast_to(bits[h][None, :], (bs, LANES))
            g = jnp.take_along_axis(row, lo, axis=1)
            acc = g if nhib == 1 else jnp.where(hi == h, g, acc)
        return (((acc >> (flat & 31)) & 1) != 0) & inside

    def query(t):
        flat, inside = cell_flat(t)
        v = lookup(flat)
        hit = (((v >> 24) & 1) != 0) & inside
        return hit, v

    t0 = jnp.zeros((bs, LANES), jnp.float32)
    # done carried as i32 — Mosaic cannot legalize i1 vectors in while carries
    done0 = 1 - alive_ref[...]

    cellsz = jnp.float32(length / r)
    inf = jnp.float32(3.0e38)

    def boundary_dt(t):
        # exact distance to the next cell boundary (3D-DDA); rays with a
        # zero direction component never cross that axis' planes.
        px = sx + t * dx
        py = sy + t * dy
        pz = sz + t * dz

        def axis(p, d):
            c = jnp.floor(p / cellsz)
            boundary = (c + (d > 0.0).astype(jnp.float32)) * cellsz
            tn = (boundary - p) / d
            tn = jnp.where((d == 0.0) | jnp.isnan(tn), inf, tn)
            return jnp.maximum(tn, 0.0)

        return jnp.minimum(jnp.minimum(axis(px, dx), axis(py, dy)), axis(pz, dz))

    if dda:

        def cond(state):
            return jnp.any(state[1] == 0)

        def body(state):
            t, done = state
            for _ in range(2):
                hit = query_hit(t) & (done == 0)
                done = jnp.where(hit | (t >= tmax), jnp.int32(1), done)
                t = jnp.where(
                    done != 0,
                    t,
                    jnp.minimum(t + boundary_dt(t) + cellsz * 1.0e-3, tmax),
                )
            return t, done

        t_fin, _ = jax.lax.while_loop(cond, body, (t0, done0))
    else:
        # Reference-exact fixed-step march with empty-cell skipping. The
        # sample times t_k are a global fl()-accumulation of per_t (the
        # per-ray t_max only clamps the final sample), precomputed into
        # ttab. While the current cell is EMPTY, every sample up to the
        # cell boundary provably misses, so the march may jump the step
        # index k and refetch the exact t_k — bit-identical results with
        # ~100× fewer queries through empty space (per_t = cellsz/100,
        # voxel.rs:340). A 2-step margin before the boundary (and before
        # t_max) absorbs f32 rounding in the boundary distance.
        ttab = ttab_ref[...]

        def gather_t(k):
            hi = k // LANES
            lo = k % LANES
            acc = jnp.zeros((bs, LANES), jnp.float32)
            for h in range(nhit):
                row = jnp.broadcast_to(ttab[h][None, :], (bs, LANES))
                g = jnp.take_along_axis(row, lo, axis=1)
                acc = jnp.where(hi == h, g, acc)
            return acc

        kmax = jnp.int32(nhit * LANES - 1)
        inv_per_t = jnp.float32(1.0 / per_t)

        def cond(state):
            return jnp.any(state[2] == 0)

        def body(state):
            t, k, done = state
            # Jump phase: skip ahead inside an empty cell (exact, above).
            flat, inside = cell_flat(t)
            word = flat >> 5
            lo = word % LANES
            if nhib == 1:
                g = jnp.take_along_axis(
                    jnp.broadcast_to(bits[0][None, :], (bs, LANES)), lo, axis=1
                )
            else:
                hi = word // LANES
                g = jnp.zeros((bs, LANES), jnp.int32)
                for h in range(nhib):
                    row = jnp.broadcast_to(bits[h][None, :], (bs, LANES))
                    gg = jnp.take_along_axis(row, lo, axis=1)
                    g = jnp.where(hi == h, gg, g)
            occupied = (((g >> (flat & 31)) & 1) != 0) & inside
            # The skip is exact outside the cube too: grid planes tile all
            # of space, outside cells are uniformly miss, and the cube
            # boundary coincides with a grid plane — so rays the reference's
            # scrambled-dedupe quirk (voxel.rs:323-331) starts outside
            # (they otherwise plain-step the full ~2800-sample budget and
            # dominate their block) leap empty space the same way.
            n = jnp.floor(
                jnp.minimum(boundary_dt(t), tmax - t) * inv_per_t
            ).astype(jnp.int32) - 2
            n = jnp.where((done == 0) & ~occupied, jnp.maximum(n, 0), 0)
            k2 = jnp.minimum(k + n, kmax)
            t = jnp.where(n > 0, jnp.minimum(gather_t(k2), tmax), t)
            k = k2
            # Normal steps (several per cross-lane exit check).
            if STEP_MODE == "par":
                # Candidate sample times u_i = min(fl_acc_i, tmax): once the
                # running min clamps to tmax it stays there (tmax + per_t >
                # tmax), so this unconditional chain reaches exactly the
                # values the gated serial form queries. The 8 query_hit
                # chains share no data dependence — Mosaic can overlap
                # their gather latencies — and one reverse priority select
                # freezes each lane at its FIRST stop, as the serial form
                # does.
                g = GROUP
                us = [t]
                ks = [k]
                for _ in range(g):
                    us.append(jnp.minimum(us[-1] + per_t, tmax))
                    ks.append(jnp.minimum(ks[-1] + 1, kmax))
                stops = [query_hit(us[i]) | (us[i] >= tmax) for i in range(g)]
                t_new = us[g]
                k_new = ks[g]
                for i in range(g - 1, -1, -1):
                    t_new = jnp.where(stops[i], us[i], t_new)
                    k_new = jnp.where(stops[i], ks[i], k_new)
                any_stop = stops[0]
                for i in range(1, g):
                    any_stop = any_stop | stops[i]
                t = jnp.where(done != 0, t, t_new)
                k = jnp.where(done != 0, k, k_new)
                done = jnp.where(
                    done != 0, done, any_stop.astype(jnp.int32)
                )
            else:
                for _ in range(8):
                    hit = query_hit(t) & (done == 0)
                    done = jnp.where(hit | (t >= tmax), jnp.int32(1), done)
                    t = jnp.where(done != 0, t, jnp.minimum(t + per_t, tmax))
                    k = jnp.where(done != 0, k, jnp.minimum(k + 1, kmax))
            return t, k, done

        t_fin, _, _ = jax.lax.while_loop(
            cond, body, (t0, jnp.zeros((bs, LANES), jnp.int32), done0)
        )
    # One full color query at each ray's final t: hit rays stopped on their
    # hit cell; t_max/never-alive rays miss (or are masked by alive).
    hit, v = query(t_fin)
    hit = hit & (alive_ref[...] != 0)
    out_ref[...] = jnp.where(
        hit, (v & 0x00FFFFFF) | jnp.int32(-16777216), jnp.int32(bg_packed)
    )


def march_pallas(
    start,  # [3 planes (...)] f32 (or (..., 3) stacked)
    dirs,  # [3 planes (...)] f32 (or (..., 3) stacked)
    t_max,  # (...,) f32
    alive,  # (...,) bool — rays to march (valid & t_max >= 0)
    table_flat,  # (r³,) i32 — packed voxel table (raycast.py)
    r: int,
    length: float,
    per_t: float,
    background,  # (4,) u8 (b, g, r, a)
    *,
    block: int = 8,
    interpret: bool = False,
    dda: bool = False,
):
    """Run the march; returns (..., 4) u8 colors (BGRA like the reference).

    ``dda=True`` steps cell-exactly (3D-DDA) instead of the reference's
    fixed tiny step — ~50× fewer iterations, no thin-leaf skipping; an
    intentional behavioral deviation, off by default (SURVEY.md §7.3.10).
    """
    shape = t_max.shape
    if isinstance(start, (list, tuple)):
        start_p, dirs_p = list(start), list(dirs)
    else:  # stacked (..., 3) compatibility
        start_p = [start[..., a] for a in range(3)]
        dirs_p = [dirs[..., a] for a in range(3)]
    # Fence the ray planes: without this, XLA "optimizes" the producers
    # across the custom-call boundary (scoped-VMEM buffers rebuilt via
    # async slice + ConcatBitcast) and the composed program runs ~11x
    # slower than the kernel itself (80 ms vs 7 ms at 960x540, measured
    # via the barrier A/B in baselines/profile_voxel*.py). The fence must
    # sit on the (H, W) planes, before the pad/reshape into kernel operand
    # form.
    fenced = jax.lax.optimization_barrier(
        tuple(start_p) + tuple(dirs_p) + (t_max, alive)
    )
    start_p = list(fenced[0:3])
    dirs_p = list(fenced[3:6])
    t_max, alive = fenced[6], fenced[7]
    p = 1
    for s in shape:
        p *= s
    rows = _cdiv(max(p, 1), LANES)
    rows_pad = _cdiv(rows, block) * block
    ppad = rows_pad * LANES
    nhi = _cdiv(r * r * r, LANES)
    nwords = _cdiv(r * r * r, 32)
    nhib = _cdiv(nwords, LANES)

    def fp(a, fill=0.0):
        flat = a.reshape(-1).astype(jnp.float32)
        return jnp.pad(flat, (0, ppad - p), constant_values=fill).reshape(
            rows_pad, LANES
        )

    alive_i = jnp.pad(
        alive.reshape(-1).astype(jnp.int32), (0, ppad - p)
    ).reshape(rows_pad, LANES)
    tab = jnp.pad(
        table_flat.astype(jnp.int32), (0, nhi * LANES - r * r * r)
    ).reshape(nhi, LANES)
    # Hit bits packed 32 cells per i32 word (little-endian within the word).
    hitb = ((table_flat.astype(jnp.int32) >> 24) & 1).astype(jnp.uint32)
    hitb = jnp.pad(hitb, (0, nwords * 32 - r * r * r)).reshape(nwords, 32)
    shifts = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    bits = jnp.sum(hitb * shifts[None, :], axis=1, dtype=jnp.uint32)
    bits = (
        jnp.pad(bits, (0, nhib * LANES - nwords))
        .reshape(nhib, LANES)
        .view(jnp.int32)
    )

    # Exact sample-time table t_k (fl-accumulated per_t, the k-th value the
    # kernel's `t += per_t` chain reaches) up to the cube diagonal — long
    # enough that no ray's t_max lies beyond it.
    import numpy as np

    pt = np.float32(per_t)
    t_acc = np.float32(0.0)
    tt = [t_acc]
    t_end = np.float32(np.sqrt(3.0) * length) + pt
    while tt[-1] < t_end:
        t_acc = np.float32(t_acc + pt)
        tt.append(t_acc)
    tt = np.asarray(tt, np.float32)
    nhit = _cdiv(tt.shape[0], LANES)
    ttab = jnp.asarray(
        np.pad(tt, (0, nhit * LANES - tt.shape[0]), constant_values=tt[-1])
        .reshape(nhit, LANES)
    )

    bg = background
    bg_packed = int(bg[0]) | (int(bg[1]) << 8) | (int(bg[2]) << 16) | (
        int(bg[3]) << 24
    )
    if bg_packed >= 2**31:
        bg_packed -= 2**32

    kernel = functools.partial(
        _march_kernel,
        bs=block,
        nhi=nhi,
        nhib=nhib,
        nhit=nhit,
        r=r,
        length=float(length),
        per_t=float(per_t),
        bg_packed=bg_packed,
        dda=dda,
    )
    ops = (
        fp(start_p[0]), fp(start_p[1]), fp(start_p[2]),
        fp(dirs_p[0]), fp(dirs_p[1]), fp(dirs_p[2]),
        fp(t_max, fill=-1.0), alive_i, tab, bits, ttab,
    )
    blk = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // block,),
        in_specs=[pl.BlockSpec((block, LANES), blk)] * 8
        + [
            pl.BlockSpec((nhi, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhib, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nhit, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, LANES), blk),
        out_shape=jax.ShapeDtypeStruct((rows_pad, LANES), jnp.int32),
        interpret=interpret,
    )(*ops)
    u8 = jax.lax.bitcast_convert_type(out, jnp.uint8)  # (rows, 128, 4)
    return u8.reshape(-1, 4)[:p].reshape(shape + (4,))
