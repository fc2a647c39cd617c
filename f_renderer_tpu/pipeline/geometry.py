"""Batched geometry stage (reference: renderer.rs:96-267).

TPU-first translation of the per-triangle scalar pipeline:

- The vertex shader runs over the whole index buffer at once (vmap; an MVP
  transform inside it becomes one batched MXU matmul), replacing the
  3-at-a-time closure calls (renderer.rs:115-121).
- Clipping keeps the reference's exact (quirky) semantics — intersections
  added per (vertex pair × plane) with all originals retained, NOT
  Sutherland–Hodgman (renderer.rs:150-174) — but as **fixed-shape masked
  arrays**: ≤ 3 pairs × 6 planes + 3 originals = 21 candidate slots, a
  masked stable sort by centroid angle (renderer.rs:205-218), and a fan
  triangulation into ≤ 19 output slots (renderer.rs:237-266).
- Two-path execution: faces fully inside the frustum (the vast majority)
  skip the sort entirely and emit one triangle each — output-equivalent
  because the pipeline below is invariant under cyclic vertex rotation and
  the winding repair (renderer.rs:300-312) normalizes orientation. Clipped
  faces are compacted into a small fixed-capacity buffer (``clip_cap``) and
  only those run the 21-slot path.

Plane order matches PLANE_LIST (renderer.rs:123-131): X_LEFT, X_RIGHT,
Y_UP, Y_DOWN, Z_NEAR, Z_FAR; Z_NEAR tests ``z >= 0`` (quirk, renderer.rs:55).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from f_renderer_tpu.pipeline.types import TriangleBuffer
from f_renderer_tpu.shaders.api import make_context_codec

EPSILON = 1.0e-5
MAX_POLY = 21  # 18 intersection slots + 3 originals
MAX_FAN = MAX_POLY - 2  # fan triangles per clipped face
TWO_PI = 2.0 * math.pi


def _insides(pos):
    """Plane inside tests (renderer.rs:46-58). pos (..., 4) → (..., 6) bool."""
    x, y, z, w = pos[..., 0], pos[..., 1], pos[..., 2], pos[..., 3]
    return jnp.stack(
        [x >= -w, x <= w, y <= w, y >= -w, z >= 0.0, z <= w], axis=-1
    )


def _ratios(a, b):
    """Intersection ratios for all 6 planes (renderer.rs:60-73).

    a, b: (..., 4) clip positions → (..., 6) f32. Division by zero yields
    inf exactly as Rust f32 does; such slots are either masked or flow
    through as the reference's garbage would.
    """
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            -(ax + aw) / (bw + bx - ax - aw),
            (aw - ax) / (aw - bw - ax + bx),
            (aw - ay) / (aw - bw - ay + by),
            -(ay + aw) / (bw + by - aw - ay),
            aw / (aw - bw),
            (aw - az) / (aw - bw - az + bz),
        ],
        axis=-1,
    )


def _f32_to_i32_sat(x):
    """Rust ``f32 as i32``: truncate toward zero, saturate, NaN → 0.

    (Saturation lands on the largest f32 below 2^31, off by 127 from Rust's
    exact i32::MAX — observable only for garbage off-screen vertices whose
    bboxes are clamped to the screen anyway.)
    """
    x = jnp.where(jnp.isnan(x), 0.0, x)
    x = jnp.clip(x, -2147483648.0, 2147483520.0)
    return x.astype(jnp.int32)


def _screen_coords(pos, rhw, width, height):
    """NDC + viewport transform (renderer.rs:220-235).

    pos (..., 4) clip → (ndc_xy (..., 2), spf (..., 2), spi (..., 2)).
    """
    ndc = pos * rhw[..., None]
    # Left-associative like the reference: ((x+1) * W) * 0.5 rounds once at
    # the W multiply; grouping as x * (W/2) can differ by an ulp.
    spf_x = (ndc[..., 0] + 1.0) * jnp.float32(width) * 0.5
    spf_y = (1.0 - ndc[..., 1]) * jnp.float32(height) * 0.5
    spf = jnp.stack([spf_x, spf_y], axis=-1)
    spi = _f32_to_i32_sat(spf + 0.5)
    return ndc[..., :2], spf, spi


def _is_top_left(a, b):
    """Top-left rule predicate on integer coords (renderer.rs:26-29)."""
    return ((a[..., 1] == b[..., 1]) & (a[..., 0] < b[..., 0])) | (
        a[..., 1] > b[..., 1]
    )


def _setup_core(
    ndc_x, ndc_y, spf_x, spf_y, spi_x, spi_y, rhw, ctx, valid, order,
    ps_index, cull,
):
    """Winding repair + raster setup on per-vertex (N,) planes.

    Coordinate args are 3-lists of (N,) planes (vertex-major); ``ctx`` is a
    3-list of C-lists of (N,) channel planes. Planar because (N, 3, 2)-shaped
    math puts the tiny trailing dims on the (sublane, lane) tile — the
    take_along_axis winding permutation alone cost ~5 ms at 1M triangles.
    The swap only exchanges v1/v2, so it is selects per plane, no gather.
    Semantics are renderer.rs:300-320, element-for-element.
    """
    v01x = ndc_x[1] - ndc_x[0]
    v01y = ndc_y[1] - ndc_y[0]
    v02x = ndc_x[2] - ndc_x[0]
    v02y = ndc_y[2] - ndc_y[0]
    nz = v01x * v02y - v01y * v02x
    swap = nz > 0.0  # NaN → no swap, like Rust
    if cull:
        valid = valid & ~swap
        swap = jnp.zeros_like(swap)

    def sw(pl):
        return [
            pl[0],
            jnp.where(swap, pl[2], pl[1]),
            jnp.where(swap, pl[1], pl[2]),
        ]

    spi_x, spi_y = sw(spi_x), sw(spi_y)
    spf_x, spf_y = sw(spf_x), sw(spf_y)
    rhw = sw(rhw)
    # v1/v2 exchange per channel plane — selects on dense (N,) arrays
    ctx = [
        ctx[0],
        [jnp.where(swap, c2, c1) for c1, c2 in zip(ctx[1], ctx[2])],
        [jnp.where(swap, c1, c2) for c1, c2 in zip(ctx[1], ctx[2])],
    ]

    def tlp(ax, ay, bx, by):  # _is_top_left on planes
        return ((ay == by) & (ax < bx)) | (ay > by)

    tl = jnp.stack(
        [
            tlp(spi_x[0], spi_y[0], spi_x[1], spi_y[1]),
            tlp(spi_x[1], spi_y[1], spi_x[2], spi_y[2]),
            tlp(spi_x[2], spi_y[2], spi_x[0], spi_y[0]),
        ],
        axis=0,
    )
    # Planar (3, 2, N) assembly — stacks of dense (N,) planes, no
    # small-trailing-dim relayout (types.TriangleBuffer docstring).
    spi = jnp.stack(
        [jnp.stack([spi_x[v], spi_y[v]], axis=0) for v in range(3)], axis=0
    )
    spf = jnp.stack(
        [jnp.stack([spf_x[v], spf_y[v]], axis=0) for v in range(3)], axis=0
    )
    return TriangleBuffer(
        spi=spi,
        spf=spf,
        rhw=jnp.stack(rhw, axis=0),
        ctx=jnp.stack([c for v in range(3) for c in ctx[v]], axis=0)
        if ctx[0]
        else jnp.zeros((0, valid.shape[0]), jnp.float32),
        top_left=tl,
        valid=valid,
        order=order.astype(jnp.int32),
        ps_index=jnp.broadcast_to(jnp.asarray(ps_index, jnp.int32), valid.shape),
    )


def _setup_triangles(ndc_xy, spf, spi, rhw, ctx, valid, order, ps_index, cull=False):
    """Stacked-layout wrapper over :func:`_setup_core` (clip-path use)."""
    c = ctx.shape[-1]
    return _setup_core(
        [ndc_xy[:, v, 0] for v in range(3)],
        [ndc_xy[:, v, 1] for v in range(3)],
        [spf[:, v, 0] for v in range(3)],
        [spf[:, v, 1] for v in range(3)],
        [spi[:, v, 0] for v in range(3)],
        [spi[:, v, 1] for v in range(3)],
        [rhw[:, v] for v in range(3)],
        [[ctx[:, v, ch] for ch in range(c)] for v in range(3)],
        valid,
        order,
        ps_index,
        cull,
    )


def _clip_face(pos3, ctx3, width, height):
    """Fixed-shape clip of one (not-all-inside) face (renderer.rs:150-266).

    pos3 (3, 4), ctx3 (3, C) → per-face fan arrays with MAX_FAN slots:
    (ndc_xy (19,3,2), spf, spi, rhw (19,3), ctx (19,3,C), tri_valid (19,)).
    """
    ins = _insides(pos3)  # (3, 6)
    pair_a = jnp.array([0, 0, 1])
    pair_b = jnp.array([1, 2, 2])
    a_pos, b_pos = pos3[pair_a], pos3[pair_b]  # (3, 4)
    a_ctx, b_ctx = ctx3[pair_a], ctx3[pair_b]
    ratios = _ratios(a_pos, b_pos)  # (3, 6)
    new_pos = a_pos[:, None, :] + ratios[..., None] * (b_pos - a_pos)[:, None, :]
    new_ctx = a_ctx[:, None, :] + (b_ctx - a_ctx)[:, None, :] * ratios[..., None]
    differ = ins[pair_a] != ins[pair_b]  # (3, 6)
    new_valid = differ & (jnp.abs(new_pos[..., 3]) > EPSILON)

    c = ctx3.shape[-1]
    cand_pos = jnp.concatenate([new_pos.reshape(18, 4), pos3], axis=0)  # (21, 4)
    cand_ctx = jnp.concatenate([new_ctx.reshape(18, c), ctx3], axis=0)
    cand_valid = jnp.concatenate(
        [new_valid.reshape(18), jnp.ones((3,), bool)], axis=0
    )
    # Mask garbage slots so they cannot poison the centroid with NaN/inf.
    cand_pos = jnp.where(cand_valid[:, None], cand_pos, 0.0)

    n = jnp.sum(cand_valid).astype(jnp.int32)
    # Reference multiplies by the reciprocal (renderer.rs:187), not divides.
    centroid = jnp.sum(cand_pos[:, :2] * cand_valid[:, None], axis=0) * (
        1.0 / n.astype(jnp.float32)
    )
    d = cand_pos[:, :2] - centroid
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    ang = jnp.where(ang < 0.0, ang + TWO_PI, ang)
    key = jnp.where(cand_valid, ang, jnp.float32(1.0e9))
    perm = jnp.argsort(key, stable=True)  # stable → candidate order preserved
    pos_s = cand_pos[perm]
    ctx_s = cand_ctx[perm]

    rhw = 1.0 / pos_s[:, 3]
    ndc_xy, spf, spi = _screen_coords(pos_s, rhw, width, height)

    # Fan triangulation with the reference's exact ordering (renderer.rs:237-266).
    t = jnp.arange(MAX_FAN, dtype=jnp.int32)
    i1 = jnp.where(t == n - 3, 1, jnp.where(t == n - 4, 2, n - 2 - t))
    i2 = jnp.where(t == n - 3, 2, jnp.where(t == n - 4, 3, n - 1 - t))
    i0 = jnp.zeros_like(t)
    tri_valid = t < (n - 2)
    idx = jnp.clip(jnp.stack([i0, i1, i2], axis=-1), 0, MAX_POLY - 1)  # (19, 3)

    return (
        ndc_xy[idx],
        spf[idx],
        spi[idx],
        rhw[idx],
        ctx_s[idx],
        tri_valid,
    )


def geometry_process(
    vs_inputs,
    vertex_shader: Callable,
    vs_uniform,
    width: int,
    height: int,
    *,
    clip_cap: int = 256,
    ps_index: int = 0,
    order_base: int = 0,
    cull: bool = False,
):
    """Run the full geometry stage over a batch of faces.

    ``vs_inputs``: pytree with leaves of shape (F, 3, ...) — one record per
    face corner. ``vertex_shader(vs_uniform, corner_pytree) -> (pos4, ctx)``.

    Returns ``(TriangleBuffer, stats)`` where the buffer has
    ``F + clip_cap * MAX_FAN`` slots (path A: one per face; path B: the fan
    slots of up to ``clip_cap`` clipped faces) and
    ``stats = {"num_clipped": i32}`` — if ``num_clipped > clip_cap`` the
    extra clipped faces are dropped (documented overflow policy; raise
    ``clip_cap``).
    """
    leaves = jax.tree.leaves(vs_inputs)
    f = leaves[0].shape[0]
    example = jax.tree.map(lambda l: jnp.zeros(l.shape[2:], jnp.float32), vs_inputs)
    codec = make_context_codec(vertex_shader, vs_uniform, example)

    def vs_one(vin):
        pos, ctx = vertex_shader(vs_uniform, vin)
        return jnp.asarray(pos, jnp.float32), codec.flatten(ctx)

    # Run the VS ONCE over all 3F corners (corner-major concat) with
    # out_axes=-1: pos comes out (4, 3F) and ctx (C, 3F) — dense
    # per-component planes with the corner dim on the 128-lane axis, and
    # the VS + inside-test + screen-transform graphs are built once
    # instead of three times (the per-op launch overhead of many tiny
    # XLA ops IS the small-scene frame floor). Per-vertex (F,) planes
    # are contiguous slices [v·F, (v+1)·F) afterwards. A (F·3, 4)-shaped
    # vmap would instead pay strided slices over 4-/C-wide trailing dims
    # (tile-padded, ~1/16 lane use; ~14 ms of the 1M-face stress4k
    # geometry stage was such ops).
    c = codec.num_channels
    corners = jax.tree.map(
        lambda l: jnp.concatenate(
            [jnp.asarray(l[:, v], jnp.float32) for v in range(3)], axis=0
        ),
        vs_inputs,
    )
    pos_a, ctx_a = jax.vmap(vs_one, out_axes=-1)(corners)  # (4, 3F), (C, 3F)

    def vslice(arr_1d, v):
        return jax.lax.slice_in_dim(arr_1d, v * f, (v + 1) * f)

    P = [[vslice(pos_a[comp], v) for comp in range(4)] for v in range(3)]
    CTXP = [[vslice(ctx_a[ch], v) for ch in range(c)] for v in range(3)]
    w_ok = (P[0][3] != 0.0) & (P[1][3] != 0.0) & (P[2][3] != 0.0)
    # _insides on all corners at once, planar (renderer.rs:46-58)
    xa, ya, za, wa = pos_a[0], pos_a[1], pos_a[2], pos_a[3]
    iv_all = (
        (xa >= -wa) & (xa <= wa) & (ya <= wa) & (ya >= -wa)
        & (za >= 0.0) & (za <= wa)
    )
    all_in = vslice(iv_all, 0) & vslice(iv_all, 1) & vslice(iv_all, 2)
    face_idx = jnp.arange(f, dtype=jnp.int32)

    # ---- Path A: all-inside faces (no clip, no sort) ----
    a_valid = w_ok & all_in
    wf = jnp.float32(width)
    hf = jnp.float32(height)
    # _screen_coords on all corners at once, planar (renderer.rs:220-235)
    rhw_a = 1.0 / wa
    nx_a = xa * rhw_a
    ny_a = ya * rhw_a
    sx_a = (nx_a + 1.0) * wf * 0.5
    sy_a = (1.0 - ny_a) * hf * 0.5
    six_a = _f32_to_i32_sat(sx_a + 0.5)
    siy_a = _f32_to_i32_sat(sy_a + 0.5)
    rhw_p = [vslice(rhw_a, v) for v in range(3)]
    ndc_x = [vslice(nx_a, v) for v in range(3)]
    ndc_y = [vslice(ny_a, v) for v in range(3)]
    spf_x = [vslice(sx_a, v) for v in range(3)]
    spf_y = [vslice(sy_a, v) for v in range(3)]
    spi_x = [vslice(six_a, v) for v in range(3)]
    spi_y = [vslice(siy_a, v) for v in range(3)]
    buf_a = _setup_core(
        ndc_x, ndc_y, spf_x, spf_y, spi_x, spi_y, rhw_p, CTXP,
        a_valid, order_base + face_idx * MAX_FAN, ps_index, cull,
    )

    # ---- Path B: clipped faces, compacted to clip_cap slots ----
    # The whole path is behind a lax.cond: frames with nothing clipped (the
    # common case for interior scenes) skip its ~2× geometry cost entirely.
    b_mask = w_ok & ~all_in
    num_clipped = jnp.sum(b_mask).astype(jnp.int32)

    def run_clip_path(_):
        (sel,) = jnp.nonzero(b_mask, size=clip_cap, fill_value=f)
        # Gather the few clipped faces from the planes, then stack to the
        # small (cap, 3, 4)/(cap, 3, C) layout the per-face clipper uses —
        # the full-F stacked arrays are never materialized. Padding slots
        # (sel == f) clamp-gather garbage; their fan slots are masked via
        # (sel < f) below, so garbage cannot reach the output.
        b_pos = jnp.stack(
            [
                jnp.stack([P[v][comp][sel] for comp in range(4)], axis=-1)
                for v in range(3)
            ],
            axis=1,
        )
        if c:
            b_ctx = jnp.stack(
                [
                    jnp.stack([CTXP[v][ch][sel] for ch in range(c)], axis=-1)
                    for v in range(3)
                ],
                axis=1,
            )
        else:
            b_ctx = jnp.zeros((clip_cap, 3, 0), jnp.float32)
        b_ndc, b_spf, b_spi, b_rhw, b_ctx_s, b_tri_valid = jax.vmap(
            _clip_face, in_axes=(0, 0, None, None)
        )(b_pos, b_ctx, width, height)
        b_tri_valid = b_tri_valid & (sel < f)[:, None]
        b_order = (
            order_base
            + sel[:, None] * MAX_FAN
            + jnp.arange(MAX_FAN, dtype=jnp.int32)[None, :]
        )
        return b_ndc, b_spf, b_spi, b_rhw, b_ctx_s, b_tri_valid, b_order

    def skip_clip_path(_):
        z = jnp.zeros
        return (
            z((clip_cap, MAX_FAN, 3, 2), jnp.float32),
            z((clip_cap, MAX_FAN, 3, 2), jnp.float32),
            z((clip_cap, MAX_FAN, 3, 2), jnp.int32),
            z((clip_cap, MAX_FAN, 3), jnp.float32),
            z((clip_cap, MAX_FAN, 3, c), jnp.float32),
            z((clip_cap, MAX_FAN), bool),
            z((clip_cap, MAX_FAN), jnp.int32) + order_base,
        )

    b_ndc, b_spf, b_spi, b_rhw, b_ctx_s, b_tri_valid, b_order = jax.lax.cond(
        num_clipped > 0, run_clip_path, skip_clip_path, 0
    )

    def flat(x):
        return x.reshape((clip_cap * MAX_FAN,) + x.shape[2:])

    buf_b = _setup_triangles(
        flat(b_ndc),
        flat(b_spf),
        flat(b_spi),
        flat(b_rhw),
        flat(b_ctx_s),
        flat(b_tri_valid),
        flat(b_order),
        ps_index,
        cull=cull,
    )

    return buf_a.concat(buf_b), {"num_clipped": num_clipped}
