"""Voxel raycast renderer (reference: voxel.rs:135-416).

Per pixel (voxel.rs:139-162): screen → NDC, unproject the ray direction
through model⁻¹·view⁻¹·proj⁻¹, intersect with the root cube, then fixed-step
march (step = length / 2^level · 0.01, voxel.rs:340) doing a point query per
step; first hit wins. Misses produce opaque black (Rgba::new()).

TPU form: everything vectorized over the full pixel grid; the march is a
lax.while_loop that exits when every ray has resolved (most resolve in a
few steps at 70% occupancy); the point query is a single dense-grid gather
(see octree.densify — exactly equivalent to the recursive descent).

Reference quirks replicated (SURVEY.md §7.3.10):

- the impossible early-out ``pos.x > length && pos.x < 0`` never fires — we
  simply omit the dead branch (identical behavior);
- the >2-intersection "dedupe" loop (voxel.rs:323-331) actually *scrambles*
  the entry/exit pair for corner-grazing rays — reproduced bit-for-bit;
- fixed-step marching can skip thin leaves — step size reproduced exactly,
  including the ``t = min(t + per_t, t_max)`` terminal step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

MAX_POINTS = 8  # ≤ 2 per axis + 2 from the axis-parallel special case


def _unproject_dir_planes(width, height, inv_mvp):
    """Ray directions for every pixel (voxel.rs:141-150) → 3 (H, W) planes.

    Written as planar FMA chains with scalar matrix coefficients — the
    (H·W, 4) @ (4, 4) matmul form costs >100 ms/frame at 960×540 on v5e
    (K = N = 4 wastes 124/128 of the MXU both ways); the planar form is
    sub-ms on the VPU and exact f32 (no bf16 passes).
    """
    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    y = jnp.arange(height, dtype=jnp.float32)[:, None]
    ndc_x = x * 2.0 / width - 1.0
    ndc_y = 1.0 - (y * 2.0 / height)
    ndc_x, ndc_y = jnp.broadcast_arrays(ndc_x, ndc_y)
    m = inv_mvp
    d3 = [
        ((m[i, 0] * ndc_x + m[i, 1] * ndc_y) + m[i, 2]) + m[i, 3]
        for i in range(3)
    ]
    norm = jnp.sqrt(d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2])
    return [c / norm for c in d3]


def _unproject_dirs(width, height, inv_mvp):
    """Stacked (H, W, 3) wrapper over :func:`_unproject_dir_planes`."""
    return jnp.stack(_unproject_dir_planes(width, height, inv_mvp), axis=-1)


def _cube_intersect_planes(pos, dp, length):
    """VoxelCube::intersect (voxel.rs:239-334) over per-axis ray planes.

    pos: (3,) ray origin (shared); dp: list of 3 (...) direction planes.
    Returns (start [3 planes], end [3 planes], valid (...)).

    TPU layout note: every intermediate is a python list of (...)-shaped
    per-slot/per-axis planes, never a (..., 8, 3) array — trailing small
    dims land on the (sublane, lane) tile and waste 125/128 lanes on every
    op. The arithmetic is element-for-element the reference's.
    """
    shape = dp[0].shape
    zero = jnp.zeros(shape, jnp.float32)
    # pts[k][a]: slot k, axis a — all (shape)-sized planes
    pts = [[zero, zero, zero] for _ in range(MAX_POINTS)]
    cnt = jnp.zeros(shape, jnp.int32)
    length = jnp.float32(length)

    def push(pts, cnt, point, cond):
        # append `point` (list of 3 planes/scalars) where cond
        idx = jnp.clip(cnt, 0, MAX_POINTS - 1)
        out = []
        for k in range(MAX_POINTS):
            sel = cond & (idx == k)
            out.append(
                [jnp.where(sel, point[a], pts[k][a]) for a in range(3)]
            )
        return out, cnt + cond.astype(jnp.int32)

    def cross(a, b):
        # a × b for plane triples, jnp.cross's component order
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    # Axis-parallel special case (voxel.rs:263-279): dir × axis == 0.
    # The reference `break`s out of the axis loop after pushing both points;
    # a direction parallel to one axis is not parallel to the others and
    # for the others hits the `dir_dot_n == 0` continue, so evaluating all
    # axes independently is equivalent.
    handled_parallel = jnp.zeros(shape, bool)
    for axis in range(3):
        n = np.zeros(3, np.float32)
        n[axis] = 1.0
        unit_diag = (1.0 - n).astype(np.float32)
        cr = cross(dp, [jnp.float32(n[a]) for a in range(3)])
        is_parallel = (
            (cr[0] == 0.0) & (cr[1] == 0.0) & (cr[2] == 0.0)
        ) & ~handled_parallel
        p = unit_diag * jnp.asarray(pos, jnp.float32)  # (3,) reduced position
        inside = jnp.all((p >= 0.0) & (p <= length))
        cond = is_parallel & inside
        pts, cnt = push(pts, cnt, [p[a] for a in range(3)], cond)
        p2 = p + length * unit_diag
        pts, cnt = push(pts, cnt, [p2[a] for a in range(3)], cond)
        handled_parallel = handled_parallel | (is_parallel & inside)

        dir_dot_n = dp[axis]
        perp = dir_dot_n == 0.0
        for a_scale in (0.0, 1.0):
            a = jnp.asarray(n) * (length * jnp.float32(a_scale))  # (3,)
            ap_j = a - jnp.asarray(pos, jnp.float32)  # (3,)
            ap_p = [ap_j[i] for i in range(3)]
            apc = cross(ap_p, dp)
            on_ray_line = (apc[0] == 0.0) & (apc[1] == 0.0) & (apc[2] == 0.0)
            # a is itself the intersection point
            cond_a = (~is_parallel) & (~perp) & on_ray_line
            pts, cnt = push(pts, cnt, [a[i] for i in range(3)], cond_a)
            # generic plane hit
            t = ap_j[axis] / dir_dot_n
            b = [jnp.asarray(pos, jnp.float32)[i] + dp[i] * t for i in range(3)]
            in_bounds = (
                (b[0] >= 0.0) & (b[0] <= length)
                & (b[1] >= 0.0) & (b[1] <= length)
                & (b[2] >= 0.0) & (b[2] <= length)
            )
            cond_b = (
                (~is_parallel) & (~perp) & (~on_ray_line) & (t >= 0.0) & in_bounds
            )
            pts, cnt = push(pts, cnt, b, cond_b)

    valid = cnt > 0
    # <2 points → (p0, p0) (voxel.rs:317-319)
    single = cnt == 1

    # Sort by distance to ray origin, stable (voxel.rs:321). Implemented as
    # static rank-selects over the 8 slots: per-pixel argsort+gather on the
    # trailing axis lowers to scalar loops on TPU (~100 ms/frame measured);
    # 64 compares + selects fuse into cheap VPU code.
    pos_j = jnp.asarray(pos, jnp.float32)
    dk = []
    for k in range(MAX_POINTS):
        dxp = pts[k][0] - pos_j[0]
        dyp = pts[k][1] - pos_j[1]
        dzp = pts[k][2] - pos_j[2]
        dist = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp)
        dk.append(jnp.where(k < cnt, dist, jnp.float32(3.0e38)))
    rank = []
    for j in range(MAX_POINTS):
        r = jnp.zeros(shape, jnp.int32)
        for k_ in range(MAX_POINTS):
            if k_ == j:
                continue
            less = (dk[k_] < dk[j]) | ((dk[k_] == dk[j]) & (k_ < j))
            r = r + less.astype(jnp.int32)
        rank.append(r)
    pts_s = []
    for p_ in range(MAX_POINTS):
        acc = [zero, zero, zero]
        for j in range(MAX_POINTS):
            sel = rank[j] == p_
            acc = [jnp.where(sel, pts[j][a], acc[a]) for a in range(3)]
        pts_s.append(acc)

    # The reference's scrambling "dedupe" for cnt > 2 (voxel.rs:323-331):
    #   i = 1; for j in 0..len: if pts[i] != pts[j]: pts[i] = pts[j]; i = j
    # Reproduced literally, unrolled with one-hot selects over the 8 slots.
    ded = [list(p) for p in pts_s]
    i_idx = jnp.ones(shape, jnp.int32)
    for j in range(MAX_POINTS):
        in_range = j < cnt
        pi = [zero, zero, zero]
        for k_ in range(MAX_POINTS):
            sel = i_idx == k_
            pi = [jnp.where(sel, ded[k_][a], pi[a]) for a in range(3)]
        pj = ded[j]
        differs = (
            (pi[0] != pj[0]) | (pi[1] != pj[1]) | (pi[2] != pj[2])
        ) & in_range
        for k_ in range(MAX_POINTS):
            sel = differs & (i_idx == k_)
            ded[k_] = [jnp.where(sel, pj[a], ded[k_][a]) for a in range(3)]
        i_idx = jnp.where(differs, j, i_idx)

    do_dedupe = cnt > 2
    p0 = [jnp.where(do_dedupe, ded[0][a], pts_s[0][a]) for a in range(3)]
    p1 = [jnp.where(do_dedupe, ded[1][a], pts_s[1][a]) for a in range(3)]

    start = p0
    end = [jnp.where(single, p0[a], p1[a]) for a in range(3)]
    return start, end, valid


def cube_intersect(pos, dirs, length):
    """VoxelCube::intersect (voxel.rs:239-334), vectorized over rays.

    pos: (3,) ray origin (shared); dirs: (..., 3). Returns
    (start (..., 3), end (..., 3), valid (...)). Stacked-layout wrapper
    over :func:`_cube_intersect_planes` — hot paths use the planes form
    directly so no (..., 3) array crosses a kernel boundary.
    """
    dp = [dirs[..., a] for a in range(3)]
    start, end, valid = _cube_intersect_planes(pos, dp, length)
    return jnp.stack(start, axis=-1), jnp.stack(end, axis=-1), valid


@dataclasses.dataclass(frozen=True)
class VoxelRenderConfig:
    width: int
    height: int
    level: int
    length: float = 2.0
    background: tuple = (0, 0, 0, 255)  # Rgba::new() — opaque black, BGRA
    backend: str = "auto"  # "auto" | "pallas" | "jnp"
    # "fixed" replicates the reference's tiny-step march incl. its thin-leaf
    # skip quirk (voxel.rs:340, SURVEY.md §7.3.10); "dda" steps cell-exactly
    # (~50× fewer iterations, pallas backend only).
    traversal: str = "fixed"
    # Rays per march-kernel program = block×128. Bigger blocks amortize the
    # while-loop's scalar control + cross-lane exit checks over more rays
    # (divergence is low: worst-lane p95/p50 = 1.2, voxel roofline) at the
    # cost of more live vregs per step. A/B ladder (profile_voxel_steps.py,
    # TPU, par mode): parity 3.96/2.87/2.65/2.15 ms at block 8/16/32/128
    # (256 flat at 2.16), dda 2.44/1.47/1.35-1.55 at 8/32/128 (256
    # regresses) — 128 wins both.
    block: int = 128


def render_voxel_frame(
    grid_color,  # (R, R, R, 4) u8 — densified SVO, indexed [ix, iy, iz]
    grid_hit,  # (R, R, R) bool
    eye,  # (3,)
    inv_mvp,  # (4, 4) — model⁻¹ · view⁻¹ · proj⁻¹ (as one matrix product)
    config: VoxelRenderConfig,
):
    """Render one frame; returns (H, W, 4) u8 in the reference's BGRA order."""
    h, w = config.height, config.width
    length = jnp.float32(config.length)
    level = config.level
    r = grid_hit.shape[0]

    eye = jnp.asarray(eye, jnp.float32)
    # Everything stays per-axis (H, W) planes up to the march — a stacked
    # (H, W, 3) array crossing an op/kernel boundary forces 3-lane layouts.
    dp = _unproject_dir_planes(w, h, jnp.asarray(inv_mvp, jnp.float32))
    start_p, end_p, valid = _cube_intersect_planes(eye, dp, length)

    # ray_cast setup (voxel.rs:336-343). Rust f32::min ignores NaN (IEEE
    # minNum) — 0/0 components from axis-parallel rays must not poison the
    # min, hence fmin, not jnp.min.
    tmv = [(end_p[a] - start_p[a]) / dp[a] for a in range(3)]
    t_max = jnp.fmin(jnp.fmin(tmv[0], tmv[1]), tmv[2])
    per_t = length / jnp.float32(2.0**level) * 0.01

    cell = length / r

    # Flat tables + single-axis takes: multi-dim ``grid[ix, iy, iz]`` gathers
    # lower pathologically on TPU (same effect measured for textures,
    # baselines/profile_texture.py). One i32 table per step: bit 24 = hit,
    # packed bgr in the low 24 bits; alpha is constant 255 for leaves
    # (wgpu_base.rs:32-35) and background alike.
    if not isinstance(grid_color, jax.core.Tracer) and not isinstance(
        grid_hit, jax.core.Tracer
    ):
        # Concrete grids (the usual case — voxel data is loaded, not
        # traced): build the table on the host so it reaches the march
        # kernel as a true XLA constant. As a traced-graph product it
        # becomes a non-constant custom-call operand, which XLA rebuilds
        # through scoped-VMEM async slices at ~70 ms/frame (measured,
        # baselines/profile_voxel*.py).
        gcn = np.asarray(grid_color).astype(np.int64)
        ghn = np.asarray(grid_hit)
        ci = gcn[..., 0] | (gcn[..., 1] << 8) | (gcn[..., 2] << 16)
        tf = np.where(ghn, ci | (1 << 24), ci).astype(np.uint32)
        table_flat = jnp.asarray(tf.view(np.int32).reshape(-1))
    else:
        color_i32 = (
            grid_color[..., 0].astype(jnp.int32)
            | (grid_color[..., 1].astype(jnp.int32) << 8)
            | (grid_color[..., 2].astype(jnp.int32) << 16)
        )
        table_flat = jnp.where(
            grid_hit, color_i32 | (1 << 24), color_i32
        ).reshape(-1)

    def query(p):
        """Dense-grid point query ≡ find_leaf (see octree.densify)."""
        inside = jnp.all((p >= 0.0) & (p < length), axis=-1)
        idx = jnp.clip((p / cell).astype(jnp.int32), 0, r - 1)
        flat = (idx[..., 0] * r + idx[..., 1]) * r + idx[..., 2]
        v = jnp.take(table_flat, flat, axis=0)
        hit = ((v >> 24) & 1).astype(bool) & inside
        color = jnp.stack(
            [
                v & 0xFF,
                (v >> 8) & 0xFF,
                (v >> 16) & 0xFF,
                jnp.full_like(v, 255),
            ],
            axis=-1,
        ).astype(jnp.uint8)
        return hit, color

    backend = config.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend in ("pallas", "pallas_interpret"):
        import numpy as np_

        from f_renderer_tpu.voxel.raycast_pallas import march_pallas

        per_t_f32 = float(
            np_.float32(np_.float32(config.length) / np_.float32(2.0**level))
            * np_.float32(0.01)
        )
        alive = valid & (t_max >= 0.0)
        return march_pallas(
            start_p,
            dp,
            t_max,
            alive,
            table_flat,
            r,
            config.length,
            per_t_f32,
            config.background,
            block=config.block,
            interpret=backend == "pallas_interpret",
            dda=config.traversal == "dda",
        )

    start = jnp.stack(start_p, axis=-1)
    dirs = jnp.stack(dp, axis=-1)
    bg = jnp.asarray(config.background, jnp.uint8)
    # `while t <= t_max` (voxel.rs:344): a negative/NaN t_max means the loop
    # body never runs — no query even at t = 0.
    init = {
        "t": jnp.zeros((h, w), jnp.float32),
        "done": ~valid | ~(t_max >= 0.0),
        "color": jnp.broadcast_to(bg, (h, w, 4)),
    }

    def cond(state):
        return jnp.any(~state["done"])

    def body(state):
        t, done, color = state["t"], state["done"], state["color"]
        p = start + t[..., None] * dirs
        hit, c = query(p)
        hit = hit & ~done
        color = jnp.where(hit[..., None], c, color)
        done2 = done | hit | (t >= t_max)
        t2 = jnp.where(done2, t, jnp.minimum(t + per_t, t_max))
        return {"t": t2, "done": done2, "color": color}

    final = jax.lax.while_loop(cond, body, init)
    return final["color"]
