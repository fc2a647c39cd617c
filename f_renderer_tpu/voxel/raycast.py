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


def _unproject_dirs(width, height, inv_mvp):
    """Ray directions for every pixel (voxel.rs:141-150). Returns (H, W, 3)."""
    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    y = jnp.arange(height, dtype=jnp.float32)[:, None]
    ndc_x = x * 2.0 / width - 1.0
    ndc_y = 1.0 - (y * 2.0 / height)
    ndc_x, ndc_y = jnp.broadcast_arrays(ndc_x, ndc_y)
    v = jnp.stack(
        [ndc_x, ndc_y, jnp.ones_like(ndc_x), jnp.ones_like(ndc_x)], axis=-1
    )
    # full-precision unprojection (TPU default f32 matmul is bf16 passes)
    d = jnp.matmul(v, inv_mvp.T, precision="highest")  # (H, W, 4)
    d3 = d[..., :3]
    return d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)


def cube_intersect(pos, dirs, length):
    """VoxelCube::intersect (voxel.rs:239-334), vectorized over rays.

    pos: (3,) ray origin (shared); dirs: (..., 3). Returns
    (start (..., 3), end (..., 3), valid (...)).
    """
    shape = dirs.shape[:-1]
    pts = jnp.zeros(shape + (MAX_POINTS, 3), jnp.float32)
    cnt = jnp.zeros(shape, jnp.int32)
    length = jnp.float32(length)

    def push(pts, cnt, point, cond):
        # append `point` where cond (broadcast over rays)
        idx = jnp.clip(cnt, 0, MAX_POINTS - 1)
        onehot = (
            jnp.arange(MAX_POINTS)[..., None] == idx[..., None, None]
        )  # (..., MAX_POINTS, 1)
        pts = jnp.where(cond[..., None, None] & onehot, point[..., None, :], pts)
        cnt = cnt + cond.astype(jnp.int32)
        return pts, cnt

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
        cross = jnp.cross(dirs, jnp.asarray(n))
        is_parallel = jnp.all(cross == 0.0, axis=-1) & ~handled_parallel
        p = unit_diag * pos  # (3,) — reduced-dimension position
        inside = jnp.all((p >= 0.0) & (p <= length))
        cond = is_parallel & inside
        pts, cnt = push(pts, cnt, jnp.broadcast_to(p, shape + (3,)), cond)
        pts, cnt = push(
            pts,
            cnt,
            jnp.broadcast_to(p + length * unit_diag, shape + (3,)),
            cond,
        )
        handled_parallel = handled_parallel | (is_parallel & inside)

        dir_dot_n = dirs[..., axis]
        perp = dir_dot_n == 0.0
        for a_scale in (0.0, 1.0):
            a = jnp.asarray(n, jnp.float32) * (length * a_scale)
            ap = a - pos  # (3,)
            ap_cross = jnp.cross(jnp.broadcast_to(ap, dirs.shape), dirs)
            on_ray_line = jnp.all(ap_cross == 0.0, axis=-1)
            # a is itself the intersection point
            cond_a = (~is_parallel) & (~perp) & on_ray_line
            pts, cnt = push(pts, cnt, jnp.broadcast_to(a, shape + (3,)), cond_a)
            # generic plane hit
            t = jnp.sum(ap * jnp.asarray(n)) / dir_dot_n
            b = pos + dirs * t[..., None]
            in_bounds = jnp.all((b >= 0.0) & (b <= length), axis=-1)
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
    d = jnp.linalg.norm(pts - pos, axis=-1)
    d = jnp.where(jnp.arange(MAX_POINTS) < cnt[..., None], d, jnp.float32(3.0e38))
    dk = [d[..., k] for k in range(MAX_POINTS)]
    rank = []
    for j in range(MAX_POINTS):
        r = jnp.zeros(shape, jnp.int32)
        for k_ in range(MAX_POINTS):
            if k_ == j:
                continue
            less = (dk[k_] < dk[j]) | ((dk[k_] == dk[j]) & (k_ < j))
            r = r + less.astype(jnp.int32)
        rank.append(r)
    pts_k = [pts[..., k, :] for k in range(MAX_POINTS)]
    pts_s = []
    for p_ in range(MAX_POINTS):
        acc = jnp.zeros(shape + (3,), jnp.float32)
        for j in range(MAX_POINTS):
            acc = jnp.where((rank[j] == p_)[..., None], pts_k[j], acc)
        pts_s.append(acc)

    # The reference's scrambling "dedupe" for cnt > 2 (voxel.rs:323-331):
    #   i = 1; for j in 0..len: if pts[i] != pts[j]: pts[i] = pts[j]; i = j
    # Reproduced literally, unrolled with one-hot selects over the 8 slots.
    ded = list(pts_s)
    i_idx = jnp.ones(shape, jnp.int32)
    for j in range(MAX_POINTS):
        in_range = j < cnt
        pi = jnp.zeros(shape + (3,), jnp.float32)
        for k_ in range(MAX_POINTS):
            pi = jnp.where((i_idx == k_)[..., None], ded[k_], pi)
        pj = ded[j]
        differs = jnp.any(pi != pj, axis=-1) & in_range
        for k_ in range(MAX_POINTS):
            sel = differs & (i_idx == k_)
            ded[k_] = jnp.where(sel[..., None], pj, ded[k_])
        i_idx = jnp.where(differs, j, i_idx)

    do_dedupe = (cnt > 2)[..., None]
    p0 = jnp.where(do_dedupe, ded[0], pts_s[0])
    p1 = jnp.where(do_dedupe, ded[1], pts_s[1])

    start = p0
    end = jnp.where(single[..., None], p0, p1)
    return start, end, valid


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
    dirs = _unproject_dirs(w, h, jnp.asarray(inv_mvp, jnp.float32))
    start, end, valid = cube_intersect(eye, dirs, length)

    # ray_cast setup (voxel.rs:336-343). Rust f32::min ignores NaN (IEEE
    # minNum) — 0/0 components from axis-parallel rays must not poison the
    # min, hence fmin, not jnp.min.
    t_max_vec = (end - start) / dirs
    t_max = jnp.fmin(
        jnp.fmin(t_max_vec[..., 0], t_max_vec[..., 1]), t_max_vec[..., 2]
    )
    per_t = length / jnp.float32(2.0**level) * 0.01

    cell = length / r

    # Flat tables + single-axis takes: multi-dim ``grid[ix, iy, iz]`` gathers
    # lower pathologically on TPU (same effect measured for textures,
    # baselines/profile_texture.py). One i32 table per step: bit 24 = hit,
    # packed bgr in the low 24 bits; alpha is constant 255 for leaves
    # (wgpu_base.rs:32-35) and background alike.
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
            start,
            dirs,
            t_max,
            alive,
            table_flat,
            r,
            config.length,
            per_t_f32,
            config.background,
            interpret=backend == "pallas_interpret",
            dda=config.traversal == "dda",
        )

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
