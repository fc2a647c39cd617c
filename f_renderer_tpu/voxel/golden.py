"""Scalar oracle of the voxel raycaster (voxel.rs:239-394), f32 math."""

from __future__ import annotations

import numpy as np

from f_renderer_tpu.voxel.octree import Voxel, find_leaf_scalar

F32 = np.float32


def intersect_scalar(pos, dir, length):
    """VoxelCube::intersect (voxel.rs:239-334). Returns (start, end) or None."""
    pos = np.asarray(pos, F32)
    dir = np.asarray(dir, F32)
    length = F32(length)
    pts: list[np.ndarray] = []

    axes = [np.eye(3, dtype=F32)[i] for i in range(3)]
    for n in axes:
        unit_diag = (1.0 - n).astype(F32)
        if np.all(np.cross(dir, n) == 0.0):
            p = unit_diag * pos
            if np.all((p >= 0.0) & (p <= length)):
                pts.append(p)
                pts.append(p + length * unit_diag)
                break
            continue
        dir_dot_n = float(dir @ n)
        if dir_dot_n == 0.0:
            continue
        for a in (np.zeros(3, F32), (n * length).astype(F32)):
            ap = a - pos
            if np.all(np.cross(ap, dir) == 0.0):
                pts.append(a)
            else:
                t = F32(ap @ n) / F32(dir_dot_n)
                if t >= 0.0:
                    b = pos + dir * t
                    if np.all((b >= 0.0) & (b <= length)):
                        pts.append(b)

    if not pts:
        return None
    if len(pts) < 2:
        return pts[0], pts[0]
    pts.sort(key=lambda p: float(np.linalg.norm(p - pos)))
    if len(pts) > 2:
        # the reference's scrambling dedupe, literally (voxel.rs:323-331)
        i = 1
        for j in range(len(pts)):
            if np.any(pts[i] != pts[j]):
                pts[i] = pts[j]
                i = j
    return pts[0], pts[1]


def ray_cast_scalar(root: Voxel, level: int, length, pos, dir, start, end):
    """VoxelCube::ray_cast (voxel.rs:336-355). Returns BGRA color or None."""
    pos = np.asarray(pos, F32)
    dir = np.asarray(dir, F32)
    with np.errstate(all="ignore"):
        t_max_vec = (np.asarray(end, F32) - np.asarray(start, F32)) / dir
    t_max = float(np.fmin(np.fmin(t_max_vec[0], t_max_vec[1]), t_max_vec[2]))
    per_t = F32(length) / F32(2.0**level) * F32(0.01)
    t = F32(0.0)
    while t <= t_max:
        leaf = find_leaf_scalar(root, length, np.asarray(start, F32) + t * dir)
        if leaf is not None:
            return leaf
        if t >= t_max:
            break
        t = min(F32(t + per_t), F32(t_max))
    return None


def render_voxel_scalar(root: Voxel, level: int, length, eye, inv_mvp, width, height):
    """Full-frame scalar render (voxel.rs:139-162). Returns (H, W, 4) u8 BGRA."""
    frame = np.zeros((height, width, 4), np.uint8)
    frame[..., 3] = 255  # Rgba::new() background
    eye = np.asarray(eye, F32)
    inv_mvp = np.asarray(inv_mvp, F32)
    for y in range(height):
        for x in range(width):
            ndc = np.array(
                [x * 2.0 / width - 1.0, 1.0 - y * 2.0 / height, 1.0, 1.0], F32
            )
            d = inv_mvp @ ndc
            d3 = d[:3] / F32(np.linalg.norm(d[:3]))
            hit = intersect_scalar(eye, d3, length)
            if hit is None:
                continue
            color = ray_cast_scalar(root, level, length, eye, d3, hit[0], hit[1])
            if color is not None:
                frame[y, x] = color
    return frame
