"""Scalar reference implementation of the render pipeline.

A deliberately slow, loop-by-loop NumPy/f32 mirror of the reference's
geometry stage (renderer.rs:96-267) and rasterizer (renderer.rs:269-384),
including the documented quirks (SURVEY.md §7.3):

- clipping that keeps all original vertices and adds per-(pair × plane)
  intersections (NOT Sutherland–Hodgman; renderer.rs:150-174)
- Z_NEAR plane tested as ``z >= 0`` (renderer.rs:55)
- atan2 centroid sort, stable (renderer.rs:205-218)
- reversed-z rhw depth, cleared to 0, ties overwrite (renderer.rs:360-366)
- exclusive bbox upper bounds, top-left fill rule with the asymmetric
  ``E < (top_left ? 0 : 1)`` threshold on integer coords (renderer.rs:322-341)
- winding repair (not culling) via NDC normal z (renderer.rs:300-312)

All float math is np.float32; NumPy 2 (NEP 50) keeps f32 through mixed
scalar ops, matching Rust f32 evaluation to the ulp for these formulas.

Shaders here are host callables:
  vertex_shader(vs_uniform, vs_input: dict) -> (pos4: np.ndarray, context: np.ndarray)
  pixel_shader(ps_uniform, context: np.ndarray) -> rgba4 np.ndarray
with `context` a flat f32 vector (the reference's Add/Sub/Mul<f32> trait
bound collapses to vector arithmetic).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

F32 = np.float32
EPSILON = F32(1.0e-5)
I32_MIN, I32_MAX = -(2**31), 2**31 - 1

# Plane order matches PLANE_LIST (renderer.rs:123-131); W_PLANE is disabled
# there too.
X_LEFT, X_RIGHT, Y_UP, Y_DOWN, Z_NEAR, Z_FAR = range(6)


@dataclasses.dataclass
class GoldenVertex:
    context: np.ndarray  # (C,) f32
    rhw: np.float32
    pos: np.ndarray  # (4,) f32: clip space, then NDC after §3.3 step
    spf: np.ndarray  # (2,) f32 screen coords
    spi: np.ndarray  # (2,) i64 (values saturated to i32 range)


def _inside(plane: int, pos: np.ndarray) -> bool:
    """renderer.rs:46-58."""
    w = pos[3]
    if plane == X_LEFT:
        return bool(pos[0] >= -w)
    if plane == X_RIGHT:
        return bool(pos[0] <= w)
    if plane == Y_UP:
        return bool(pos[1] <= w)
    if plane == Y_DOWN:
        return bool(pos[1] >= -w)
    if plane == Z_FAR:
        return bool(pos[2] <= w)
    if plane == Z_NEAR:
        return bool(pos[2] >= 0.0)  # quirk: not w-relative (renderer.rs:55)
    raise ValueError(plane)


def _intersect_ratio(plane: int, a: np.ndarray, b: np.ndarray) -> np.float32:
    """renderer.rs:60-73 (f32 arithmetic, exact formula shapes)."""
    aw, bw = a[3], b[3]
    if plane == X_LEFT:
        return -(a[0] + aw) / (bw + b[0] - a[0] - aw)
    if plane == X_RIGHT:
        return (aw - a[0]) / (aw - bw - a[0] + b[0])
    if plane == Y_UP:
        return (aw - a[1]) / (aw - bw - a[1] + b[1])
    if plane == Y_DOWN:
        return -(a[1] + aw) / (bw + b[1] - aw - a[1])
    if plane == Z_FAR:
        return (aw - a[2]) / (aw - bw - a[2] + b[2])
    if plane == Z_NEAR:
        return aw / (aw - bw)
    raise ValueError(plane)


def _saturate_i32(x: float) -> int:
    """Rust `f32 as i32`: truncate toward zero, saturate, NaN → 0."""
    x = float(x)
    if math.isnan(x):
        return 0
    x = math.trunc(x)
    return max(I32_MIN, min(I32_MAX, int(x)))


def _wrap_i32(x: int) -> int:
    """Two's-complement wrap to i32 (Rust release-mode overflow semantics)."""
    return ((x + 2**31) % 2**32) - 2**31


def geometry_processing(width, height, vs_inputs, vertex_shader, vs_uniform):
    """renderer.rs:96-267. Returns a list of 3-vertex triangles or None."""
    vertices = []
    for i in range(3):
        pos, context = vertex_shader(vs_uniform, vs_inputs[i])
        pos = np.asarray(pos, F32)
        if pos[3] == 0.0:
            return None  # renderer.rs:117-119
        vertices.append(
            GoldenVertex(
                context=np.asarray(context, F32),
                rhw=F32(0.0),
                pos=pos,
                spf=np.zeros(2, F32),
                spi=np.zeros(2, np.int64),
            )
        )

    inside_list = [[_inside(p, v.pos) for p in range(6)] for v in vertices]
    all_insides = all(all(row) for row in inside_list)

    valid_vertices: list[GoldenVertex] = []
    if not all_insides:
        for i in range(3):
            a = vertices[i]
            for j in range(i + 1, 3):
                b = vertices[j]
                for plane in range(6):
                    if inside_list[i][plane] != inside_list[j][plane]:
                        ratio = _intersect_ratio(plane, a.pos, b.pos)
                        new_pos = a.pos + ratio * (b.pos - a.pos)
                        new_ctx = a.context + (b.context - a.context) * ratio
                        if abs(new_pos[3]) > EPSILON:
                            valid_vertices.append(
                                GoldenVertex(
                                    context=new_ctx,
                                    rhw=F32(0.0),
                                    pos=new_pos,
                                    spf=np.zeros(2, F32),
                                    spi=np.zeros(2, np.int64),
                                )
                            )
        valid_vertices.extend(vertices)  # originals kept (renderer.rs:171)
    else:
        valid_vertices = vertices

    if len(valid_vertices) < 3:
        return None

    centroid = np.zeros(2, F32)
    for v in valid_vertices:
        centroid[0] += v.pos[0]
        centroid[1] += v.pos[1]
    centroid *= F32(1.0) / F32(len(valid_vertices))

    def angle(v: GoldenVertex) -> float:
        fx = v.pos[0] - centroid[0]
        fy = v.pos[1] - centroid[1]
        a = np.arctan2(fy, fx)
        if a < 0.0:
            a = a + F32(2.0) * F32(np.pi)
        return float(a)

    valid_vertices.sort(key=angle)  # Timsort is stable, like Rust sort_by

    for v in valid_vertices:
        w = v.pos[3]
        v.rhw = F32(1.0) / w
        v.pos = v.pos * v.rhw
        v.spf = np.array(
            [
                (v.pos[0] + F32(1.0)) * F32(width) * F32(0.5),
                (F32(1.0) - v.pos[1]) * F32(height) * F32(0.5),
            ],
            F32,
        )
        v.spi = np.array(
            [_saturate_i32(v.spf[0] + F32(0.5)), _saturate_i32(v.spf[1] + F32(0.5))],
            np.int64,
        )

    n = len(valid_vertices)
    if n == 3:
        return [[valid_vertices[0], valid_vertices[1], valid_vertices[2]]]

    triangles = []
    last = n - 1
    while last > 3:  # renderer.rs:249-254
        a = valid_vertices[last]
        b = valid_vertices[last - 1]
        triangles.append([valid_vertices[0], b, a])
        last -= 1
    triangles.append([valid_vertices[0], valid_vertices[2], valid_vertices[3]])
    triangles.append([valid_vertices[0], valid_vertices[1], valid_vertices[2]])
    return triangles


def _is_top_left(a, b) -> bool:
    """renderer.rs:26-29 on integer screen coords."""
    return (a[1] == b[1] and a[0] < b[0]) or (a[1] > b[1])


def rasterization(
    width_range,
    height_range,
    triangle,
    pixel_shader,
    ps_uniform,
    frame_buffer: np.ndarray,
    depth_buffer: np.ndarray,
):
    """renderer.rs:269-384. Mutates frame_buffer (H,W,4 u8) and depth (H,W) f32."""
    lo_x, hi_x = width_range
    lo_y, hi_y = height_range

    def clampx(v):
        return max(lo_x, min(hi_x, v))

    def clampy(v):
        return max(lo_y, min(hi_y, v))

    min_x = clampx(int(triangle[0].spi[0]))
    max_x = min_x
    min_y = clampy(int(triangle[0].spi[1]))
    max_y = min_y
    for k in (1, 2):
        v = triangle[k]
        min_x = clampx(min(min_x, int(v.spi[0])))
        max_x = clampx(max(max_x, int(v.spi[0])))
        min_y = clampy(min(min_y, int(v.spi[1])))
        max_y = clampy(max(max_y, int(v.spi[1])))

    v01 = triangle[1].pos - triangle[0].pos
    v02 = triangle[2].pos - triangle[0].pos
    normal_z = v01[0] * v02[1] - v01[1] * v02[0]

    vtx = [triangle[0], triangle[1], triangle[2]]
    if normal_z > 0.0:  # winding repair, not culling (renderer.rs:309-312)
        vtx[1], vtx[2] = vtx[2], vtx[1]

    p0, p1, p2 = vtx[0].spi, vtx[1].spi, vtx[2].spi
    tl01 = _is_top_left(p0, p1)
    tl12 = _is_top_left(p1, p2)
    tl20 = _is_top_left(p2, p0)

    for cy in range(min_y, max_y):
        index_y = cy - lo_y
        for cx in range(min_x, max_x):
            index_x = cx - lo_x
            e01 = _wrap_i32(
                -(cx - int(p0[0])) * (int(p1[1]) - int(p0[1]))
                + (cy - int(p0[1])) * (int(p1[0]) - int(p0[0]))
            )
            e12 = _wrap_i32(
                -(cx - int(p1[0])) * (int(p2[1]) - int(p1[1]))
                + (cy - int(p1[1])) * (int(p2[0]) - int(p1[0]))
            )
            e20 = _wrap_i32(
                -(cx - int(p2[0])) * (int(p0[1]) - int(p2[1]))
                + (cy - int(p2[1])) * (int(p0[0]) - int(p2[0]))
            )
            if e01 < (0 if tl01 else 1):
                continue
            if e12 < (0 if tl12 else 1):
                continue
            if e20 < (0 if tl20 else 1):
                continue

            px = np.array([F32(cx) + F32(0.5), F32(cy) + F32(0.5)], F32)
            s0 = vtx[0].spf - px
            s1 = vtx[1].spf - px
            s2 = vtx[2].spf - px
            a = abs(s1[0] * s2[1] - s1[1] * s2[0])
            b = abs(s2[0] * s0[1] - s2[1] * s0[0])
            c = abs(s0[0] * s1[1] - s0[1] * s1[0])
            s = a + b + c
            if s == 0.0:
                continue
            a = a * (F32(1.0) / s)
            b = b * (F32(1.0) / s)
            c = c * (F32(1.0) / s)

            rhw = vtx[0].rhw * a + vtx[1].rhw * b + vtx[2].rhw * c
            if rhw < depth_buffer[index_y, index_x]:
                continue
            depth_buffer[index_y, index_x] = rhw

            w = F32(1.0) / (rhw if rhw != 0.0 else F32(1.0))
            c0 = vtx[0].rhw * a * w
            c1 = vtx[1].rhw * b * w
            c2 = vtx[2].rhw * c * w
            context = vtx[0].context * c0 + vtx[1].context * c1 + vtx[2].context * c2
            color = np.asarray(pixel_shader(ps_uniform, context), F32)
            frame_buffer[index_y, index_x] = np.clip(color * 255.0, 0.0, 255.0).astype(
                np.uint8
            )


def render_scene(
    width,
    height,
    draws,
    vertex_shader,
    vs_uniform,
    pixel_shader,
    background=(0, 0, 0, 255),
):
    """Full-frame scalar render mirroring the phong.rs:314-381 frame loop.

    ``draws``: list of (vs_inputs_list, ps_uniform) pairs; each vs_inputs_list
    is a list of per-face 3-corner input dicts. Geometry runs over all draws
    first (building one submission-ordered triangle list), then rasterization
    — matching the reference's two-loop structure. The ps_uniform used per
    triangle follows the reference's inclusive `<=` offset boundaries
    (phong.rs:364-370): a triangle exactly at a draw's end offset uses the
    *previous* draw's uniform.
    """
    frame = np.zeros((height, width, 4), np.uint8)
    frame[:] = np.asarray(background, np.uint8)
    depth = np.zeros((height, width), F32)

    triangles = []
    offsets = []
    for vs_inputs_list, _ in draws:
        for face in vs_inputs_list:
            tris = geometry_processing(width, height, face, vertex_shader, vs_uniform)
            if tris is not None:
                triangles.extend(tris)
        offsets.append(len(triangles))

    for i, tri in enumerate(triangles):
        # Inclusive boundary quirk (phong.rs:364-369): index i belongs to
        # draw d iff offsets[d-1] < i <= offsets[d] — evaluated in order.
        draw_idx = len(draws) - 1
        prev = 0
        for d, off in enumerate(offsets):
            if prev < i <= off or (d == 0 and i <= off):
                draw_idx = d
                break
            prev = off
        ps_uniform = draws[draw_idx][1]
        rasterization(
            (0, width),
            (0, height),
            tri,
            pixel_shader,
            ps_uniform,
            frame,
            depth,
        )
    return frame, depth
