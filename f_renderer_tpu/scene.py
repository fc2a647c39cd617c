"""Scene / application layer (reference: examples/src/bin/phong.rs).

Replaces the reference's Vulkan/wgpu window presentation (vulkan_base.rs,
wgpu_base.rs — a dumb blitter for CPU-computed pixels) with a functional
frame API: build a `Scene`, call `render` (jittable), export PNG/npy.

Also provides procedural meshes for tests/benchmarks, since the reference's
OBJ/TGA assets are not distributed with its repository.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from f_renderer_tpu.camera import Camera
from f_renderer_tpu.math import set_identity, set_perspective
from f_renderer_tpu.pipeline import RenderConfig, render_frame
from f_renderer_tpu.shaders import TextureStack, make_phong_shaders


@dataclasses.dataclass
class Scene:
    """A multi-mesh scene with per-draw textures (phong.rs:166-184)."""

    draws: Sequence  # list of vs_input pytrees, leaves (F, 3, ...)
    vertex_shader: Callable
    pixel_shader: Callable
    vs_uniform: dict
    ps_uniform: dict
    config: RenderConfig

    def render(self):
        """Render one frame (jit-compiled; the whole pipeline is one XLA
        program — eager dispatch is pathologically slow on remote runtimes).
        Uniforms/draws are traced, so camera or mesh animation reuses the
        compiled program."""
        step = _scene_step(
            self.vertex_shader, self.pixel_shader, self.config, len(self.draws)
        )
        return step(self.vs_uniform, self.ps_uniform, tuple(self.draws))

    def prepare(self):
        """Precompute the geometry+binning products for the current
        geometry and camera (pipeline.fused.prep_fused).

        For a static scene under animated *shading* (light position via the
        shader, ``view_pos``, texture swaps of equal shape) the per-frame
        cost drops to the fused kernel alone — pass the result to
        :meth:`render_prepared`. Camera or vertex motion changes the
        screen-space triangles the bins index, so it requires a fresh
        ``prepare()`` (binning is screen-space by design; it is ~0.3 ms at
        1080p — see BASELINE.md).

        Requires the pallas backend and a fused-eligible pixel shader.
        """
        from f_renderer_tpu.pipeline.fused import fused_path_ok

        if not fused_path_ok(self.pixel_shader, self.ps_uniform):
            raise ValueError(
                "texture stack exceeds the fused kernel's VMEM budget"
            )
        prep = _scene_prepare(
            self.vertex_shader, self.pixel_shader, self.config, len(self.draws)
        )
        return prep(self.vs_uniform, tuple(self.draws))

    def render_prepared(self, prepared):
        """Render using :meth:`prepare` products; only shading uniforms
        (``ps_uniform``) are read fresh. Returns (frame, depth, winner)."""
        arrays, statics = prepared
        run = _scene_render_prepared(
            self.pixel_shader, self.config, _freeze(statics)
        )
        return run(arrays, self.ps_uniform)


def _freeze(statics: dict) -> tuple:
    return tuple(sorted(statics.items()))


@functools.lru_cache(maxsize=64)
def _scene_prepare(vertex_shader, pixel_shader, config, num_draws):
    from f_renderer_tpu.pipeline.fused import prep_fused
    from f_renderer_tpu.pipeline.render import build_triangles

    if config.backend != "pallas" or not hasattr(pixel_shader, "fused_kind"):
        raise ValueError(
            "Scene.prepare requires backend='pallas' and a fused-eligible "
            "pixel shader (builtin flat/gouraud/textured/phong)"
        )

    statics_box = []

    @jax.jit
    def prep(vs_uniform, draws):
        tri, _ = build_triangles(
            list(draws), vertex_shader, vs_uniform, config
        )
        arrays, statics = prep_fused(tri, config)
        statics_box.append(statics)
        return arrays

    def run(vs_uniform, draws):
        arrays = prep(vs_uniform, draws)
        return arrays, statics_box[-1]

    return run


@functools.lru_cache(maxsize=64)
def _scene_render_prepared(pixel_shader, config, statics_frozen):
    from f_renderer_tpu.pipeline.fused import render_fused_prepared

    statics = dict(statics_frozen)

    @jax.jit
    def run(arrays, ps_uniform):
        return render_fused_prepared(
            arrays, statics, pixel_shader, ps_uniform, config
        )

    return run


@functools.lru_cache(maxsize=64)
def _scene_step(vertex_shader, pixel_shader, config, num_draws):
    @jax.jit
    def step(vs_uniform, ps_uniform, draws):
        return render_frame(
            list(draws), vertex_shader, vs_uniform, pixel_shader, ps_uniform,
            config,
        )

    return step


# ---------------------------------------------------------------------------
# Procedural geometry
# ---------------------------------------------------------------------------


def make_cube(size: float = 1.0) -> dict:
    """12-triangle cube with per-face normals and uvs; corners (12, 3, ...)."""
    s = size * 0.5
    v = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
        np.float32,
    )
    quads = [
        ((0, 1, 3, 2), (-1, 0, 0)),
        ((4, 6, 7, 5), (1, 0, 0)),
        ((0, 4, 5, 1), (0, -1, 0)),
        ((2, 3, 7, 6), (0, 1, 0)),
        ((0, 2, 6, 4), (0, 0, -1)),
        ((1, 5, 7, 3), (0, 0, 1)),
    ]
    pos, normal, uv, color = [], [], [], []
    quad_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    palette = np.array(
        [
            [0.9, 0.2, 0.2, 1],
            [0.2, 0.9, 0.2, 1],
            [0.2, 0.2, 0.9, 1],
            [0.9, 0.9, 0.2, 1],
            [0.9, 0.2, 0.9, 1],
            [0.2, 0.9, 0.9, 1],
        ],
        np.float32,
    )
    for qi, (idx, n) in enumerate(quads):
        for tri in ((0, 1, 2), (0, 2, 3)):
            pos.append(v[[idx[t] for t in tri]])
            uv.append(quad_uv[list(tri)])
            normal.append(np.tile(np.asarray(n, np.float32), (3, 1)))
            color.append(np.tile(palette[qi], (3, 1)))
    return {
        "pos": np.stack(pos),
        "uv": np.stack(uv),
        "normal": np.stack(normal),
        "color": np.stack(color),
    }


def make_uv_sphere(n_lat: int = 36, n_lon: int = 72, radius: float = 1.0) -> dict:
    """UV sphere (~2·n_lat·n_lon triangles) with smooth normals and uvs."""
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon + 1)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    x = np.sin(th) * np.cos(ph)
    y = np.cos(th)
    z = np.sin(th) * np.sin(ph)
    p = np.stack([x, y, z], axis=-1).astype(np.float32)  # (n_lat+1, n_lon+1, 3)
    u = (ph / (2 * np.pi)).astype(np.float32)
    v = (th / np.pi).astype(np.float32)
    uvg = np.stack([u, v], axis=-1)

    pos, uv, normal = [], [], []
    for i in range(n_lat):
        for j in range(n_lon):
            a, b, c, d = p[i, j], p[i + 1, j], p[i + 1, j + 1], p[i, j + 1]
            ua, ub, uc, ud = uvg[i, j], uvg[i + 1, j], uvg[i + 1, j + 1], uvg[i, j + 1]
            for tri_p, tri_u in (((a, b, c), (ua, ub, uc)), ((a, c, d), (ua, uc, ud))):
                pos.append(np.stack(tri_p))
                uv.append(np.stack(tri_u))
                normal.append(np.stack(tri_p))  # unit sphere: normal = pos
    return {
        "pos": np.stack(pos) * radius,
        "uv": np.stack(uv),
        "normal": np.stack(normal),
    }


def make_instanced_soup(
    n_tris: int, seed: int = 0, spread: float = 8.0, size: float = 0.08,
    box: float | None = None,
) -> dict:
    """Random triangle soup for stress benchmarks (BASELINE config #5).

    ``box``: if set, centers are uniform in the origin-centered cube
    [-box, box]³ — a y-rotation-invariant, frustum-interior distribution
    (pair it with a camera far enough that the cube never clips). The
    default (box=None) is the r1-r3 distribution: x, y ∈ ±spread,
    z ∈ [2, 30] — which put 25-90% of the faces THROUGH the frustum
    planes per bench frame, silently truncated by clip_cap (BASELINE.md
    r4 note); kept for the sharded tests that want clip-path coverage.
    """
    rng = np.random.default_rng(seed)
    if box is not None:
        centers = rng.uniform(-box, box, (n_tris, 3)).astype(np.float32)
    else:
        centers = rng.uniform(
            [-spread, -spread, 2.0], [spread, spread, 30.0], (n_tris, 3)
        ).astype(np.float32)
    offs = rng.uniform(-size * 10, size * 10, (n_tris, 3, 3)).astype(np.float32)
    pos = centers[:, None, :] + offs * size / 0.08 * 0.08
    normal = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    nn = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = (normal / np.where(nn == 0, 1, nn)).astype(np.float32)
    uv = rng.random((n_tris, 3, 2)).astype(np.float32)
    return {
        "pos": pos.astype(np.float32),
        "uv": uv,
        "normal": np.repeat(normal[:, None, :], 3, axis=1),
    }


def make_checker_texture(n: int = 64, cell: int = 4) -> np.ndarray:
    tex = np.zeros((n, n, 4), np.float32)
    ix = np.arange(n)
    mask = (ix[:, None] // cell + ix[None, :] // cell) % 2 == 0
    tex[mask] = [0.85, 0.65, 0.25, 1.0]
    tex[~mask] = [0.25, 0.45, 0.85, 1.0]
    return tex


def make_phong_scene(
    width: int,
    height: int,
    meshes: Sequence[dict] | None = None,
    textures: Sequence[np.ndarray] | None = None,
    camera: Camera | None = None,
    clip_cap: int = 256,
    backend: str = "jnp",
    shader: str = "phong",
) -> Scene:
    """A ready-to-render multi-mesh scene (the phong.rs workload shape).

    ``shader``: "phong" (textured per-pixel, the default) | "gouraud"
    (vertex-lit) | "textured" (unlit bilinear) | "flat" (per-face color;
    meshes must carry a "color" attribute, as make_cube does).
    """
    from f_renderer_tpu.shaders import (
        FlatShader,
        make_gouraud_shaders,
        make_textured_shaders,
    )

    if meshes is None:
        meshes = [make_cube()]
    if textures is None:
        textures = [make_checker_texture()] * len(meshes)
    if camera is None:
        camera = Camera.create([0.0, 1.0, 3.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0])
    vs, ps = {
        "phong": make_phong_shaders,
        "gouraud": make_gouraud_shaders,
        "textured": make_textured_shaders,
        "flat": lambda: (FlatShader.vertex, FlatShader.pixel),
    }[shader]()
    proj = set_perspective(np.pi * 0.25, width / height, 0.1, 100.0)
    draw_keys = ("pos", "color") if shader == "flat" else ("pos", "uv", "normal")
    draws = [{k: jnp.asarray(m[k]) for k in draw_keys} for m in meshes]
    vs_uniform = {
        "model": set_identity(),
        "view": camera.look_at(),
        "proj": proj,
    }
    if shader == "gouraud":
        vs_uniform["view_pos"] = camera.eye  # lighting runs in the VS
    return Scene(
        draws=draws,
        vertex_shader=vs,
        pixel_shader=ps,
        vs_uniform=vs_uniform,
        ps_uniform={
            "textures": TextureStack.create(list(textures)),
            "view_pos": camera.eye,
        },
        config=RenderConfig(
            width=width,
            height=height,
            background=(30, 30, 30, 255),
            clip_cap=clip_cap,
            backend=backend,
        ),
    )
