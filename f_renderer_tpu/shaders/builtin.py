"""Built-in shader programs reproducing the reference example shaders.

Each factory returns ``(vertex_shader, pixel_shader)`` with the pipeline
signatures:

  vertex_shader(vs_uniform, vs_input) -> (clip_pos (4,), context_pytree)
  pixel_shader(ps_uniform, context, ps_index) -> rgba (4,) f32

Phong constants match phong.rs:128-132: white light at (1.2, 1.0, 2.0),
ambient 0.1, specular 0.5 · (V·R)^32.
"""

from __future__ import annotations

import jax.numpy as jnp

from f_renderer_tpu.math import normalize, reflect

LIGHT_COLOR = (1.0, 1.0, 1.0)
LIGHT_POS = (1.2, 1.0, 2.0)
AMBIENT_STRENGTH = 0.1
SPECULAR_STRENGTH = 0.5
SHININESS = 32


def _mm(a, b):
    """f32 matmul at full precision.

    On TPU the default f32 matmul precision routes through bf16 MXU passes;
    vertex transforms are tiny (4×4 against the vertex batch) but their
    error lands directly in clip w / screen positions — measured rel ~3e-4
    on depth, visibly shifting bilinear texel blends. Geometry is
    contractual, so pin HIGHEST here (and in any custom vertex shader)."""
    return jnp.matmul(a, b, precision="highest")


def _mat_vec4(m, p):
    """Row-major (4,4)·(4,) as sequential mul/add chains — the C++
    reference's ``mat4_mul_v4`` evaluation order (fr_native.cpp:60-67),
    exact f32. Under vmap this lowers to elementwise VPU chains; a batched
    (N,4)@(4,4) matmul wastes 124/128 of the MXU on both K and N and at
    full precision cost ~66 ms of the 1M-vertex stress4k geometry stage."""
    return jnp.stack(
        [
            ((m[i, 0] * p[0] + m[i, 1] * p[1]) + m[i, 2] * p[2])
            + m[i, 3] * p[3]
            for i in range(4)
        ]
    )


def _mvp_transform(u, pos3):
    mvp = _mm(u["proj"], _mm(u["view"], u["model"]))
    p = jnp.concatenate([jnp.asarray(pos3, jnp.float32), jnp.ones((1,), jnp.float32)])
    return _mat_vec4(mvp, p), p


class FlatShader:
    """Per-face constant color: context carries an rgba color attribute."""

    @staticmethod
    def vertex(u, vin):
        clip, _ = _mvp_transform(u, vin["pos"])
        return clip, {"color": jnp.asarray(vin["color"], jnp.float32)}

    @staticmethod
    def pixel(u, ctx, ps_index):
        return ctx["color"]


FlatShader.pixel.fused_kind = "flat"


def _phong_lighting(normal, world_pos, view_pos, light_pos, light_color):
    """The phong.rs:133-144 lighting sum (ambient + lambert + specular).

    Batch-polymorphic: inputs may carry leading pixel dims; all reductions
    are over the last axis (the pipeline shades whole frames in one call —
    shade.py — rather than vmapping per pixel).
    """
    lc = jnp.asarray(light_color, jnp.float32)
    lp = jnp.asarray(light_pos, jnp.float32)
    ambient = lc * AMBIENT_STRENGTH
    n = normalize(normal)
    light_dir = normalize(lp - world_pos)
    diff = jnp.maximum(jnp.sum(n * light_dir, axis=-1, keepdims=True), 0.0)
    diffuse = diff * lc
    view_dir = normalize(view_pos - world_pos)
    reflect_dir = reflect(-light_dir, n)
    spec = (
        jnp.maximum(jnp.sum(view_dir * reflect_dir, axis=-1, keepdims=True), 0.0)
        ** SHININESS
    )
    specular = SPECULAR_STRENGTH * spec * lc
    return ambient + diffuse + specular


def make_phong_shaders(light_pos=LIGHT_POS, light_color=LIGHT_COLOR):
    """Textured per-pixel Phong (phong.rs:114-154).

    vs_uniform: {"model", "view", "proj"} (4,4) each.
    vs_input:   {"pos" (3,), "uv" (2,), "normal" (3,)}.
    ps_uniform: {"textures": TextureStack, "view_pos" (3,)}.
    """

    def vertex(u, vin):
        clip, p = _mvp_transform(u, vin["pos"])
        world = _mat_vec4(u["model"], p)
        return clip, {
            "uv": jnp.asarray(vin["uv"], jnp.float32),
            "normal": jnp.asarray(vin["normal"], jnp.float32),
            "pos": world[:3],
        }

    def pixel(u, ctx, ps_index):
        light = _phong_lighting(
            ctx["normal"], ctx["pos"], u["view_pos"], light_pos, light_color
        )
        color = u["textures"].sample(ps_index, ctx["uv"])
        one = jnp.ones_like(light[..., :1])
        return color * jnp.concatenate([light, one], axis=-1)

    # metadata for the fused single-kernel path (pipeline/fused.py)
    pixel.fused_kind = "phong"
    pixel.light_pos = tuple(light_pos)
    pixel.light_color = tuple(light_color)
    return vertex, pixel


def make_textured_shaders():
    """Unlit perspective-correct textured (BASELINE config #3)."""

    def vertex(u, vin):
        clip, _ = _mvp_transform(u, vin["pos"])
        return clip, {"uv": jnp.asarray(vin["uv"], jnp.float32)}

    def pixel(u, ctx, ps_index):
        return u["textures"].sample(ps_index, ctx["uv"])

    pixel.fused_kind = "textured"
    return vertex, pixel


def make_gouraud_shaders(light_pos=LIGHT_POS, light_color=LIGHT_COLOR):
    """Vertex-lit Gouraud (BASELINE config #2): the Phong lighting sum
    evaluated per vertex and interpolated as a color varying."""

    def vertex(u, vin):
        clip, p = _mvp_transform(u, vin["pos"])
        world = _mat_vec4(u["model"], p)
        light = _phong_lighting(
            jnp.asarray(vin["normal"], jnp.float32),
            world[:3],
            u["view_pos"],
            light_pos,
            light_color,
        )
        base = jnp.asarray(vin.get("color", jnp.ones(3)), jnp.float32)
        return clip, {"color": base * light}

    def pixel(u, ctx, ps_index):
        one = jnp.ones_like(ctx["color"][..., :1])
        return jnp.concatenate([ctx["color"], one], axis=-1)

    pixel.fused_kind = "gouraud"
    pixel.light_pos = tuple(light_pos)
    pixel.light_color = tuple(light_color)
    return vertex, pixel
