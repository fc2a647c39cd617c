"""Programmable shader API + built-in shaders.

The reference's shaders are user closures on the host (renderer.rs:105,283)
with a user varying struct required to support Add/Sub/Mul<f32>
(renderer.rs:97-102). Here shaders are JAX-traceable functions over pytree
"contexts" (tree arithmetic replaces the trait bound):

  vertex_shader(vs_uniform, vs_input_pytree) -> (clip_pos (4,), context_pytree)
  pixel_shader(ps_uniform, context_pytree, ps_index) -> rgba (4,) f32

Built-ins reproduce the reference examples: flat, Gouraud, textured,
Phong (constants from phong.rs:128-154).
"""

from f_renderer_tpu.shaders.api import ContextCodec, make_context_codec
from f_renderer_tpu.shaders.texture import TextureStack
from f_renderer_tpu.shaders.builtin import (
    FlatShader,
    make_gouraud_shaders,
    make_phong_shaders,
    make_textured_shaders,
)

__all__ = [
    "ContextCodec",
    "make_context_codec",
    "TextureStack",
    "FlatShader",
    "make_gouraud_shaders",
    "make_phong_shaders",
    "make_textured_shaders",
]
