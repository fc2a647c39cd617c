"""Shader context flattening.

The pipeline lerps/interpolates varyings as flat (C,) f32 vectors (the
reference's Add/Sub/Mul<f32> trait bound, renderer.rs:97-102, collapses to
vector arithmetic). User shaders see structured pytrees; the codec maps
between the two with static shapes derived via eval_shape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ContextCodec:
    treedef: Any
    shapes: tuple
    num_channels: int

    def flatten(self, tree) -> jnp.ndarray:
        leaves = jax.tree.flatten(tree)[0]
        if not leaves:
            return jnp.zeros((0,), jnp.float32)
        return jnp.concatenate(
            [jnp.ravel(jnp.asarray(l, jnp.float32)) for l in leaves]
        )

    def unflatten(self, flat: jnp.ndarray):
        """Inverse of flatten; ``flat`` may carry leading batch dims (..., C)."""
        batch = tuple(flat.shape[:-1])
        leaves = []
        i = 0
        for sh in self.shapes:
            n = math.prod(sh) if sh else 1
            leaves.append(flat[..., i : i + n].reshape(batch + sh))
            i += n
        return jax.tree.unflatten(self.treedef, leaves)


def make_context_codec(
    vertex_shader: Callable, vs_uniform, example_input
) -> ContextCodec:
    """Derive the context pytree structure from one abstract shader eval."""
    _, ctx_shape = jax.eval_shape(vertex_shader, vs_uniform, example_input)
    leaves, treedef = jax.tree.flatten(ctx_shape)
    shapes = tuple(tuple(l.shape) for l in leaves)
    num = sum(math.prod(s) if s else 1 for s in shapes)
    return ContextCodec(treedef=treedef, shapes=shapes, num_channels=num)
