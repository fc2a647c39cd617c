"""Texture stack for deferred multi-texture shading.

The reference's pixel shader picks one of several ``FrameBuffer`` textures
via a per-triangle enum (phong.rs:147-151). With deferred shading the
texture index is a per-pixel value, so textures live in one padded
(T, Hmax, Wmax, 4) f32 stack indexed by gather. Sampling reproduces
FrameBuffer::sample_2d (renderer.rs:516-538) including the width-clamp
quirk (SURVEY.md §7.3.7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureStack:
    data: jnp.ndarray  # (T, Hmax, Wmax, 4) f32 in [0,1]
    dims: jnp.ndarray  # (T, 2) i32 — (height, width) per texture

    @staticmethod
    def create(textures, *, dtype=jnp.float32) -> "TextureStack":
        """Build from a list of (H, W, 4) u8 or float arrays."""
        texf = []
        for t in textures:
            t = np.asarray(t)
            if t.dtype == np.uint8:
                t = t.astype(np.float32) / 255.0
            texf.append(t.astype(np.float32))
        hmax = max(t.shape[0] for t in texf)
        wmax = max(t.shape[1] for t in texf)
        data = np.zeros((len(texf), hmax, wmax, 4), np.float32)
        dims = np.zeros((len(texf), 2), np.int32)
        for i, t in enumerate(texf):
            data[i, : t.shape[0], : t.shape[1]] = t
            dims[i] = (t.shape[0], t.shape[1])
        return TextureStack(
            data=jnp.asarray(data, dtype), dims=jnp.asarray(dims)
        )

    def sample(self, index, uv, *, replicate_clamp_bug: bool = True):
        """Bilinear sample texture `index` at `uv` (scalars; vmap over pixels).

        Texel fetches use a single flattened index into a (T·Hmax·Wmax, 4)
        view — one-axis gathers batch well under vmap on TPU, whereas the
        multi-dim ``data[index, y, x]`` form lowers to a gather that runs
        ~8× slower (measured on v5e; baselines/profile_texture.py).
        """
        h = self.dims[index, 0]
        w = self.dims[index, 1]
        x = uv[0] * w.astype(jnp.float32)
        y = uv[1] * h.astype(jnp.float32)
        a = x - jnp.trunc(x)
        b = y - jnp.trunc(y)
        y_hi = (w if replicate_clamp_bug else h) - 1
        x = jnp.where(jnp.isnan(x), 0.0, x)
        y = jnp.where(jnp.isnan(y), 0.0, y)
        x1 = jnp.clip(jnp.trunc(x), 0, w - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.trunc(y), 0, y_hi).astype(jnp.int32)
        x2 = jnp.clip(x1 + 1, 0, w - 1)
        y2 = jnp.clip(y1 + 1, 0, y_hi)
        hmax, wmax = self.data.shape[1], self.data.shape[2]
        flat = self.data.reshape(-1, self.data.shape[-1])
        base = index * (hmax * wmax)

        def tap(yy, xx):
            return jnp.take(flat, base + yy * wmax + xx, axis=0).astype(
                jnp.float32
            )

        return (
            tap(y1, x1) * (1.0 - a) * (1.0 - b)
            + tap(y2, x1) * (1.0 - a) * b
            + tap(y1, x2) * a * (1.0 - b)
            + tap(y2, x2) * a * b
        )
