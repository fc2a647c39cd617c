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

# Pallas sampler dispatch: None = auto (TPU backend, batched call, texture
# width ≤ 128 lanes), True/False = force. See texture_pallas.py.
USE_PALLAS_SAMPLER: bool | None = None


def _pallas_sampler_ok(data, index) -> bool:
    if USE_PALLAS_SAMPLER is not None:
        return USE_PALLAS_SAMPLER
    return (
        index.ndim >= 1
        and data.shape[2] <= 128
        and jax.default_backend() == "tpu"
    )


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
        """Bilinear sample; batched or scalar (``index`` (...,), ``uv`` (..., 2)).

        TPU notes (measured, baselines/profile_texture.py / profile_shade2.py):
        texel fetches use a single flattened index into a (T·Hmax·Wmax, 4)
        view — one-axis gathers lower well, whereas the multi-dim
        ``data[index, y, x]`` form runs ~8× slower; and the per-pixel (T, 2)
        dims lookup is a static unrolled select, because gathering it costs
        ~5× the whole sampling.

        On TPU with batched inputs, dispatches to the Pallas in-VMEM sampler
        (texture_pallas.py) — ~10× the XLA gather path.
        """
        index = jnp.asarray(index)
        if _pallas_sampler_ok(self.data, index):
            from f_renderer_tpu.shaders.texture_pallas import (
                sample_bilinear_pallas,
            )

            return sample_bilinear_pallas(
                self.data.astype(jnp.float32),
                self.dims,
                index,
                jnp.asarray(uv, jnp.float32),
                replicate_clamp_bug=replicate_clamp_bug,
            )
        h = jnp.int32(0)
        w = jnp.int32(0)
        for t in range(self.data.shape[0]):
            sel = index == t
            h = jnp.where(sel, self.dims[t, 0], h)
            w = jnp.where(sel, self.dims[t, 1], w)
        x = uv[..., 0] * w.astype(jnp.float32)
        y = uv[..., 1] * h.astype(jnp.float32)
        a = (x - jnp.trunc(x))[..., None]
        b = (y - jnp.trunc(y))[..., None]
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
