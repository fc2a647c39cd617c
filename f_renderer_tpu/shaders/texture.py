"""Texture stack for deferred multi-texture shading.

The reference's pixel shader picks one of several ``FrameBuffer`` textures
via a per-triangle enum (phong.rs:147-151). With deferred shading the
texture index is a per-pixel value, so textures live in one padded
(T, Hmax, Wmax, 4) f32 stack indexed by gather. Sampling reproduces
FrameBuffer::sample_2d (renderer.rs:516-538) including the width-clamp
quirk (SURVEY.md §7.3.7).

Storage is u8-backed like the reference (FrameBuffer textures are RGBA8
byte buffers, renderer.rs:411-425; load_file decodes u8 images,
renderer.rs:427-471): ``create`` quantizes float inputs to u8 once, so
every texel value is k/255. Two device representations are kept:

- ``data``  (T, Hmax, Wmax, 4) f32 — the XLA gather path / golden oracle.
- ``packed`` (T·pages·Hmax8, 128) i32 — RGBA8 packed per texel, the x axis
  split into ``pages`` lanes-of-128 pages, PAGE-MAJOR with 8-row-aligned
  blocks (flat row = (t·pages + page)·Hmax8 + y, Hmax8 = hmax_padded(Hmax);
  see pack_rgba8). This is what Pallas kernels keep in VMEM:
  4 bytes/texel instead of 16, and any texture width (the r1 fused path was
  limited to 128-px-wide textures).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128

# Pallas sampler dispatch: None = auto (TPU backend, batched call, packed
# stack fits the VMEM budget), True/False = force. See texture_pallas.py.
USE_PALLAS_SAMPLER: bool | None = None

# VMEM the packed stack may occupy in a kernel before falling back to the
# XLA path (v5e has ~16 MB more-or-less free after tile working sets).
PACKED_VMEM_BUDGET = 8 * 1024 * 1024


def _pallas_sampler_ok(stack, index) -> bool:
    if USE_PALLAS_SAMPLER is not None:
        return USE_PALLAS_SAMPLER
    return (
        index.ndim >= 1
        and stack.packed_nbytes <= PACKED_VMEM_BUDGET
        and jax.default_backend() == "tpu"
    )


def hmax_padded(hmax: int) -> int:
    """Texture rows padded to a sublane multiple (8) so the packed stack's
    per-(texture, page) blocks are 8-row aligned — the grp sampler mode
    loads (8, 128) tiles at aligned dynamic offsets."""
    return -(-max(hmax, 1) // 8) * 8


def pack_rgba8(q: np.ndarray) -> np.ndarray:
    """(T, Hmax, Wmax, 4) u8 → (T·pages·Hmax8, 128) i32 paged packed texels.

    PAGE-MAJOR layout: flat row = (t·pages + page)·Hmax8 + y with Hmax8 =
    Hmax padded to a multiple of 8 (zero texels). Same-page texel rows are
    contiguous and every (texture, page) block starts 8-row aligned, so a
    sampler can both restrict its loop to the touched page range and load
    aligned (8, 128) row groups. (r1-r4 used row-major y·pages + page.)
    """
    t, hmax, wmax = q.shape[:3]
    pages = -(-max(wmax, 1) // LANES)
    hmax8 = hmax_padded(hmax)
    qq = np.zeros((t, hmax8, pages * LANES, 4), np.uint32)
    qq[:, :hmax, :wmax] = q
    packed = (
        qq[..., 0] | (qq[..., 1] << 8) | (qq[..., 2] << 16) | (qq[..., 3] << 24)
    ).astype(np.uint32)
    # (t, hmax8, pages, 128) → (t, pages, hmax8, 128)
    packed = packed.reshape(t, hmax8, pages, LANES).transpose(0, 2, 1, 3)
    return packed.reshape(t * pages * hmax8, LANES).view(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureStack:
    data: jnp.ndarray  # (T, Hmax, Wmax, 4) f32 in [0,1], u8-backed
    dims: jnp.ndarray  # (T, 2) i32 — (height, width) per texture
    packed: jnp.ndarray  # (T·pages·Hmax8, 128) i32 — RGBA8, page-major
    # Static: every real texel's alpha is 255 (the common case — image
    # diffuse maps). Lets the pallas sampler accumulate alpha as the plain
    # weight sum (exactly w·1.0 per tap) instead of unpacking the byte.
    opaque: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def pages(self) -> int:
        """Lanes-of-128 pages per texture row (static)."""
        t, hmax = self.data.shape[0], self.data.shape[1]
        return self.packed.shape[0] // (t * hmax_padded(hmax))

    @property
    def packed_nbytes(self) -> int:
        return int(self.packed.shape[0]) * LANES * 4

    @staticmethod
    def create(textures, *, dtype=jnp.float32) -> "TextureStack":
        """Build from a list of (H, W, 4) u8 or float arrays.

        Float inputs are quantized to u8 once (the reference has no float
        textures — they come from u8 image files), so the f32 and packed
        representations describe identical texel values.
        """
        texq = []
        for t in textures:
            t = np.asarray(t)
            if t.dtype != np.uint8:
                t = np.clip(np.round(t.astype(np.float32) * 255.0), 0, 255).astype(
                    np.uint8
                )
            texq.append(t)
        hmax = max(t.shape[0] for t in texq)
        wmax = max(t.shape[1] for t in texq)
        q = np.zeros((len(texq), hmax, wmax, 4), np.uint8)
        dims = np.zeros((len(texq), 2), np.int32)
        for i, t in enumerate(texq):
            q[i, : t.shape[0], : t.shape[1]] = t
            dims[i] = (t.shape[0], t.shape[1])
        data = q.astype(np.float32) / 255.0
        return TextureStack(
            data=jnp.asarray(data, dtype),
            dims=jnp.asarray(dims),
            packed=jnp.asarray(pack_rgba8(q)),
            opaque=all(bool((t[..., 3] == 255).all()) for t in texq),
        )

    @staticmethod
    def from_data(data, dims) -> "TextureStack":
        """Rebuild from a padded (T, Hmax, Wmax, 4) f32 stack + dims
        (deserialization path — data values must be u8-backed, k/255)."""
        q = np.clip(
            np.round(np.asarray(data, np.float32) * 255.0), 0, 255
        ).astype(np.uint8)
        dims = np.asarray(dims, np.int32)
        opaque = all(
            bool((q[i, : dims[i, 0], : dims[i, 1], 3] == 255).all())
            for i in range(q.shape[0])
        )
        return TextureStack(
            data=jnp.asarray(data, jnp.float32),
            dims=jnp.asarray(dims),
            packed=jnp.asarray(pack_rgba8(q)),
            opaque=opaque,
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
        if _pallas_sampler_ok(self, index):
            from f_renderer_tpu.shaders.texture_pallas import (
                sample_bilinear_pallas,
            )

            return sample_bilinear_pallas(
                self.packed,
                self.dims,
                index,
                jnp.asarray(uv, jnp.float32),
                hmax=int(self.data.shape[1]),
                pages=self.pages,
                replicate_clamp_bug=replicate_clamp_bug,
                opaque=self.opaque,
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
        hmax, wmax = self.data.shape[1], self.data.shape[2]
        x1 = jnp.clip(jnp.trunc(x), 0, w - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.trunc(y), 0, y_hi).astype(jnp.int32)
        x2 = jnp.clip(x1 + 1, 0, w - 1)
        y2 = jnp.clip(y1 + 1, 0, y_hi)
        # Where the width-clamp quirk sends y past the texture height the
        # reference panics (renderer.rs:505-514 index OOB); we clamp to the
        # stack's row extent so all paths return the same defined value.
        y1 = jnp.minimum(y1, hmax - 1)
        y2 = jnp.minimum(y2, hmax - 1)
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
