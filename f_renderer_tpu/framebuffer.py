"""FrameBuffer / texture operations (reference: renderer.rs:7-24, 411-589).

Color buffers are ``(H, W, 4)`` uint8 arrays (row y, column x — matching the
reference's ``offset = y*W*4 + x*4`` layout, renderer.rs:496-514). Depth
buffers are ``(H, W)`` float32 holding **rhw = 1/w**, cleared to 0.0, larger
= closer (reversed-z; renderer.rs:360-366, phong.rs:317).

Device-side pipeline code operates on raw arrays; the :class:`FrameBuffer`
class is a host-side convenience wrapper providing the reference's mutable
API (fill/set_pixel/get_pixel/draw_line) for tools and tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def vec4_to_u8(color):
    """float RGBA → u8 with clamp then truncating cast (renderer.rs:7-14).

    Rust's ``as u8`` truncates toward zero; so does astype(uint8) after clip.
    Works on any (..., 4) float array (jnp or numpy).
    """
    xp = jnp if isinstance(color, jnp.ndarray) else np
    return xp.clip(color * 255.0, 0.0, 255.0).astype(xp.uint8)


def u8_to_vec4(color):
    """u8 RGBA → float RGBA in [0,1] (renderer.rs:16-24)."""
    xp = jnp if isinstance(color, jnp.ndarray) else np
    return color.astype(xp.float32) / 255.0


def sample_2d(texture, uv, *, replicate_clamp_bug: bool = True):
    """Bilinear texture sample (renderer.rs:516-538), vectorized over pixels.

    ``texture``: (H, W, 4) float32 in [0,1] (texel values are u8/255, so
    storing floats is exact). ``uv``: (..., 2) float32. Returns (..., 4).

    Reference quirks replicated when ``replicate_clamp_bug`` (renderer.rs:523-525):
    the y texel coordinates are clamped with **width**, not height (observable
    only on non-square textures), and there is no wrap mode. Fractional weights
    use Rust ``fract()`` = x - trunc(x).
    """
    xp = jnp if isinstance(texture, jnp.ndarray) or isinstance(uv, jnp.ndarray) else np
    texture = xp.asarray(texture, xp.float32)
    uv = xp.asarray(uv, xp.float32)
    h, w = texture.shape[0], texture.shape[1]

    x = uv[..., 0] * w
    y = uv[..., 1] * h
    a = x - xp.trunc(x)
    b = y - xp.trunc(y)

    y_hi = (w if replicate_clamp_bug else h) - 1
    # Rust `as u32` saturates; clip before the cast.
    x1 = xp.clip(xp.trunc(x), 0, w - 1).astype(xp.int32)
    y1 = xp.clip(xp.trunc(y), 0, y_hi).astype(xp.int32)
    x2 = xp.clip(x1 + 1, 0, w - 1)
    y2 = xp.clip(y1 + 1, 0, y_hi)

    c11 = texture[y1, x1]
    c12 = texture[y2, x1]
    c21 = texture[y1, x2]
    c22 = texture[y2, x2]
    a = a[..., None]
    b = b[..., None]
    return (
        c11 * (1.0 - a) * (1.0 - b)
        + c12 * (1.0 - a) * b
        + c21 * a * (1.0 - b)
        + c22 * a * b
    )


class FrameBuffer:
    """Host-side RGBA8 framebuffer with the reference's API (renderer.rs:411-589)."""

    def __init__(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)
        self.buffer = np.zeros((self.height, self.width, 4), dtype=np.uint8)

    @staticmethod
    def from_array(array) -> "FrameBuffer":
        array = np.asarray(array)
        fb = FrameBuffer(array.shape[1], array.shape[0])
        fb.buffer = array.astype(np.uint8).copy()
        return fb

    def clear(self) -> None:
        """renderer.rs:477-479."""
        self.buffer.fill(0)

    def fill(self, color) -> None:
        """Fill every pixel with an RGBA u8 color (renderer.rs:485-494)."""
        self.buffer[:] = np.asarray(color, np.uint8)

    def set_pixel(self, x: int, y: int, color) -> None:
        """renderer.rs:496-503."""
        self.buffer[y, x] = np.asarray(color, np.uint8)

    def get_pixel(self, x: int, y: int):
        """renderer.rs:505-514."""
        return self.buffer[y, x].copy()

    def sample_2d(self, uv):
        """Bilinear sample of this buffer as a texture (renderer.rs:516-538)."""
        return sample_2d(u8_to_vec4(self.buffer), np.asarray(uv, np.float32))

    def draw_line(self, x1: int, y1: int, x2: int, y2: int, color) -> None:
        """Bresenham-style line (renderer.rs:540-588).

        Reference quirk replicated: x and y endpoints are sorted
        *independently* (renderer.rs:541-542), so negative-slope lines are
        mirrored into positive slope.
        """
        color = np.asarray(color, np.uint8)
        x1, x2 = (x1, x2) if x1 < x2 else (x2, x1)
        y1, y2 = (y1, y2) if y1 < y2 else (y2, y1)
        if x1 == x2 and y1 == y2:
            self.set_pixel(x1, y1, color)
        elif x1 == x2:
            for y in range(y1, y2):
                self.set_pixel(x1, y, color)
        elif y1 == y2:
            for x in range(x1, x2):
                self.set_pixel(x, y1, color)
        else:
            dx = x2 - x1
            dy = y2 - y1
            rem = 0
            if dx > dy:
                y = y1
                for x in range(x1, x2):
                    self.set_pixel(x, y, color)
                    rem += dy
                    if rem >= dx:
                        y += 1
                        rem -= dx
                        self.set_pixel(x, y, color)
                self.set_pixel(x2, y2, color)
            else:
                x = x1
                for y in range(y1, y2):
                    self.set_pixel(x, y, color)
                    rem += dx
                    if rem >= dy:
                        x += 1
                        rem -= dy
                        self.set_pixel(x, y, color)
                self.set_pixel(x2, y2, color)
