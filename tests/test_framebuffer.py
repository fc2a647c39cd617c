"""Tests for framebuffer/texture ops (reference: renderer.rs:7-24, 477-588)."""

import numpy as np
import pytest

from f_renderer_tpu.framebuffer import FrameBuffer, sample_2d, u8_to_vec4, vec4_to_u8


def test_vec4_u8_roundtrip_and_clamp():
    v = np.array([[0.0, 1.0, 0.5, 2.0], [-1.0, 0.25, 0.999, 1.0]], np.float32)
    u = vec4_to_u8(v)
    assert u.dtype == np.uint8
    # (0.5*255)=127.5 truncates to 127 (Rust `as u8`), clamp at 255/0.
    np.testing.assert_array_equal(u, [[0, 255, 127, 255], [0, 63, 254, 255]])
    back = u8_to_vec4(np.array([0, 255, 128, 64], np.uint8))
    np.testing.assert_allclose(back, [0.0, 1.0, 128 / 255, 64 / 255], rtol=1e-6)


def test_fill_and_pixels():
    fb = FrameBuffer(4, 3)
    fb.fill([10, 20, 30, 255])
    np.testing.assert_array_equal(fb.get_pixel(2, 1), [10, 20, 30, 255])
    fb.set_pixel(3, 2, [1, 2, 3, 4])
    np.testing.assert_array_equal(fb.buffer[2, 3], [1, 2, 3, 4])
    fb.clear()
    assert fb.buffer.sum() == 0


def test_sample_2d_texel_centers_and_bilinear():
    # 2x2 texture: distinct corners.
    tex = np.zeros((2, 2, 4), np.float32)
    tex[0, 0] = [1, 0, 0, 1]
    tex[0, 1] = [0, 1, 0, 1]
    tex[1, 0] = [0, 0, 1, 1]
    tex[1, 1] = [1, 1, 1, 1]
    # uv (0,0) → x=y=0, fract 0 → pure texel (0,0).
    out = sample_2d(tex, np.array([0.0, 0.0], np.float32))
    np.testing.assert_allclose(out, [1, 0, 0, 1], atol=1e-6)
    # uv (0.25, 0.25) → x=y=0.5 → fract 0.5 → average of all four texels
    # (x1=0, x2=1).
    out = sample_2d(tex, np.array([0.25, 0.25], np.float32))
    np.testing.assert_allclose(out, [0.5, 0.5, 0.5, 1.0], atol=1e-6)


def test_sample_2d_width_clamp_quirk():
    # Non-square texture: H=4, W=2. The reference clamps y with width-1=1
    # (renderer.rs:523-525), so v near the bottom reads row 1, not row 3.
    tex = np.zeros((4, 2, 4), np.float32)
    tex[1] = 0.25
    tex[3] = 1.0
    uv = np.array([0.0, 0.9], np.float32)  # y = 3.6 → clamped to 1 with quirk
    out_quirk = sample_2d(tex, uv, replicate_clamp_bug=True)
    out_fixed = sample_2d(tex, uv, replicate_clamp_bug=False)
    np.testing.assert_allclose(out_quirk, [0.25] * 4, atol=1e-6)
    np.testing.assert_allclose(out_fixed, [1.0] * 4, atol=1e-6)


def test_sample_2d_batched_shape():
    tex = np.random.default_rng(0).random((8, 8, 4)).astype(np.float32)
    uv = np.random.default_rng(1).random((5, 7, 2)).astype(np.float32)
    out = sample_2d(tex, uv)
    assert out.shape == (5, 7, 4)


def test_draw_line_endpoints_and_quirk():
    fb = FrameBuffer(16, 16)
    c = [255, 0, 0, 255]
    fb.draw_line(2, 2, 10, 5, c)
    # Start pixel painted; exclusive loop + final set_pixel paints (x2, y2).
    np.testing.assert_array_equal(fb.buffer[2, 2], c)
    np.testing.assert_array_equal(fb.buffer[5, 10], c)
    # Negative-slope mirror quirk: endpoints sorted independently, so
    # (10,2)-(2,5) draws the same pixels as (2,2)-(10,5).
    fb2 = FrameBuffer(16, 16)
    fb2.draw_line(10, 2, 2, 5, c)
    np.testing.assert_array_equal(fb.buffer, fb2.buffer)


def test_golden_and_jnp_sample_agree():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    tex = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    texf = tex.astype(np.float32) / 255.0
    uv = rng.random((64, 2)).astype(np.float32)
    out_np = sample_2d(texf, uv)
    out_jnp = np.asarray(sample_2d(jnp.asarray(texf), jnp.asarray(uv)))
    np.testing.assert_allclose(out_np, out_jnp, atol=1e-5)
