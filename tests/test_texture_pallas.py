"""Pallas packed-RGBA8 texture sampler (interpret mode) vs the XLA sampler."""

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.shaders import texture as texture_mod
from f_renderer_tpu.shaders.texture import TextureStack
from f_renderer_tpu.shaders.texture_pallas import sample_bilinear_pallas


def make_stack(rng, t=3, h=64, w=64):
    texs = [rng.random((h, w, 4)).astype(np.float32) for _ in range(t)]
    return TextureStack.create(texs)


def xla_sample(stack, idx, uv):
    old = texture_mod.USE_PALLAS_SAMPLER
    texture_mod.USE_PALLAS_SAMPLER = False
    try:
        return stack.sample(jnp.asarray(idx), jnp.asarray(uv))
    finally:
        texture_mod.USE_PALLAS_SAMPLER = old


def pallas_sample(stack, idx, uv):
    return sample_bilinear_pallas(
        stack.packed,
        stack.dims,
        jnp.asarray(idx),
        jnp.asarray(uv),
        hmax=int(stack.data.shape[1]),
        pages=stack.pages,
        interpret=True,
    )


def test_matches_xla_sampler(rng):
    stack = make_stack(rng)
    idx = jnp.asarray(rng.integers(0, 3, (17, 33)), jnp.int32)
    uv = jnp.asarray(rng.random((17, 33, 2)), jnp.float32)
    ref = np.asarray(xla_sample(stack, idx, uv))
    out = np.asarray(pallas_sample(stack, idx, uv))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "mode", ["rows", "taps", "taps2", "taps8", "grp", "grp2"]
)
def test_tap_modes_match_oracle(rng, mode):
    """Every inner-loop formulation (incl. the unrolled tapsU variants,
    whose tail duplicates rely on idempotent selects) matches the XLA
    sampler — multi-page stack so the flattened (row, page) indexing is
    exercised."""
    from f_renderer_tpu.shaders import texture_pallas

    # 13 rows: not a multiple of 8 — exercises the page-major layout's
    # 8-row padding (texture.py:hmax_padded) under every mode.
    stack = TextureStack.create(
        [
            rng.random((13, 200, 4)).astype(np.float32),
            rng.random((48, 96, 4)).astype(np.float32),
        ]
    )
    assert stack.pages == 2
    idx = jnp.asarray(rng.integers(-1, 2, (11, 64)), jnp.int32)
    uv = jnp.asarray(rng.random((11, 64, 2)), jnp.float32)
    ref = np.asarray(xla_sample(stack, idx, uv))
    old = texture_pallas.TAP_MODE
    texture_pallas.TAP_MODE = mode
    try:
        out = np.asarray(pallas_sample(stack, idx, uv))
    finally:
        texture_pallas.TAP_MODE = old
    valid = np.asarray(idx) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=1e-6, atol=1e-6)


def test_wide_texture_pages(rng):
    # Wmax = 300 → 3 lane pages; mixed widths exercise per-texture ranges.
    stack = TextureStack.create(
        [
            rng.random((40, 300, 4)).astype(np.float32),
            rng.random((64, 190, 4)).astype(np.float32),
        ]
    )
    assert stack.pages == 3
    idx = jnp.asarray(rng.integers(0, 2, (9, 130)), jnp.int32)
    uv = jnp.asarray(rng.random((9, 130, 2)), jnp.float32)
    ref = np.asarray(xla_sample(stack, idx, uv))
    out = np.asarray(pallas_sample(stack, idx, uv))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_u8_quantization_roundtrip():
    # u8 input texels survive create() exactly (reference textures are u8).
    q = (np.arange(16 * 16 * 4, dtype=np.uint32) % 256).astype(np.uint8)
    tex = q.reshape(16, 16, 4)
    stack = TextureStack.create([tex])
    back = np.clip(
        np.round(np.asarray(stack.data[0]) * 255.0), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(back, tex)


def test_out_of_range_uv_and_invalid(rng):
    stack = make_stack(rng, t=2, h=16, w=16)
    idx = jnp.asarray([[0, 1, -1, 0]], jnp.int32)
    uv = jnp.asarray(
        [[[1.5, -0.5], [2.0, 2.0], [0.3, 0.3], [-1.0, 0.99]]], jnp.float32
    )
    ref = np.asarray(xla_sample(stack, idx, uv))
    out = np.asarray(pallas_sample(stack, idx, uv))
    valid = np.asarray(idx) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=1e-6, atol=1e-6)


def test_nonsquare_clamp_quirk(rng):
    # h=32, w=16: the y clamp uses width (renderer.rs:523-525)
    stack = TextureStack.create([rng.random((32, 16, 4)).astype(np.float32)])
    idx = jnp.zeros((4, 8), jnp.int32)
    uv = jnp.asarray(rng.random((4, 8, 2)), jnp.float32)
    ref = np.asarray(xla_sample(stack, idx, uv))
    out = np.asarray(pallas_sample(stack, idx, uv))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
