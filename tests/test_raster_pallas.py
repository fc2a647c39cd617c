"""Pallas raster kernel (interpret mode on CPU) vs the jnp rasterizer.

The two implement identical math; winner ids must match exactly and depth
bitwise-close. Real-TPU execution is exercised by bench.py / examples.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.pipeline.geometry import geometry_process
from f_renderer_tpu.pipeline.raster_jnp import rasterize_jnp
from f_renderer_tpu.pipeline.raster_pallas import rasterize_pallas

W, H = 160, 96


def make_buffer(rng, n_faces=25, spread=1.2):
    from f_renderer_tpu.math import set_perspective

    mvp = np.asarray(set_perspective(np.pi * 0.25, W / H, 0.1, 50.0), np.float32)

    def vs(u, vin):
        pos = jnp.asarray(vin["pos"], jnp.float32)
        clip = u["mvp"] @ jnp.concatenate([pos, jnp.ones((1,), jnp.float32)])
        return clip, {"uv": jnp.asarray(vin["uv"], jnp.float32)}

    centers = rng.uniform([-1.0, -1.0, 0.5], [1.0, 1.0, 8.0], (n_faces, 3))
    offsets = rng.uniform(-spread, spread, (n_faces, 3, 3))
    pos = (centers[:, None, :] + offsets).astype(np.float32)
    uv = rng.random((n_faces, 3, 2)).astype(np.float32)
    buf, _ = geometry_process(
        {"pos": jnp.asarray(pos), "uv": jnp.asarray(uv)},
        vs,
        {"mvp": jnp.asarray(mvp)},
        W,
        H,
        clip_cap=32,
    )
    return buf


def assert_same(buf, **kw):
    winner_j, depth_j = rasterize_jnp(buf, W, H)
    winner_p, depth_p = rasterize_pallas(buf, W, H, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(winner_p), np.asarray(winner_j))
    np.testing.assert_allclose(
        np.asarray(depth_p), np.asarray(depth_j), rtol=1e-6, atol=1e-7
    )


def test_matches_jnp(rng):
    buf = make_buffer(rng)
    assert_same(buf)


def test_matches_jnp_small_chunks(rng):
    # Small chunk size forces many chunk-skip decisions and DMA rounds.
    buf = make_buffer(rng)
    assert_same(buf, chunk=128, tile=(32, 128))


def test_empty_buffer():
    import jax

    buf = make_buffer(np.random.default_rng(0), n_faces=1)
    buf = jax.tree.map(lambda x: x, buf)
    buf = buf.__class__(
        spi=buf.spi,
        spf=buf.spf,
        rhw=buf.rhw,
        ctx=buf.ctx,
        top_left=buf.top_left,
        valid=jnp.zeros_like(buf.valid),
        order=buf.order,
        ps_index=buf.ps_index,
    )
    winner_p, depth_p = rasterize_pallas(buf, W, H, interpret=True)
    assert (np.asarray(winner_p) == -1).all()
    assert (np.asarray(depth_p) == 0).all()
