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


@pytest.mark.parametrize("form", ["and", "or"])
def test_cover_forms_match_jnp(rng, form):
    """Both cover-test formulations (five-compare AND chain / sign-bit OR
    fold) reproduce the oracle — they are boolean-identical by the
    non-negativity/sign argument at raster_pallas._COVER_FORM."""
    from f_renderer_tpu.pipeline import raster_pallas

    buf = make_buffer(rng)
    old = raster_pallas._COVER_FORM
    raster_pallas._COVER_FORM = form
    try:
        assert_same(buf)
    finally:
        raster_pallas._COVER_FORM = old


def test_origin_slab_matches_full_frame(rng):
    # Row-slab rendering via origin/full_size must reproduce the full-frame
    # result slab by slab (the multi-device sp-sharding path).
    buf = make_buffer(rng)
    winner_f, depth_f = rasterize_pallas(buf, W, H, interpret=True)
    slab = H // 4
    for k in range(4):
        winner_s, depth_s = rasterize_pallas(
            buf,
            W,
            slab,
            interpret=True,
            origin=(k * slab, 0),
            full_size=(H, W),
            tile=(32, 128),
        )
        np.testing.assert_array_equal(
            np.asarray(winner_s), np.asarray(winner_f)[k * slab : (k + 1) * slab]
        )
        np.testing.assert_allclose(
            np.asarray(depth_s),
            np.asarray(depth_f)[k * slab : (k + 1) * slab],
            rtol=1e-6,
        )


def test_interp_matches_deferred(rng):
    # Fused in-kernel varying interpolation vs rasterize_jnp +
    # interpolate_context (the deferred path).
    from f_renderer_tpu.pipeline.raster_pallas import rasterize_interp_pallas
    from f_renderer_tpu.pipeline.shade import interpolate_context

    buf = make_buffer(rng)
    ctx_p, ps_p, winner_p, depth_p = rasterize_interp_pallas(
        buf, W, H, interpret=True, tile=(32, 128)
    )
    winner_j, depth_j = rasterize_jnp(buf, W, H)
    np.testing.assert_array_equal(np.asarray(winner_p), np.asarray(winner_j))
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_j), rtol=1e-6)
    ctx_j, ps_j = interpolate_context(buf, winner_j, W, H)
    hit = np.asarray(winner_j) >= 0
    np.testing.assert_array_equal(
        np.asarray(ps_p)[hit], np.asarray(ps_j)[hit]
    )
    np.testing.assert_allclose(
        np.asarray(ctx_p)[hit], np.asarray(ctx_j)[hit], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("k", [1, 4])
def test_bin_pairs_exact_coverage(rng, k):
    # Every (tile, triangle) overlap must be reachable: via the tile's own
    # fine range, its coarse tile's range, or the spill bucket (the
    # hierarchical scheme; small k forces heavy coarse/spill use).
    from f_renderer_tpu.pipeline.raster_pallas import (
        _MAXXY, _MINXY, COARSE, _unpack_xy, bin_pairs, pack_setup,
    )

    buf = make_buffer(rng, n_faces=40, spread=2.0)
    th, tw = 16, 128
    m = buf.num_slots
    m_pad = ((m + 1 + 127) // 128) * 128
    ti, _ = pack_setup(buf, W, H, m_pad, with_ctx=True)
    nty, ntx = -(-H // th), -(-W // tw)
    ptri, off = bin_pairs(ti, (th, tw), (nty, ntx), k, 128, m_dummy=m, kc=k)
    ptri = np.asarray(ptri)
    off = np.asarray(off)
    ti = np.asarray(ti)
    ntiles = nty * ntx
    ntxc = -(-ntx // COARSE)
    ntilesc = -(-nty // COARSE) * ntxc
    spill = set(ptri[off[ntiles + ntilesc] : off[ntiles + ntilesc + 1]].tolist())
    hit_via = {"own": 0, "coarse": 0, "spill": 0}
    for t in range(ntiles):
        own = set(ptri[off[t] : off[t + 1]].tolist())
        ty, tx = divmod(t, ntx)
        c = ntiles + (ty // COARSE) * ntxc + (tx // COARSE)
        coarse = set(ptri[off[c] : off[c + 1]].tolist())
        y0, x0 = ty * th, tx * tw
        for s in range(m):
            minx, miny = (int(v) for v in _unpack_xy(ti[_MINXY, s]))
            maxx, maxy = (int(v) for v in _unpack_xy(ti[_MAXXY, s]))
            overlaps = (
                maxx > minx and maxy > miny
                and minx < x0 + tw and maxx > x0
                and miny < y0 + th and maxy > y0
            )
            if overlaps:
                assert s in own or s in coarse or s in spill, (t, s)
                via = "own" if s in own else ("coarse" if s in coarse else "spill")
                hit_via[via] += 1
    if k == 1:  # small k must actually exercise the coarse level
        assert hit_via["coarse"] > 0


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


def test_bin_direct_exact_coverage(rng):
    # Single-copy binning (bin_direct): every (tile, triangle) overlap must
    # be reachable via the tile's own fine range, its coarse range, or the
    # spill bucket — and own ranges must contain ONLY triangles whose bbox
    # lies entirely inside that tile (they are ungated in the kernel).
    from f_renderer_tpu.pipeline.raster_pallas import (
        _MAXXY, _MINXY, COARSE, _unpack_xy, bin_direct, pack_setup,
    )

    buf = make_buffer(rng, n_faces=40, spread=2.0)
    th, tw = 16, 128
    m = buf.num_slots
    m_pad = ((m + 1 + 127) // 128) * 128
    ti, _ = pack_setup(buf, W, H, m_pad, with_ctx=True)
    nty, ntx = -(-H // th), -(-W // tw)
    perm, off = bin_direct(ti, (th, tw), (nty, ntx))
    perm = np.asarray(perm)
    off = np.asarray(off)
    ti = np.asarray(ti)
    ntiles = nty * ntx
    ntxc = -(-ntx // COARSE)
    ntilesc = -(-nty // COARSE) * ntxc
    spill = set(perm[off[ntiles + ntilesc] : off[ntiles + ntilesc + 1]].tolist())
    for t in range(ntiles):
        own = set(perm[off[t] : off[t + 1]].tolist())
        ty, tx = divmod(t, ntx)
        c = ntiles + (ty // COARSE) * ntxc + (tx // COARSE)
        coarse = set(perm[off[c] : off[c + 1]].tolist())
        y0, x0 = ty * th, tx * tw
        for s in range(m_pad):
            minx, miny = (int(v) for v in _unpack_xy(ti[_MINXY, s]))
            maxx, maxy = (int(v) for v in _unpack_xy(ti[_MAXXY, s]))
            overlaps = (
                maxx > minx and maxy > miny
                and minx < x0 + tw and maxx > x0
                and miny < y0 + th and maxy > y0
            )
            if overlaps:
                assert s in own or s in coarse or s in spill, (t, s)
            if s in own:
                # ungated own ranges: bbox fully inside the tile
                assert minx >= x0 and maxx <= x0 + tw, (t, s)
                assert miny >= y0 and maxy <= y0 + th, (t, s)
    # every slot lands in exactly one bucket overall
    counts = {}
    for seg in range(ntiles + ntilesc + 1):
        for s in perm[off[seg] : off[seg + 1]].tolist():
            counts[s] = counts.get(s, 0) + 1
    assert all(v == 1 for v in counts.values())


def test_fused_direct_matches_jnp(rng):
    # Full fused render with bin_mode="direct" must match the jnp pipeline
    # exactly on winners/depth (same merge over the same setup).
    from f_renderer_tpu.pipeline.fused import render_fused_pallas
    from f_renderer_tpu.pipeline.render import RenderConfig
    from f_renderer_tpu.shaders.builtin import make_textured_shaders
    from f_renderer_tpu.shaders.texture import TextureStack

    buf = make_buffer(rng, n_faces=60, spread=2.5)
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[::2, ::2] = (255, 64, 0, 255)
    stack = TextureStack.create([tex])
    _, ps = make_textured_shaders()
    ps_u = {"textures": stack}
    cfg = RenderConfig(
        width=W, height=H, backend="pallas", bin_mode="direct", tile=(32, 128)
    )
    frame_d, depth_d, winner_d = render_fused_pallas(
        buf, ps, ps_u, cfg, interpret=True
    )
    winner_j, depth_j = rasterize_jnp(buf, W, H)
    np.testing.assert_array_equal(np.asarray(winner_d), np.asarray(winner_j))
    np.testing.assert_allclose(
        np.asarray(depth_d), np.asarray(depth_j), rtol=2.4e-7, atol=0.0
    )


@pytest.mark.parametrize("frac", [0.5, 0.02])
def test_fused_pair_budget_exact(rng, frac):
    """pair_budget_frac must be exact in BOTH branches: within budget
    (frac=0.5 covers this 60-face scene) and overflow (frac=0.02 forces
    total_pairs > cap, exercising the lax.cond remainder gather)."""
    from f_renderer_tpu.pipeline.fused import render_fused_pallas
    from f_renderer_tpu.pipeline.render import RenderConfig
    from f_renderer_tpu.shaders.builtin import make_textured_shaders
    from f_renderer_tpu.shaders.texture import TextureStack

    buf = make_buffer(rng, n_faces=60, spread=2.5)
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[::2, ::2] = (255, 64, 0, 255)
    stack = TextureStack.create([tex])
    _, ps = make_textured_shaders()
    ps_u = {"textures": stack}
    cfg = RenderConfig(
        width=W, height=H, backend="pallas", tile=(32, 128),
        pair_budget_frac=frac,
    )
    frame_d, depth_d, winner_d = render_fused_pallas(
        buf, ps, ps_u, cfg, interpret=True
    )
    winner_j, depth_j = rasterize_jnp(buf, W, H)
    np.testing.assert_array_equal(np.asarray(winner_d), np.asarray(winner_j))
    np.testing.assert_allclose(
        np.asarray(depth_d), np.asarray(depth_j), rtol=2.4e-7, atol=0.0
    )


def test_direct_mode_defused_above_threshold(rng, monkeypatch):
    """bin_mode="direct" must auto-fall-back to "pairs" for huge scenes:
    its ungated spill bucket is a projected hundreds-of-ms pathology at
    stress scale (VERDICT r3 weak #5, BASELINE.md r3 analysis)."""
    import dataclasses

    from f_renderer_tpu.pipeline import fused as fused_mod
    from f_renderer_tpu.pipeline.fused import render_fused_pallas
    from f_renderer_tpu.pipeline.render import RenderConfig
    from f_renderer_tpu.shaders.builtin import make_textured_shaders
    from f_renderer_tpu.shaders.texture import TextureStack

    def boom(*a, **k):
        raise AssertionError("bin_direct selected above tile_auto_threshold")

    monkeypatch.setattr(
        "f_renderer_tpu.pipeline.raster_pallas.bin_direct", boom
    )
    buf = make_buffer(rng, n_faces=60, spread=2.5)
    tex = np.zeros((8, 8, 4), np.uint8)
    stack = TextureStack.create([tex])
    _, ps = make_textured_shaders()
    cfg = RenderConfig(
        width=W, height=H, backend="pallas", bin_mode="direct",
        tile=(32, 128), tile_auto_threshold=8,  # every scene is "huge"
    )
    render_fused_pallas(buf, ps, {"textures": stack}, cfg, interpret=True)
