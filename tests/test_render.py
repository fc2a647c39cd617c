"""End-to-end frame rendering vs the scalar golden oracle.

Golden-image testing per SURVEY.md §4: render the same scene through the
TPU pipeline (jnp backend on CPU here) and the scalar oracle, compare
per-pixel u8 output. Clipped-edge pixels may differ where the atan2 sort or
FMA contraction differs in the last ulp (SURVEY.md §7.3.5) — a small
mismatch budget absorbs that.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f_renderer_tpu.framebuffer import sample_2d as np_sample_2d
from f_renderer_tpu.golden import render_scene as golden_render
from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
from f_renderer_tpu.pipeline import RenderConfig, render_frame
from f_renderer_tpu.shaders import TextureStack

W, H = 128, 96
BG = (30, 30, 30, 255)


def checker_texture(n=16):
    tex = np.zeros((n, n, 4), np.float32)
    ix = np.arange(n)
    mask = (ix[:, None] // 2 + ix[None, :] // 2) % 2 == 0
    tex[mask] = [0.9, 0.3, 0.2, 1.0]
    tex[~mask] = [0.15, 0.35, 0.8, 1.0]
    return tex


def scene_matrices():
    view = np.asarray(set_look_at([0, 0.5, 3.0], [0, 0, 0], [0, 1, 0]))
    proj = np.asarray(set_perspective(np.pi * 0.25, W / H, 0.1, 50.0))
    model = np.asarray(set_identity())
    return (proj @ view @ model).astype(np.float32)


def make_shaders(tex):
    stack = TextureStack.create([tex])

    def vs(u, vin):
        pos = jnp.asarray(vin["pos"], jnp.float32)
        clip = u["mvp"] @ jnp.concatenate([pos, jnp.ones((1,), jnp.float32)])
        return clip, {"uv": jnp.asarray(vin["uv"], jnp.float32)}

    def ps(u, ctx, ps_index):
        return u["textures"].sample(ps_index, ctx["uv"])

    def np_vs(u, vin):
        pos = np.asarray(vin["pos"], np.float32)
        clip = u["mvp"] @ np.append(pos, np.float32(1.0))
        return clip, np.asarray(vin["uv"], np.float32)

    def np_ps(u, ctx):
        return np_sample_2d(tex, ctx[:2])

    return vs, ps, np_vs, np_ps, stack


def compare(frame, gframe, budget=0.01, tol=2):
    frame = np.asarray(frame)
    diff = np.abs(frame.astype(np.int32) - gframe.astype(np.int32)).max(axis=-1)
    bad = (diff > tol).mean()
    assert bad <= budget, f"{bad:.2%} pixels differ by more than {tol}"


def run_scene(pos, uv, budget=0.01):
    mvp = scene_matrices()
    tex = checker_texture()
    vs, ps, np_vs, np_ps, stack = make_shaders(tex)
    cfg = RenderConfig(width=W, height=H, background=BG, clip_cap=64)
    draws = [{"pos": jnp.asarray(pos), "uv": jnp.asarray(uv)}]
    frame, depth, stats = render_frame(
        draws, vs, {"mvp": jnp.asarray(mvp)}, ps, {"textures": stack}, cfg
    )
    gdraws = [
        (
            [
                [{"pos": pos[f, c], "uv": uv[f, c]} for c in range(3)]
                for f in range(pos.shape[0])
            ],
            {},
        )
    ]
    gframe, gdepth = golden_render(
        W, H, gdraws, np_vs, {"mvp": mvp}, np_ps, background=BG
    )
    compare(frame, gframe, budget=budget)
    # Depth buffers should agree closely where both wrote.
    both = (np.asarray(depth) > 0) & (gdepth > 0)
    if both.any():
        np.testing.assert_allclose(
            np.asarray(depth)[both], gdepth[both], rtol=1e-3
        )
    return frame, gframe


def test_quad_textured():
    pos = np.array(
        [
            [[-0.8, -0.6, 0.0], [0.8, -0.6, 0.0], [0.8, 0.6, 0.0]],
            [[-0.8, -0.6, 0.0], [0.8, 0.6, 0.0], [-0.8, 0.6, 0.0]],
        ],
        np.float32,
    )
    uv = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    frame, gframe = run_scene(pos, uv, budget=0.002)
    assert (np.asarray(frame)[..., 0] != BG[0]).sum() > 500  # real coverage


def test_random_soup_with_clipping(rng):
    centers = rng.uniform([-1.5, -1.5, -0.5], [1.5, 1.5, 6.0], (40, 3))
    offsets = rng.uniform(-1.0, 1.0, (40, 3, 3))
    pos = (centers[:, None, :] + offsets).astype(np.float32)
    uv = rng.random((40, 3, 2)).astype(np.float32)
    run_scene(pos, uv, budget=0.01)


def test_depth_ordering_ties(rng):
    # Coplanar overlapping quads: same depth at overlap — submission order
    # must break ties (later overwrites, renderer.rs:362-366).
    base = np.array(
        [
            [[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.5, 0.5, 1.0]],
            [[-0.5, -0.5, 1.0], [0.5, 0.5, 1.0], [-0.5, 0.5, 1.0]],
        ],
        np.float32,
    )
    pos = np.concatenate([base, base], axis=0)  # identical geometry twice
    uv = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
            # second copy samples far corner — different colors
            [[1, 1], [1, 1], [1, 1]],
            [[1, 1], [1, 1], [1, 1]],
        ],
        np.float32,
    )
    run_scene(pos, uv, budget=0.002)


def test_render_is_jittable():
    pos = np.array(
        [[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]], np.float32
    )
    uv = np.array([[[0, 0], [1, 0], [0.5, 1]]], np.float32)
    mvp = scene_matrices()
    tex = checker_texture()
    vs, ps, _, _, stack = make_shaders(tex)
    cfg = RenderConfig(width=W, height=H, background=BG, clip_cap=8)

    @jax.jit
    def step(mvp_d, stack_d, pos_d, uv_d):
        frame, depth, _ = render_frame(
            [{"pos": pos_d, "uv": uv_d}],
            vs,
            {"mvp": mvp_d},
            ps,
            {"textures": stack_d},
            cfg,
        )
        return frame, depth

    f1, d1 = step(jnp.asarray(mvp), stack, jnp.asarray(pos), jnp.asarray(uv))
    f2, d2 = step(jnp.asarray(mvp), stack, jnp.asarray(pos), jnp.asarray(uv))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert (np.asarray(f1)[..., 0] != BG[0]).any()


def test_merge_is_order_independent():
    """The (rhw, order) argmax merge must be invariant to physical triangle
    order (the 'race detection' story, SURVEY.md §5): permuting buffer slots
    changes nothing."""
    import dataclasses as dc

    from f_renderer_tpu.pipeline.raster_jnp import rasterize_jnp
    from f_renderer_tpu.pipeline.geometry import geometry_process

    rng = np.random.default_rng(5)
    mvp = scene_matrices()

    def vs(u, vin):
        pos = jnp.asarray(vin["pos"], jnp.float32)
        clip = u["mvp"] @ jnp.concatenate([pos, jnp.ones((1,), jnp.float32)])
        return clip, {"uv": jnp.asarray(vin["uv"], jnp.float32)}

    pos = rng.uniform([-1, -1, 0.5], [1, 1, 6.0], (30, 3))[:, None, :] + \
        rng.uniform(-0.8, 0.8, (30, 3, 3))
    uv = rng.random((30, 3, 2))
    buf, _ = geometry_process(
        {"pos": jnp.asarray(pos, jnp.float32), "uv": jnp.asarray(uv, jnp.float32)},
        vs, {"mvp": jnp.asarray(mvp)}, W, H, clip_cap=16,
    )
    winner_a, depth_a = rasterize_jnp(buf, W, H)
    perm = rng.permutation(buf.num_slots)
    # TriangleBuffer is planar: the slot axis is the LAST axis everywhere.
    buf_p = jax.tree.map(lambda x: x[..., perm], buf)
    winner_p, depth_p = rasterize_jnp(buf_p, W, H)
    # map permuted winner ids back to original slots
    winner_p = np.asarray(winner_p)
    mapped = np.where(winner_p >= 0, perm[winner_p], -1)
    np.testing.assert_array_equal(mapped, np.asarray(winner_a))
    np.testing.assert_array_equal(np.asarray(depth_p), np.asarray(depth_a))
