"""Voxel raycaster vs the scalar oracle (voxel.rs semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.voxel import (
    VoxelRenderConfig,
    cube_intersect,
    densify,
    flatten,
    gen_randomly,
    render_voxel_frame,
)
from f_renderer_tpu.voxel.golden import (
    intersect_scalar,
    render_voxel_scalar,
)
from f_renderer_tpu.voxel.octree import find_leaf_scalar, new_full


@pytest.fixture(scope="module")
def svo():
    return gen_randomly(2, np.random.default_rng(42))


def test_flatten_counts(svo):
    arrays = flatten(svo)
    assert arrays.num_nodes == svo.depth_first()
    # every leaf bit has a color; every non-leaf valid bit a child index
    total_children = (arrays.child_index >= 0).sum()
    assert total_children == arrays.num_nodes - 1


def test_densify_matches_find_leaf(svo, rng):
    level = 2
    length = 2.0
    color, hit = densify(svo, level)
    pts = rng.uniform(-0.2, length + 0.2, (500, 3)).astype(np.float32)
    r = hit.shape[0]
    cell = length / r
    for p in pts:
        leaf = find_leaf_scalar(svo, length, p)
        if np.all((p >= 0) & (p < length)):
            idx = np.clip((p / cell).astype(np.int32), 0, r - 1)
            g_hit = hit[idx[0], idx[1], idx[2]]
            assert g_hit == (leaf is not None), p
            if leaf is not None:
                np.testing.assert_array_equal(color[idx[0], idx[1], idx[2]], leaf)
        else:
            assert leaf is None


def test_full_octree_densify():
    color, hit = densify(new_full(), 0)
    assert hit.all()
    assert (color == 255).all()


def test_cube_intersect_matches_scalar(rng):
    length = 2.0
    eye = np.array([0.5, 0.7, -2.0], np.float32)
    dirs = rng.normal(size=(300, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # include some axis-parallel and perpendicular rays
    dirs[0] = [0, 0, 1]
    dirs[1] = [0, 0, -1]
    dirs[2] = [1, 0, 0]
    dirs[3] = [0, 1, 0]
    start, end, valid = cube_intersect(
        jnp.asarray(eye), jnp.asarray(dirs), length
    )
    start, end, valid = np.asarray(start), np.asarray(end), np.asarray(valid)
    mismatches = 0
    for i in range(dirs.shape[0]):
        ref = intersect_scalar(eye, dirs[i], length)
        if ref is None:
            mismatches += valid[i]
        else:
            ok = (
                valid[i]
                and np.allclose(start[i], ref[0], atol=1e-5)
                and np.allclose(end[i], ref[1], atol=1e-5)
            )
            mismatches += not ok
    assert mismatches <= 1  # boundary-grazing tolerance


def test_full_frame_matches_scalar(svo):
    from f_renderer_tpu.math import set_look_at, set_perspective

    level = 2
    length = 2.0
    w, h = 48, 32
    eye = np.array([1.0, 1.0, -3.0], np.float32)
    view = np.asarray(set_look_at(eye, [1.0, 1.0, 1.0], [0, 1, 0]))
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    inv_mvp = np.linalg.inv((proj @ view).astype(np.float32)).astype(np.float32)

    color, hit = densify(svo, level)
    cfg = VoxelRenderConfig(width=w, height=h, level=level, length=length)
    frame = np.asarray(
        render_voxel_frame(
            jnp.asarray(color), jnp.asarray(hit), eye, inv_mvp, cfg
        )
    )
    gframe = render_voxel_scalar(svo, level, length, eye, inv_mvp, w, h)
    diff = (frame.astype(int) != gframe.astype(int)).any(axis=-1)
    assert diff.mean() <= 0.02, f"{diff.mean():.2%} pixels differ"
    assert (frame[..., :3] != 0).any()  # scene actually visible


def test_pallas_march_matches_jnp(rng):
    import dataclasses

    import jax.numpy as jnp

    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    root = gen_randomly(2, rng)
    grid_color, grid_hit = densify(root, 2)
    w, h = 96, 64
    length = 2.0
    eye = np.array([2.8, 1.8, -0.9], np.float32)
    center = np.array([1.0, 1.0, 1.0], np.float32)
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
    inv_mvp = np.linalg.inv(proj @ view @ np.asarray(set_identity())).astype(
        np.float32
    )
    cfg = VoxelRenderConfig(width=w, height=h, level=2, length=length,
                            backend="jnp")
    f_jnp = np.asarray(
        render_voxel_frame(jnp.asarray(grid_color), jnp.asarray(grid_hit),
                           jnp.asarray(eye), jnp.asarray(inv_mvp), cfg)
    )
    cfg_p = dataclasses.replace(cfg, backend="pallas_interpret")
    f_pal = np.asarray(
        render_voxel_frame(jnp.asarray(grid_color), jnp.asarray(grid_hit),
                           jnp.asarray(eye), jnp.asarray(inv_mvp), cfg_p)
    )
    diff = (f_jnp.astype(int) - f_pal.astype(int)).__abs__().max(axis=-1)
    assert (diff > 0).mean() <= 0.002, f"{(diff > 0).mean():.3%} pixels differ"


@pytest.mark.parametrize("mode,block", [("ser", 8), ("par", 8), ("par", 16)])
def test_march_step_modes_match_jnp(rng, mode, block):
    """Both fixed-step formulations (serial gated chain / parallel
    candidate-t queries + priority select) and non-default ray blocks
    reproduce the jnp oracle march."""
    import dataclasses

    import jax.numpy as jnp

    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel import raycast_pallas
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    root = gen_randomly(2, rng)
    grid_color, grid_hit = densify(root, 2)
    w, h = 96, 64
    eye = np.array([2.8, 1.8, -0.9], np.float32)
    center = np.array([1.0, 1.0, 1.0], np.float32)
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
    inv_mvp = np.linalg.inv(proj @ view @ np.asarray(set_identity())).astype(
        np.float32
    )
    args = (jnp.asarray(grid_color), jnp.asarray(grid_hit), jnp.asarray(eye),
            jnp.asarray(inv_mvp))
    cfg = VoxelRenderConfig(width=w, height=h, level=2, backend="jnp")
    f_jnp = np.asarray(render_voxel_frame(*args, cfg))
    cfg_p = dataclasses.replace(cfg, backend="pallas_interpret", block=block)
    old = raycast_pallas.STEP_MODE
    raycast_pallas.STEP_MODE = mode
    try:
        f_pal = np.asarray(render_voxel_frame(*args, cfg_p))
    finally:
        raycast_pallas.STEP_MODE = old
    diff = (f_jnp.astype(int) - f_pal.astype(int)).__abs__().max(axis=-1)
    assert (diff > 0).mean() <= 0.002, f"{(diff > 0).mean():.3%} pixels differ"


def test_dda_matches_fixed_on_thick_cells(rng):
    """On a fully-occupied octree every march hits the entry cell — fixed
    and DDA traversal must agree (thin-leaf skipping can't occur)."""
    import dataclasses

    import jax.numpy as jnp

    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, new_full
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    root = new_full()
    grid_color, grid_hit = densify(root, 1)
    w, h = 64, 48
    eye = np.array([2.6, 2.2, -1.1], np.float32)
    center = np.array([1.0, 1.0, 1.0], np.float32)
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
    inv_mvp = np.linalg.inv(proj @ view @ np.asarray(set_identity())).astype(
        np.float32
    )
    args = (jnp.asarray(grid_color), jnp.asarray(grid_hit), jnp.asarray(eye),
            jnp.asarray(inv_mvp))
    cfg = VoxelRenderConfig(width=w, height=h, level=1,
                            backend="pallas_interpret")
    f_fixed = np.asarray(render_voxel_frame(*args, cfg))
    cfg_dda = dataclasses.replace(cfg, traversal="dda")
    f_dda = np.asarray(render_voxel_frame(*args, cfg_dda))
    diff = (f_fixed.astype(int) - f_dda.astype(int)).__abs__().max(axis=-1)
    assert (diff > 0).mean() <= 0.005
