"""Fused single-kernel renderer (interpret mode) vs the jnp pipeline."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.pipeline.fused import render_fused_pallas
from f_renderer_tpu.pipeline.render import build_triangles
from f_renderer_tpu.scene import make_cube, make_phong_scene


def fused_vs_jnp(scene, budget=0.01):
    frame_j, depth_j, _ = scene.render()
    tri, _ = build_triangles(
        scene.draws, scene.vertex_shader, scene.vs_uniform, scene.config
    )
    frame_f, depth_f, winner = render_fused_pallas(
        tri, scene.pixel_shader, scene.ps_uniform, scene.config, interpret=True
    )
    assert frame_f.shape == (scene.config.height, scene.config.width, 4)
    diff = np.abs(
        np.asarray(frame_f).astype(np.int32) - np.asarray(frame_j).astype(np.int32)
    ).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad <= budget, f"{bad:.2%} pixels differ"
    np.testing.assert_allclose(
        np.asarray(depth_f), np.asarray(depth_j), rtol=1e-5, atol=1e-7
    )
    return frame_f


def test_phong_two_meshes():
    cube2 = make_cube(0.7)
    cube2["pos"] = cube2["pos"] + np.array([0.9, 0.2, 0.0], np.float32)
    scene = make_phong_scene(
        128, 96, meshes=[make_cube(), cube2], clip_cap=32
    )
    scene = dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, tile=(16, 128))
    )
    frame = fused_vs_jnp(scene)
    assert (np.asarray(frame)[..., 0] != 30).sum() > 300


def test_flat_shader():
    from f_renderer_tpu.pipeline import RenderConfig, render_frame
    from f_renderer_tpu.shaders.builtin import FlatShader

    cube = make_cube()
    cfg = RenderConfig(
        width=128, height=96, background=(10, 10, 10, 255), clip_cap=16,
        tile=(16, 128),
    )
    draws = [{k: jnp.asarray(cube[k]) for k in ("pos", "color")}]
    frame_j, depth_j, _ = render_frame(
        draws, FlatShader.vertex, {"model": jnp.eye(4), "view": jnp.eye(4),
                                   "proj": jnp.eye(4)},
        FlatShader.pixel, {}, cfg,
    )
    tri, _ = build_triangles(
        draws, FlatShader.vertex,
        {"model": jnp.eye(4), "view": jnp.eye(4), "proj": jnp.eye(4)}, cfg
    )
    frame_f, _, _ = render_fused_pallas(tri, FlatShader.pixel, {}, cfg,
                                        interpret=True)
    diff = np.abs(
        np.asarray(frame_f).astype(np.int32) - np.asarray(frame_j).astype(np.int32)
    ).max(axis=-1)
    assert (diff > 2).mean() <= 0.01
