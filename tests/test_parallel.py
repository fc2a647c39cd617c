"""Multi-device sharded rendering on the 8-device virtual CPU mesh.

The sharded render must produce the exact same frame as the single-device
pipeline: geometry per-shard computes identical per-face values, the
(rhw, order) raster reduction is partition-invariant, and slabs are
disjoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f_renderer_tpu.parallel import make_render_mesh, render_frame_sharded
from f_renderer_tpu.pipeline import RenderConfig, render_frame
from f_renderer_tpu.scene import make_checker_texture, make_cube, make_phong_scene


def _assert_frames_close(a, b, max_diff=1, budget=0.005):
    """Frames equal up to last-ulp shading differences: ≤``max_diff`` u8 on
    at most ``budget`` of pixels (cross-program contraction variance)."""
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    diff = np.abs(a - b).max(axis=-1)
    assert diff.max() <= max_diff, f"max channel diff {diff.max()}"
    frac = (diff > 0).mean()
    assert frac <= budget, f"{frac:.3%} pixels differ"


@pytest.fixture(scope="module")
def scene():
    # Two meshes → exercises draw offsets + ps boundary quirk under sharding.
    cube2 = make_cube(0.7)
    cube2["pos"] = cube2["pos"] + np.array([0.9, 0.2, 0.0], np.float32)
    return make_phong_scene(128, 96, meshes=[make_cube(), cube2], clip_cap=64)


@pytest.fixture(scope="module")
def ref(scene):
    """Single-device reference frame/depth, rendered once per module."""
    frame, depth, _ = scene.render()
    return np.asarray(frame), np.asarray(depth)


def _render_sharded_jit(scene, cfg, mesh):
    """Run the sharded render as ONE jitted program (the production shape:
    bench/demos always jit). Eagerly dispatching the pack-before-gather
    prep runs hundreds of sub-second op compiles that the persistent
    compile cache won't store (min_compile_time filter) — measured
    100-400 s per test on this 1-core host vs seconds jitted."""

    @jax.jit
    def step(vs_u, ps_u, draws):
        return render_frame_sharded(
            list(draws), scene.vertex_shader, vs_u,
            scene.pixel_shader, ps_u, cfg, mesh,
        )

    return step(scene.vs_uniform, scene.ps_uniform, tuple(scene.draws))


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_matches_single_device(scene, ref, dp, sp):
    mesh = make_render_mesh(dp=dp, sp=sp)
    frame_s, depth_s = _render_sharded_jit(scene, scene.config, mesh)
    frame_1, depth_1 = ref
    # Fusion/contraction differs between the shard_map program and the
    # single-device jit — a last-ulp tolerance (≤1 u8 on <0.5% of pixels)
    # absorbs it; the partition itself is exact (SURVEY.md §7.3.5 policy).
    _assert_frames_close(frame_s, frame_1)
    np.testing.assert_allclose(
        np.asarray(depth_s), np.asarray(depth_1), rtol=1e-5, atol=1e-7
    )
    assert (np.asarray(frame_s)[..., 0] != 30).any()


def test_sharded_eager_matches_jit(scene):
    """Eager (un-jitted) dispatch of the sharded API must agree with the
    jitted program — the one eager-path test (the rest jit for suite
    speed; see _render_sharded_jit)."""
    mesh = make_render_mesh(dp=2, sp=4)
    frame_e, depth_e = render_frame_sharded(
        scene.draws,
        scene.vertex_shader,
        scene.vs_uniform,
        scene.pixel_shader,
        scene.ps_uniform,
        scene.config,
        mesh,
    )
    frame_j, depth_j = _render_sharded_jit(scene, scene.config, mesh)
    _assert_frames_close(frame_e, frame_j)
    np.testing.assert_allclose(
        np.asarray(depth_e), np.asarray(depth_j), rtol=1e-5, atol=1e-7
    )


def test_sharded_under_jit(scene):
    mesh = make_render_mesh(dp=2, sp=4)

    @jax.jit
    def step(vs_u, ps_u, draws):
        return render_frame_sharded(
            draws,
            scene.vertex_shader,
            vs_u,
            scene.pixel_shader,
            ps_u,
            scene.config,
            mesh,
        )

    f1, d1 = step(scene.vs_uniform, scene.ps_uniform, tuple(scene.draws))
    f2, d2 = step(scene.vs_uniform, scene.ps_uniform, tuple(scene.draws))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.slow
def test_sharded_fused_large_scene():
    """Beyond-toy sharded coverage (VERDICT r2 weak #5): 12k random soup
    faces at 512×256 (32-row slabs, multiple bin chunks per device, clip
    path active) through the fused pack-before-gather path."""
    import dataclasses

    from f_renderer_tpu.camera import Camera
    from f_renderer_tpu.scene import make_instanced_soup

    soup = make_instanced_soup(12_000, spread=4.0)
    cam = Camera.create([0.0, 0.0, -2.0], [0.0, 0.0, 10.0], [0.0, 1.0, 0.0])
    # This view clips ~810 faces; the cap must cover them in BOTH runs —
    # past the cap the documented drop policy makes frames legitimately
    # diverge (single device drops, per-dp-shard caps may not).
    scene = make_phong_scene(
        512, 256, meshes=[soup], camera=cam, clip_cap=2048, backend="pallas"
    )
    frame_1, depth_1, _ = scene.render()

    mesh = make_render_mesh(dp=2, sp=4)
    frame_n, depth_n = _render_sharded_jit(scene, scene.config, mesh)
    _assert_frames_close(frame_n, frame_1)
    np.testing.assert_allclose(
        np.asarray(depth_n), np.asarray(depth_1), rtol=1e-5, atol=1e-7
    )
    assert (np.asarray(frame_n)[..., 0] != 30).mean() > 0.05


def test_sharded_fused_matches_single(scene):
    """The fused-kernel sharded path (row slabs, slab-local binning) must
    reproduce the single-device fused render."""
    import dataclasses

    import jax

    from f_renderer_tpu.parallel import make_render_mesh, render_frame_sharded

    cfg = dataclasses.replace(scene.config, backend="pallas")
    scene_p = dataclasses.replace(scene, config=cfg)
    frame_1, depth_1, _ = scene_p.render()

    mesh = make_render_mesh(jax.devices()[:4], dp=2, sp=2)
    frame_n, depth_n = _render_sharded_jit(scene, cfg, mesh)
    _assert_frames_close(frame_n, frame_1)
    np.testing.assert_allclose(
        np.asarray(depth_n), np.asarray(depth_1), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize(
    "dp,sp,backend", [(2, 4, "jnp"), (8, 1, "jnp"), (2, 4, "pallas")]
)
def test_stream_comm_matches_single_device(scene, ref, dp, sp, backend):
    # comm_mode="stream": ppermute triangle shards around the dp ring
    # instead of all_gather (O(scene/n_dp) memory per device). The
    # cross-round merge is the same lexicographic (rhw, order) max, so
    # the raster is partition-exact; shading goes through the XLA planes
    # path (same last-ulp tolerance as the gathered comparisons).
    # backend="pallas" covers the production rasterize_interp_pallas-
    # inside-the-ring branch (sharding.py), not just the jnp reference.
    import dataclasses

    mesh = make_render_mesh(dp=dp, sp=sp)
    cfg = dataclasses.replace(scene.config, comm_mode="stream", backend=backend)
    frame_s, depth_s = _render_sharded_jit(scene, cfg, mesh)
    frame_1, depth_1 = ref
    _assert_frames_close(frame_s, frame_1, max_diff=2, budget=0.005)
    np.testing.assert_allclose(
        np.asarray(depth_s), np.asarray(depth_1), rtol=1e-5, atol=1e-7
    )
    assert (np.asarray(frame_s)[..., 0] != 30).any()
