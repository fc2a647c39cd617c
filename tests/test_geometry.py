"""Geometry stage vs the scalar golden oracle (renderer.rs:96-267 semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.golden import geometry_processing as golden_geometry
from f_renderer_tpu.pipeline.geometry import MAX_FAN, geometry_process

W, H = 128, 96


def jnp_vs(u, vin):
    pos = jnp.asarray(vin["pos"], jnp.float32)
    clip = u["mvp"] @ jnp.concatenate([pos, jnp.ones((1,), jnp.float32)])
    return clip, {"uv": jnp.asarray(vin["uv"], jnp.float32)}


def np_vs(u, vin):
    pos = np.asarray(vin["pos"], np.float32)
    clip = u["mvp"] @ np.append(pos, np.float32(1.0))
    return clip, np.asarray(vin["uv"], np.float32)


def make_mvp():
    from f_renderer_tpu.math import set_perspective

    return np.asarray(set_perspective(np.pi * 0.25, W / H, 0.1, 50.0)).astype(
        np.float32
    )


def run_both(faces_pos, faces_uv):
    """faces_pos (F,3,3), faces_uv (F,3,2) → (pipeline tris, golden tris)."""
    mvp = make_mvp()
    u = {"mvp": jnp.asarray(mvp)}
    vs_inputs = {
        "pos": jnp.asarray(faces_pos, jnp.float32),
        "uv": jnp.asarray(faces_uv, jnp.float32),
    }
    buf, stats = geometry_process(vs_inputs, jnp_vs, u, W, H, clip_cap=32)

    golden_tris = []
    for f in range(faces_pos.shape[0]):
        face = [
            {"pos": faces_pos[f, c], "uv": faces_uv[f, c]} for c in range(3)
        ]
        tris = golden_geometry(W, H, face, np_vs, {"mvp": mvp})
        if tris is not None:
            golden_tris.extend((f, t, tri) for t, tri in enumerate(tris))
    return buf, stats, golden_tris


def extract_valid(buf):
    valid = np.asarray(buf.valid)
    idx = np.nonzero(valid)[0]
    order = np.asarray(buf.order)[idx]
    perm = np.argsort(order)
    idx = idx[perm]
    return {
        # planar (3, 2, M) / (3, M) buffer fields → slot-major for the
        # per-triangle golden comparison
        "spi": np.moveaxis(np.asarray(buf.spi), -1, 0)[idx],
        "spf": np.moveaxis(np.asarray(buf.spf), -1, 0)[idx],
        "rhw": np.moveaxis(np.asarray(buf.rhw), -1, 0)[idx],
        "ctx": np.asarray(buf.ctx_stacked())[idx],
        "order": np.asarray(buf.order)[idx],
    }


def assert_triangles_match(buf, golden_tris, spf_tol=5e-3):
    got = extract_valid(buf)
    assert got["spi"].shape[0] == len(golden_tris), (
        f"triangle count {got['spi'].shape[0]} vs golden {len(golden_tris)}"
    )
    for k, (f, t, gtri) in enumerate(golden_tris):
        # Pipeline applies winding repair in setup; golden applies it in
        # raster. Compare as *sets* of vertices (winding repair only swaps
        # v1/v2; the vertex set is invariant, and raster output too).
        g_spi = np.array([v.spi for v in gtri])
        g_rhw = np.array([v.rhw for v in gtri])
        g_ctx = np.array([v.context for v in gtri])
        p_spi = got["spi"][k]
        p_rhw = got["rhw"][k]
        p_ctx = got["ctx"][k]
        # match vertices by nearest spf
        g_spf = np.array([v.spf for v in gtri])
        p_spf = got["spf"][k]
        used = set()
        for i in range(3):
            d = np.linalg.norm(g_spf[None, i] - p_spf, axis=-1)
            j = int(np.argmin(d))
            assert j not in used, f"tri {k}: duplicate vertex match"
            used.add(j)
            assert d[j] < spf_tol, f"tri {k} vert {i}: spf dist {d[j]}"
            np.testing.assert_array_equal(p_spi[j], g_spi[i], err_msg=f"tri {k}")
            np.testing.assert_allclose(p_rhw[j], g_rhw[i], rtol=1e-5)
            np.testing.assert_allclose(p_ctx[j], g_ctx[i], rtol=1e-4, atol=1e-5)


def test_all_inside_faces(rng):
    # Small triangles safely inside the frustum.
    centers = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 8.0], (20, 3))
    offsets = rng.uniform(-0.2, 0.2, (20, 3, 3))
    pos = (centers[:, None, :] + offsets).astype(np.float32)
    uv = rng.random((20, 3, 2)).astype(np.float32)
    buf, stats, golden_tris = run_both(pos, uv)
    assert int(stats["num_clipped"]) == 0
    assert_triangles_match(buf, golden_tris)


def test_clipped_faces(rng):
    # Large triangles crossing multiple planes + some behind the camera.
    centers = rng.uniform([-2.0, -2.0, -1.0], [2.0, 2.0, 10.0], (30, 3))
    offsets = rng.uniform(-2.5, 2.5, (30, 3, 3))
    pos = (centers[:, None, :] + offsets).astype(np.float32)
    uv = rng.random((30, 3, 2)).astype(np.float32)
    buf, stats, golden_tris = run_both(pos, uv)
    assert int(stats["num_clipped"]) > 0
    assert_triangles_match(buf, golden_tris)


def test_w_zero_face_dropped():
    # A face with one vertex exactly at w == 0 must be dropped entirely
    # (renderer.rs:117-119). With mvp = perspective, w == z.
    pos = np.array(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 2.0], [0.0, 1.0, 2.0]]], np.float32
    )
    uv = np.zeros((1, 3, 2), np.float32)
    buf, stats, golden_tris = run_both(pos, uv)
    assert len(golden_tris) == 0
    assert not np.asarray(buf.valid).any()


def test_clip_cap_overflow_reported(rng):
    pos = rng.uniform(-4, 4, (64, 3, 3)).astype(np.float32)
    pos[..., 2] += 1.0
    uv = rng.random((64, 3, 2)).astype(np.float32)
    mvp = make_mvp()
    u = {"mvp": jnp.asarray(mvp)}
    vs_inputs = {"pos": jnp.asarray(pos), "uv": jnp.asarray(uv)}
    buf, stats = geometry_process(vs_inputs, jnp_vs, u, W, H, clip_cap=2)
    assert int(stats["num_clipped"]) > 2  # overflow detectable by caller


def test_submission_order_is_face_major(rng):
    pos = rng.uniform([-3, -3, 0.5], [3, 3, 6], (10, 3, 3)).astype(np.float32)
    uv = rng.random((10, 3, 2)).astype(np.float32)
    buf, stats, _ = run_both(pos, uv)
    got = extract_valid(buf)
    faces = got["order"] // MAX_FAN
    assert (np.diff(got["order"]) > 0).all()
    assert (np.diff(faces) >= 0).all()


def test_cull_backfaces_option():
    """cull=True drops back-facing (nz > 0) triangles; default repairs winding."""
    import jax.numpy as jnp

    from f_renderer_tpu.pipeline.geometry import geometry_process

    def vs(u, vin):
        pos = jnp.asarray(vin["pos"], jnp.float32)
        return jnp.concatenate([pos, jnp.ones(1)]), {"d": pos[:1]}

    # front-facing (CW in NDC → nz < 0) and back-facing variants
    front = np.array([[[-0.5, -0.5, 0.5], [0.0, 0.5, 0.5], [0.5, -0.5, 0.5]]],
                     np.float32)
    back = front[:, ::-1]
    both = {"pos": jnp.asarray(np.concatenate([front, back]))}
    buf, _ = geometry_process(both, vs, {}, 64, 64, clip_cap=4)
    assert int(np.asarray(buf.valid).sum()) == 2  # repair keeps both
    buf_c, _ = geometry_process(both, vs, {}, 64, 64, clip_cap=4, cull=True)
    assert int(np.asarray(buf_c.valid).sum()) == 1  # cull drops one
