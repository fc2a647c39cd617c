"""Native (C++) runtime library tests.

Validates libfr_native.so against the Python implementations:
- scalar render pipeline vs the jnp pipeline (same tolerance policy as
  test_render.py — clipped-edge pixels may differ in the last ulp)
- OBJ parser vs io.obj.load_obj
- TGA decode vs a hand-built reference buffer
- PNG write/read round-trip
"""

import os
import struct
import tempfile

import numpy as np
import pytest

from f_renderer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library not built"
)

BG = (30, 30, 30, 255)


def _phong_scene(width=128, height=96, meshes=None):
    from f_renderer_tpu.scene import make_checker_texture, make_cube, make_phong_scene

    meshes = meshes or [make_cube()]
    return make_phong_scene(width, height, meshes=meshes, clip_cap=64), [
        make_checker_texture()
    ] * len(meshes)


def test_render_matches_jnp_pipeline():
    scene, textures = _phong_scene()
    frame, depth, _ = scene.render()
    frame = np.asarray(frame)
    depth = np.asarray(depth)

    nframe, ndepth, ntris = native.render_scene(
        scene.config.width,
        scene.config.height,
        native.SHADER_PHONG,
        [{k: np.asarray(v) for k, v in d.items()} for d in scene.draws],
        np.asarray(scene.vs_uniform["model"]),
        np.asarray(scene.vs_uniform["view"]),
        np.asarray(scene.vs_uniform["proj"]),
        np.asarray(scene.ps_uniform["view_pos"]),
        textures,
        background=BG,
    )
    assert ntris >= 12
    diff = np.abs(frame.astype(np.int32) - nframe.astype(np.int32)).max(axis=-1)
    assert (diff > 2).mean() <= 0.01, f"{(diff > 2).mean():.2%} pixels differ"
    both = (depth > 0) & (ndepth > 0)
    assert both.any()
    np.testing.assert_allclose(depth[both], ndepth[both], rtol=1e-3)


def test_render_multi_draw_boundary_quirk():
    from f_renderer_tpu.scene import make_cube

    cube2 = make_cube(0.7)
    cube2["pos"] = cube2["pos"] + np.array([0.9, 0.2, 0.0], np.float32)
    scene, textures = _phong_scene(meshes=[make_cube(), cube2])
    frame, _, _ = scene.render()
    nframe, _, _ = native.render_scene(
        scene.config.width,
        scene.config.height,
        native.SHADER_PHONG,
        [{k: np.asarray(v) for k, v in d.items()} for d in scene.draws],
        np.asarray(scene.vs_uniform["model"]),
        np.asarray(scene.vs_uniform["view"]),
        np.asarray(scene.vs_uniform["proj"]),
        np.asarray(scene.ps_uniform["view_pos"]),
        textures,
        background=BG,
    )
    diff = np.abs(
        np.asarray(frame).astype(np.int32) - nframe.astype(np.int32)
    ).max(axis=-1)
    assert (diff > 2).mean() <= 0.01


OBJ_TEXT = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
vt 0.5 0.5
vt 0.0 1.0
vt 1.0 0.0
f 1/1/1 2/2/1 3/3/1
"""


def test_obj_parser_matches_python():
    from f_renderer_tpu.io.obj import load_obj

    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(OBJ_TEXT)
        path = f.name
    try:
        verts, norms, uvs, faces = native.load_obj(path)
        model = load_obj(path)
        np.testing.assert_array_equal(verts, model.verts)
        np.testing.assert_array_equal(norms, model.norms)
        np.testing.assert_array_equal(uvs, model.uvs)
        np.testing.assert_array_equal(faces, model.faces)
    finally:
        os.unlink(path)


def _tga_bytes(pixels_bgr, w, h, bpp=24):
    """Build an uncompressed type-2 TGA (bottom-up rows, like most files)."""
    header = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, bpp, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):
        for x in range(w):
            rows.append(bytes(pixels_bgr[y][x][: bpp // 8]))
    return header + b"".join(rows)


def test_tga_decode_bgra_swizzle():
    # 2x2: red, green / blue, white — stored as BGR in the file
    px = [
        [(0, 0, 255), (0, 255, 0)],
        [(255, 0, 0), (255, 255, 255)],
    ]
    data = _tga_bytes(px, 2, 2)
    bgra = native.decode_tga(data, bgra=True)
    rgba = native.decode_tga(data, bgra=False)
    assert bgra.shape == (2, 2, 4)
    # top-left of the image = row 0 = red (r=255) → BGRA (0,0,255,255)
    np.testing.assert_array_equal(bgra[0, 0], [0, 0, 255, 255])
    np.testing.assert_array_equal(rgba[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(rgba[1, 0], [0, 0, 255, 255])
    np.testing.assert_array_equal(bgra[..., 3], 255)


def test_tga_rle_decode():
    # type 10 RLE: one packet repeating a red pixel 4 times (2x2)
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, 2, 2, 24, 0)
    data = header + bytes([0x83, 0, 0, 255])  # RLE run of 4 × BGR(0,0,255)
    rgba = native.decode_tga(data, bgra=False)
    np.testing.assert_array_equal(rgba[..., 0], 255)
    np.testing.assert_array_equal(rgba[..., 2], 0)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    native.write_png(path, frame)
    back = native.read_png(path)
    np.testing.assert_array_equal(back, frame)
    # BGRA read swaps R and B
    bgra = native.read_png(path, bgra=True)
    np.testing.assert_array_equal(bgra[..., 0], frame[..., 2])
    np.testing.assert_array_equal(bgra[..., 2], frame[..., 0])


def test_voxel_native_matches_jnp_march():
    """The C++ recursive-octree fixed-step march (fr_voxel_render — the
    voxel540 CPU baseline) must agree bit-for-bit with the jnp parity path
    over the densified grid (octree.densify equivalence)."""
    import jax.numpy as jnp

    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, flatten, gen_randomly
    from f_renderer_tpu.voxel.raycast import (
        VoxelRenderConfig,
        render_voxel_frame,
    )

    rng = np.random.default_rng(0)
    root = gen_randomly(3, rng)
    svo = flatten(root)
    gc, gh = densify(root, 3)
    w, h, length = 64, 36, 2.0
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    center = np.array([length / 2] * 3, np.float32)
    eye = center + np.array(
        [3.0 * np.cos(0.3), 1.2, 3.0 * np.sin(0.3)], np.float32
    )
    view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
    mvp = proj @ view @ np.asarray(set_identity())
    inv = np.linalg.inv(mvp).astype(np.float32)
    nf = native.voxel_render(w, h, svo, length, 3, eye, inv)
    cfg = VoxelRenderConfig(width=w, height=h, level=3, length=length,
                            backend="jnp")
    jf = np.asarray(
        render_voxel_frame(jnp.asarray(gc), jnp.asarray(gh), eye, inv, cfg)
    )
    np.testing.assert_array_equal(nf, jf)
    assert (nf[..., :3].sum(axis=-1) > 0).any()  # scene actually hit
