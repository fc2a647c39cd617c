"""Tests for OBJ parsing and texture loading (obj_loader.rs, renderer.rs:427-471)."""

import numpy as np
import pytest

from f_renderer_tpu.io import load_obj, load_texture

OBJ_TEXT = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
v 1.0 1.0 0.5
vn 0.0 0.0 2.0
vn 0.0 1.0 0.0
vt 0.0 0.0
vt 1.0 0.0
vt 0.0 1.0
f 1/1/1 2/2/1 3/3/2
f 2/2/2 4/1/1 3/3/2 1/1/1
"""


def test_load_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(OBJ_TEXT)
    m = load_obj(str(p))
    assert m.faces_len == 2
    np.testing.assert_allclose(m.vert(0, 1), [1, 0, 0])
    np.testing.assert_allclose(m.uv(0, 2), [0, 1])
    # normals re-normalized on access (obj_loader.rs:95)
    np.testing.assert_allclose(m.normal(0, 0), [0, 0, 1])
    # quads: only first three corners read (obj_loader.rs:58)
    assert m.faces.shape == (2, 3, 3)
    np.testing.assert_array_equal(m.faces[1, :, 0], [1, 3, 2])


def test_load_obj_crlf(tmp_path):
    p = tmp_path / "crlf.obj"
    p.write_bytes(OBJ_TEXT.replace("\n", "\r\n").encode())
    m = load_obj(str(p))
    assert m.faces_len == 2
    np.testing.assert_allclose(m.vert(1, 1), [1, 1, 0.5])


def test_corners_soa(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(OBJ_TEXT)
    m = load_obj(str(p))
    c = m.corners()
    assert c["pos"].shape == (2, 3, 3)
    assert c["uv"].shape == (2, 3, 2)
    assert c["normal"].shape == (2, 3, 3)
    np.testing.assert_allclose(np.linalg.norm(c["normal"], axis=-1), 1.0, rtol=1e-6)


def test_load_texture_bgra_swizzle(tmp_path):
    from PIL import Image

    rgb = np.zeros((2, 3, 3), np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[1, 2] = [0, 128, 64]
    Image.fromarray(rgb, "RGB").save(tmp_path / "t.png")
    tex = load_texture(str(tmp_path / "t.png"))
    # BGRA: red texel stored as (b=0, g=0, r=255, a=255) (renderer.rs:442-445)
    np.testing.assert_array_equal(tex[0, 0], [0, 0, 255, 255])
    np.testing.assert_array_equal(tex[1, 2], [64, 128, 0, 255])
    tex_rgba = load_texture(str(tmp_path / "t.png"), bgra=False)
    np.testing.assert_array_equal(tex_rgba[0, 0], [255, 0, 0, 255])


def test_load_texture_rgba(tmp_path):
    from PIL import Image

    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[0, 1] = [10, 20, 30, 40]
    Image.fromarray(rgba, "RGBA").save(tmp_path / "t.png")
    tex = load_texture(str(tmp_path / "t.png"))
    np.testing.assert_array_equal(tex[0, 1], [30, 20, 10, 40])


def test_save_png_roundtrip(tmp_path):
    from f_renderer_tpu.io import save_png

    frame = np.random.default_rng(0).integers(0, 256, (4, 5, 4)).astype(np.uint8)
    save_png(str(tmp_path / "f.png"), frame)
    back = load_texture(str(tmp_path / "f.png"), bgra=False)
    np.testing.assert_array_equal(back, frame)


def test_obj_tga_asset_flow(tmp_path):
    """End-to-end: OBJ parse → corners → render with a TGA texture
    (the phong.rs:166-171 asset flow)."""
    import struct

    import jax.numpy as jnp

    from f_renderer_tpu import native
    from f_renderer_tpu.io.obj import load_obj
    from f_renderer_tpu.scene import make_phong_scene

    obj = (
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\nv 0 1.5 0\n"
        "vn 0 1 0\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\nvt 0.5 0.5\n"
        "f 1/1/1 2/2/1 5/5/1\nf 2/2/1 3/3/1 5/5/1\n"
        "f 3/3/1 4/4/1 5/5/1\nf 4/4/1 1/1/1 5/5/1\n"
        "f 1/1/1 3/3/1 2/2/1\nf 1/1/1 4/4/1 3/3/1\n"
    )
    p = tmp_path / "pyr.obj"
    p.write_text(obj)
    model = load_obj(str(p))
    assert model.faces_len == 6
    corners = model.corners()
    assert corners["pos"].shape == (6, 3, 3)

    if native.is_available():
        w = h = 16
        header = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 24, 0)
        px = bytes()
        for y in range(h - 1, -1, -1):
            for x in range(w):
                px += bytes([x * 16 % 256, y * 16 % 256, 200])
        tex = native.decode_tga(header + px)
        assert tex.shape == (16, 16, 4)
    else:
        tex = np.full((16, 16, 4), 128, np.uint8)

    scene = make_phong_scene(
        96, 72, meshes=[corners], textures=[tex], clip_cap=16
    )
    frame, _, _ = scene.render()
    assert (np.asarray(frame)[..., 0] != 30).sum() > 200
