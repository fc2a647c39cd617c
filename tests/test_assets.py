"""Checked-in real asset path (VERDICT r4 #7; phong.rs:166-205).

``tests/data/torus.obj`` (320-face torus with vt/vn) and
``tests/data/torus_diffuse.tga`` (64×64 type-2 24bpp) are committed files —
the test exercises the FULL asset pipeline the reference's phong example
runs: OBJ parse (obj_loader.rs:15-74) → per-corner gather → TGA decode with
the BGRA load swizzle (renderer.rs:427-471) → phong scene → frame, compared
pixel-for-pixel against the scalar golden oracle.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from f_renderer_tpu.framebuffer import sample_2d as np_sample_2d
from f_renderer_tpu.golden import render_scene as golden_render
from f_renderer_tpu.io import load_obj, load_texture
from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
from f_renderer_tpu.scene import make_phong_scene
from f_renderer_tpu.shaders.builtin import (
    AMBIENT_STRENGTH,
    LIGHT_COLOR,
    LIGHT_POS,
    SHININESS,
    SPECULAR_STRENGTH,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
OBJ = os.path.join(DATA, "torus.obj")
TGA = os.path.join(DATA, "torus_diffuse.tga")

W, H = 80, 60
BG = (30, 30, 30, 255)


def test_torus_obj_parse():
    m = load_obj(OBJ)
    assert m.faces_len == 320
    assert m.verts.shape == (160, 3)
    assert m.norms.shape == (160, 3)
    assert m.uvs.shape == (17 * 11, 2)
    c = m.corners()
    assert c["pos"].shape == (320, 3, 3)
    assert c["uv"].shape == (320, 3, 2)
    # torus invariant: every vertex is r=0.4 from the R=1.0 spine circle
    p = c["pos"].reshape(-1, 3)
    spine = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
    d = np.sqrt((spine - 1.0) ** 2 + p[:, 1] ** 2)
    np.testing.assert_allclose(d, 0.4, atol=1e-5)
    # normals unit + consistent with positions
    n = c["normal"].reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_torus_obj_native_parser_agrees():
    from f_renderer_tpu import native

    if not native.is_available():
        pytest.skip("native lib unavailable")
    verts, norms, uvs, faces = native.load_obj(OBJ)
    m = load_obj(OBJ)
    np.testing.assert_array_equal(verts, m.verts)
    np.testing.assert_array_equal(norms, m.norms)
    np.testing.assert_array_equal(uvs, m.uvs)
    np.testing.assert_array_equal(faces, m.faces)


def test_torus_tga_decode():
    tex = load_texture(TGA)  # BGRA swizzle default (renderer.rs:442-445)
    assert tex.shape == (64, 64, 4)
    assert (tex[..., 3] == 255).all()
    rgba = load_texture(TGA, bgra=False)
    np.testing.assert_array_equal(tex[..., :3], rgba[..., 2::-1])
    # G channel is the x gradient in the generated map
    assert rgba[0, 0, 1] == 0 and rgba[0, 63, 1] == 255

    from f_renderer_tpu import native

    if native.is_available():
        with open(TGA, "rb") as f:
            raw = f.read()
        np.testing.assert_array_equal(native.decode_tga(raw, bgra=True), tex)


def _np_normalize(v):
    return v / np.float32(np.linalg.norm(v))


def _np_phong_ps(tex_f32, view_pos):
    lp = np.asarray(LIGHT_POS, np.float32)
    lc = np.asarray(LIGHT_COLOR, np.float32)
    vp = np.asarray(view_pos, np.float32)

    def ps(u, ctx):
        uv, n, wp = ctx[:2], ctx[2:5], ctx[5:8]
        n = _np_normalize(n)
        light_dir = _np_normalize(lp - wp)
        diff = max(float(np.dot(n, light_dir)), 0.0)
        view_dir = _np_normalize(vp - wp)
        # math/transforms.py reflect(l, n) = normalize(2 (l·n) n - l)
        # (vector_util.rs:4-7 — NOT the GLSL i - 2(i·n)n form)
        i = -light_dir
        refl = _np_normalize(2.0 * np.dot(i, n) * n - i)
        spec = max(float(np.dot(view_dir, refl)), 0.0) ** SHININESS
        light = lc * (AMBIENT_STRENGTH + diff + SPECULAR_STRENGTH * spec)
        color = np_sample_2d(tex_f32, uv)
        return color * np.append(light, np.float32(1.0)).astype(np.float32)

    return ps


def test_torus_asset_golden_frame():
    """Full path vs oracle: the frame rendered from the committed OBJ+TGA
    must match the scalar reference-semantics render."""
    m = load_obj(OBJ)
    corners = m.corners()
    tex_u8 = load_texture(TGA)  # BGRA — colors flow through shading in BGR
    eye = [0.0, 1.2, 3.0]
    from f_renderer_tpu.camera import Camera

    cam = Camera.create(eye, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    scene = make_phong_scene(
        W, H, meshes=[corners], textures=[tex_u8], camera=cam, clip_cap=64
    )
    frame, depth, _ = scene.render()

    # golden mirror: identical matrices, f32 row-major transforms
    model = np.asarray(set_identity(), np.float32)
    view = np.asarray(cam.look_at(), np.float32)
    proj = np.asarray(
        set_perspective(np.pi * 0.25, W / H, 0.1, 100.0), np.float32
    )

    def np_vs(u, vin):
        mvp = (proj @ (view @ model)).astype(np.float32)
        p = np.append(np.asarray(vin["pos"], np.float32), np.float32(1.0))
        clip = np.array(
            [
                ((mvp[i, 0] * p[0] + mvp[i, 1] * p[1]) + mvp[i, 2] * p[2])
                + mvp[i, 3] * p[3]
                for i in range(4)
            ],
            np.float32,
        )
        world = np.array(
            [
                ((model[i, 0] * p[0] + model[i, 1] * p[1]) + model[i, 2] * p[2])
                + model[i, 3] * p[3]
                for i in range(3)
            ],
            np.float32,
        )
        ctx = np.concatenate(
            [np.asarray(vin["uv"], np.float32), np.asarray(vin["normal"], np.float32), world]
        )
        return clip, ctx

    tex_f32 = tex_u8.astype(np.float32) / 255.0
    np_ps = _np_phong_ps(tex_f32, eye)

    pos, uv, nrm = corners["pos"], corners["uv"], corners["normal"]
    gdraws = [
        (
            [
                [
                    {"pos": pos[f, c], "uv": uv[f, c], "normal": nrm[f, c]}
                    for c in range(3)
                ]
                for f in range(pos.shape[0])
            ],
            {},
        )
    ]
    gframe, gdepth = golden_render(W, H, gdraws, np_vs, {}, np_ps, background=BG)

    frame = np.asarray(frame)
    diff = np.abs(frame.astype(np.int32) - gframe.astype(np.int32)).max(axis=-1)
    bad = (diff > 2).mean()
    assert bad <= 0.01, f"{bad:.2%} pixels differ by more than 2"
    # the torus must actually cover a meaningful part of the frame
    assert (frame[..., 0] != BG[0]).sum() > 800
    both = (np.asarray(depth) > 0) & (gdepth > 0)
    assert both.any()
    np.testing.assert_allclose(np.asarray(depth)[both], gdepth[both], rtol=1e-3)
