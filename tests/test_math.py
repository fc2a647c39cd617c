"""Unit tests for f_renderer_tpu.math against hand-computed values.

Conventions under test are the reference's: LH look-at (matrix_util.rs:11-22),
D3D z in [0,1] perspective (matrix_util.rs:25-35), quaternion axis-angle
rotation (matrix_util.rs:38-67), normalized reflect (vector_util.rs:4-7).
"""

import numpy as np
import pytest

from f_renderer_tpu.math import (
    normalize,
    reflect,
    set_identity,
    set_look_at,
    set_perspective,
    set_rotate,
    set_scale,
    transform_points_h,
)


def apply(m, v):
    return np.asarray(m) @ np.asarray(v, np.float32)


def test_identity():
    np.testing.assert_array_equal(np.asarray(set_identity()), np.eye(4, dtype=np.float32))


def test_look_at_origin_forward_z():
    # Camera at origin looking down +z (LH forward): view = identity.
    m = np.asarray(set_look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_look_at_translation():
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    m = np.asarray(set_look_at(eye, eye + np.array([0, 0, 1], np.float32), [0, 1, 0]))
    # Eye maps to origin.
    p = apply(m, [*eye, 1.0])
    np.testing.assert_allclose(p, [0, 0, 0, 1], atol=1e-5)
    # A point one unit in front of the eye maps to +z.
    p = apply(m, [1.0, 2.0, 4.0, 1.0])
    np.testing.assert_allclose(p, [0, 0, 1, 1], atol=1e-5)


def test_look_at_rows_orthonormal():
    m = np.asarray(set_look_at([3, 1, -2], [0.5, 0, 1], [0, 1, 0]))
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    # LH: z row = normalize(at - eye)
    z = np.array([0.5 - 3, -1, 3], np.float32)
    z /= np.linalg.norm(z)
    np.testing.assert_allclose(m[2, :3], z, atol=1e-6)


def test_perspective_matches_reference_layout():
    fovy, aspect, zn, zf = np.pi * 0.25, 16 / 9, 0.1, 100.0
    m = np.asarray(set_perspective(fovy, aspect, zn, zf))
    fax = 1.0 / np.tan(fovy * 0.5)
    expected = np.zeros((4, 4), np.float32)
    expected[0, 0] = fax / aspect
    expected[1, 1] = fax
    expected[2, 2] = zf / (zf - zn)
    expected[2, 3] = -zn * zf / (zf - zn)
    expected[3, 2] = 1.0
    np.testing.assert_allclose(m, expected, rtol=1e-6)


def test_perspective_depth_range():
    # D3D convention: z_ndc = 0 at near plane, 1 at far plane.
    m = np.asarray(set_perspective(np.pi / 3, 1.0, 0.5, 50.0))
    near = apply(m, [0, 0, 0.5, 1.0])
    far = apply(m, [0, 0, 50.0, 1.0])
    assert near[2] / near[3] == pytest.approx(0.0, abs=1e-6)
    assert far[2] / far[3] == pytest.approx(1.0, abs=1e-6)


def test_rotate_quarter_turn_z():
    m = np.asarray(set_rotate([0, 0, 1], np.pi / 2))
    p = apply(m, [1, 0, 0, 1])
    np.testing.assert_allclose(p, [0, 1, 0, 1], atol=1e-6)


def test_rotate_arbitrary_axis_preserves_axis_and_norm():
    axis = np.array([1.0, 2.0, -0.5], np.float32)
    m = np.asarray(set_rotate(axis, 1.1))
    a4 = np.array([*(axis / np.linalg.norm(axis)), 1.0], np.float32)
    np.testing.assert_allclose(apply(m, a4)[:3], a4[:3], atol=1e-6)
    v = np.array([0.3, -1.0, 2.0, 1.0], np.float32)
    assert np.linalg.norm(apply(m, v)[:3]) == pytest.approx(
        np.linalg.norm(v[:3]), abs=1e-5
    )
    # Proper rotation matrix.
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)


def test_scale():
    m = np.asarray(set_scale(2.0, 3.0, 4.0))
    np.testing.assert_allclose(apply(m, [1, 1, 1, 1]), [2, 3, 4, 1], atol=1e-6)


def test_reflect_mirror():
    # L pointing away from surface along (1,1,0)/sqrt2, N = +y:
    # R = 2(L·N)N - L = (-lx, ly, 0), normalized.
    l = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
    r = np.asarray(reflect(l, [0, 1, 0]))
    np.testing.assert_allclose(r, [-l[0], l[1], 0.0], atol=1e-6)


def test_reflect_is_normalized():
    r = np.asarray(reflect([0.2, 3.0, -1.0], [0, 1, 0]))
    assert np.linalg.norm(r) == pytest.approx(1.0, abs=1e-6)


def test_transform_points_h_batched():
    m = np.asarray(set_perspective(np.pi / 4, 1.0, 0.1, 100.0))
    pts = np.array([[0.1, -0.2, 5.0], [1.0, 2.0, 3.0]], np.float32)
    out = np.asarray(transform_points_h(m, pts))
    for i in range(2):
        np.testing.assert_allclose(out[i], apply(m, [*pts[i], 1.0]), rtol=1e-5)
