"""Matrix / vector math with the reference renderer's exact conventions.

Conventions (all cited against /root/reference):

- Matrices are ``(4, 4)`` arrays applied to column vectors: ``clip = M @ v``.
  The reference uses glam column-major ``Mat4`` with ``M * v`` semantics
  (matrix_util.rs:16-21); entry-for-entry our ``M[r, c]`` equals glam's
  ``cols[c][r]``, so ``M @ v`` reproduces glam exactly.
- **Left-handed** look-at: forward axis ``z = normalize(at - eye)``
  (matrix_util.rs:11-22).
- **D3D-style** perspective, z mapped to ``[0, 1]``, LH
  (matrix_util.rs:25-35).
- Axis-angle rotation via quaternion expansion (matrix_util.rs:38-67).
- ``reflect(L, N) = normalize(2 (L·N) N - L)`` — note the *normalize*, and L
  points away from the surface (vector_util.rs:4-7; callers negate the light
  direction, phong.rs:142).

Everything is plain jnp, jit/vmap-friendly, f32.
"""

from __future__ import annotations

import jax.numpy as jnp


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def normalize(v):
    """v / |v| (no epsilon — matches glam release-mode semantics)."""
    v = _f32(v)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=v.ndim > 1)


def set_identity():
    """matrix_util.rs:4-8."""
    return jnp.eye(4, dtype=jnp.float32)


def set_look_at(eye, at, up):
    """Left-handed look-at view matrix (matrix_util.rs:11-22).

    Rows 0..2 are the camera x/y/z axes; translation is ``-eye·axis``.
    """
    eye, at, up = _f32(eye), _f32(at), _f32(up)
    z_axis = normalize(at - eye)
    x_axis = normalize(jnp.cross(up, z_axis))
    y_axis = jnp.cross(z_axis, x_axis)
    t = jnp.stack(
        [-jnp.dot(eye, x_axis), -jnp.dot(eye, y_axis), -jnp.dot(eye, z_axis)]
    )
    m = jnp.concatenate(
        [
            jnp.stack([x_axis, y_axis, z_axis], axis=0),
            jnp.zeros((1, 3), jnp.float32),
        ],
        axis=0,
    )
    last_col = jnp.concatenate([t, jnp.ones((1,), jnp.float32)])
    return jnp.concatenate([m, last_col[:, None]], axis=1)


def set_perspective(fovy, aspect, zn, zf):
    """LH, D3D z∈[0,1] perspective projection (matrix_util.rs:25-35).

    ``M = [[fax/aspect,0,0,0], [0,fax,0,0], [0,0,zf/(zf-zn),-zn*zf/(zf-zn)],
    [0,0,1,0]]`` with ``fax = 1/tan(fovy/2)``.
    """
    fovy = _f32(fovy)
    aspect = _f32(aspect)
    zn = _f32(zn)
    zf = _f32(zf)
    fax = 1.0 / jnp.tan(fovy * 0.5)
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    rows = [
        jnp.stack([fax / aspect, zero, zero, zero]),
        jnp.stack([zero, fax, zero, zero]),
        jnp.stack([zero, zero, zf / (zf - zn), -zn * zf / (zf - zn)]),
        jnp.stack([zero, zero, one, zero]),
    ]
    return jnp.stack(rows, axis=0)


def set_rotate(axis, theta):
    """Axis-angle rotation matrix via quaternion expansion (matrix_util.rs:38-67)."""
    axis = normalize(_f32(axis))
    theta = _f32(theta)
    q_sin = jnp.sin(theta * 0.5)
    w = jnp.cos(theta * 0.5)
    x, y, z = axis[0] * q_sin, axis[1] * q_sin, axis[2] * q_sin
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    # Rows of the standard quaternion rotation matrix (glam from_cols at
    # matrix_util.rs:46-66 transposed into row-major M @ v form).
    rows = [
        jnp.stack([1.0 - 2.0 * y * y - 2.0 * z * z, 2.0 * x * y - 2.0 * w * z, 2.0 * x * z + 2.0 * w * y, zero]),
        jnp.stack([2.0 * x * y + 2.0 * w * z, 1.0 - 2.0 * x * x - 2.0 * z * z, 2.0 * y * z - 2.0 * w * x, zero]),
        jnp.stack([2.0 * x * z - 2.0 * w * y, 2.0 * y * z + 2.0 * w * x, 1.0 - 2.0 * x * x - 2.0 * y * y, zero]),
        jnp.stack([zero, zero, zero, one]),
    ]
    return jnp.stack(rows, axis=0)


def set_scale(x, y, z):
    """Diagonal scale matrix (matrix_util.rs:71-78)."""
    return jnp.diag(jnp.stack([_f32(x), _f32(y), _f32(z), jnp.ones((), jnp.float32)]))


def reflect(light, normal):
    """``normalize(2 (L·N) N - L)`` (vector_util.rs:4-7).

    Batched: ``light``/``normal`` may have leading dims; reflection is over the
    last axis.
    """
    light = _f32(light)
    normal = _f32(normal)
    d = jnp.sum(light * normal, axis=-1, keepdims=True)
    return normalize(2.0 * d * normal - light)


def transform_points_h(m, points):
    """Apply a 4x4 matrix to a batch of 3D points with homogeneous w=1.

    ``points``: (..., 3) → returns (..., 4) clip-space positions. This is the
    batched MXU form of the reference's per-vertex ``mvp * vec4(pos, 1)``
    (phong.rs:125).
    """
    m = _f32(m)
    points = _f32(points)
    xyz = points @ m[:3, :3].T + m[:3, 3]
    w = points @ m[3, :3].T + m[3, 3]
    return jnp.concatenate([xyz, w[..., None]], axis=-1)
