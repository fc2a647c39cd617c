"""Camera (reference: camera.rs) plus orbit/pan/zoom controls (phong.rs:217-311).

The reference `Camera` caches a look-at matrix and recomputes it after
mutation (camera.rs:21-25). Here the camera is an immutable pytree-friendly
dataclass; `look_at()` derives the view matrix, and the interactive controls
are pure functions returning a new camera — jit/scan-friendly so camera
animation can live inside a compiled frame loop.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from f_renderer_tpu.math import normalize, set_look_at, set_rotate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """eye/at/up camera (camera.rs:4-9). Fields are (3,) f32 arrays."""

    eye: jnp.ndarray
    at: jnp.ndarray
    up: jnp.ndarray

    @staticmethod
    def create(eye, at, up) -> "Camera":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(eye=f32(eye), at=f32(at), up=f32(up))

    def look_at(self) -> jnp.ndarray:
        """View matrix (camera.rs:12-19 → matrix_util.rs:11)."""
        return set_look_at(self.eye, self.at, self.up)


def zoom(camera: Camera, scroll_y, min_dist=-1.0, max_dist=20.0) -> Camera:
    """Mouse-wheel zoom along the view axis (phong.rs:222-235).

    Moves the eye toward/away from `at` by ``0.2 * scroll_y``, gated by the
    reference's distance clamp ``(-1 < d && y > 0) || (d < 20 && y < 0)``.
    """
    scroll_y = jnp.asarray(scroll_y, jnp.float32)
    forward = normalize(camera.eye - camera.at)
    distance = jnp.linalg.norm(camera.eye - camera.at)
    allowed = ((distance > min_dist) & (scroll_y > 0)) | (
        (distance < max_dist) & (scroll_y < 0)
    )
    new_eye = forward * (distance - scroll_y * 0.2) + camera.at
    eye = jnp.where(allowed, new_eye, camera.eye)
    return dataclasses.replace(camera, eye=eye)


def orbit(camera: Camera, delta_x, delta_y, ratio=0.005) -> Camera:
    """Right-mouse-drag orbit around `at` (phong.rs:287-298).

    Rotates the eye→at vector horizontally around `up` and vertically around
    the camera-right axis; `up` is re-derived to stay orthogonal.
    """
    delta_x = jnp.asarray(delta_x, jnp.float32)
    delta_y = jnp.asarray(delta_y, jnp.float32)
    forward = camera.at - camera.eye
    right = normalize(jnp.cross(forward, camera.up))
    rot_h = set_rotate(camera.up, delta_x * math.pi * ratio)
    rot_v = set_rotate(right, -delta_y * math.pi * ratio)
    f4 = jnp.concatenate([forward, jnp.ones((1,), jnp.float32)])
    f4 = rot_v @ (rot_h @ f4)
    new_forward = f4[:3]
    up = normalize(jnp.cross(right, new_forward))
    eye = camera.at - new_forward
    return dataclasses.replace(camera, eye=eye, up=up)


def pan(camera: Camera, delta_x, delta_y, ratio=0.01) -> Camera:
    """Middle-mouse-drag pan in the view plane (phong.rs:299-305)."""
    delta_x = jnp.asarray(delta_x, jnp.float32)
    delta_y = jnp.asarray(delta_y, jnp.float32)
    forward = camera.at - camera.eye
    right = normalize(jnp.cross(forward, camera.up))
    up = normalize(camera.up)
    offset = (up * delta_y + right * delta_x) * ratio
    return dataclasses.replace(camera, eye=camera.eye - offset, at=camera.at - offset)
