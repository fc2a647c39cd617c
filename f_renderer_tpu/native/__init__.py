"""ctypes bindings for the native (C++) runtime library.

The reference implementation is 100% native Rust; ``libfr_native.so`` is the
C++ analogue of its host-side runtime (see native/src/fr_native.cpp):

- :func:`render_scene` — single-threaded scalar pipeline with the reference's
  exact geometry/raster semantics (renderer.rs:96-384). Used as the CPU
  baseline for bench ``vs_baseline`` and as a fast golden-image oracle.
- :func:`load_obj` — OBJ parser (obj_loader.rs:15-74).
- :func:`decode_tga` / :func:`read_png` / :func:`write_png` — image codecs
  with the reference's BGRA load swizzle (renderer.rs:427-471).

The library is built on demand with ``make -C native`` (g++, libpng, zlib —
all baked into the image). Every caller should gate on :func:`is_available`;
pure-Python fallbacks exist for all functionality (golden/scalar.py, io/).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_DIR))
_SO = os.path.join(_DIR, "libfr_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

SHADER_FLAT, SHADER_GOURAUD, SHADER_TEXTURED, SHADER_PHONG = 0, 1, 2, 3

_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    makefile = os.path.join(_REPO, "native", "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, OSError):
        return False
    return os.path.exists(_SO)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)

    lib.fr_render_scene.restype = ctypes.c_int64
    lib.fr_render_scene.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _i64p,
        _f32p, _f32p, _f32p, _f32p,
        _f32p, _f32p, _f32p,
        _f32p, _f32p, _f32p,
        _f32p, _i32p, ctypes.c_int,
        _u8p,
        _u8p, _f32p,
    ]
    lib.fr_obj_load.restype = ctypes.c_void_p
    lib.fr_obj_load.argtypes = [ctypes.c_char_p]
    lib.fr_obj_counts.argtypes = [ctypes.c_void_p, _i64p, _i64p, _i64p, _i64p]
    lib.fr_obj_copy.argtypes = [ctypes.c_void_p, _f32p, _f32p, _f32p, _i32p]
    lib.fr_obj_free.argtypes = [ctypes.c_void_p]
    lib.fr_tga_decode.restype = ctypes.c_int
    lib.fr_tga_decode.argtypes = [
        _u8p, ctypes.c_int64, ctypes.c_int, _i32p, _i32p, _u8p,
    ]
    lib.fr_png_write.restype = ctypes.c_int
    lib.fr_png_write.argtypes = [ctypes.c_char_p, _u8p, ctypes.c_int, ctypes.c_int]
    lib.fr_png_read.restype = ctypes.c_int
    lib.fr_png_read.argtypes = [ctypes.c_char_p, ctypes.c_int, _i32p, _i32p, _u8p]
    lib.fr_voxel_render.restype = None
    lib.fr_voxel_render.argtypes = [
        ctypes.c_int, ctypes.c_int,
        _i32p, _i32p, _i32p, _u8p,
        ctypes.c_float, ctypes.c_int,
        _f32p, _f32p,
        _u8p,
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def _fptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(_f32p)


def render_scene(
    width: int,
    height: int,
    shader_kind: int,
    draws: Sequence[dict],
    model: np.ndarray,
    view: np.ndarray,
    proj: np.ndarray,
    view_pos,
    textures: Sequence[np.ndarray] = (),
    background=(0, 0, 0, 255),
    light_pos=(1.2, 1.0, 2.0),
    light_color=(1.0, 1.0, 1.0),
):
    """Native scalar full-frame render. Returns (frame (H,W,4) u8, depth, ntris).

    ``draws``: list of dicts with per-face-corner arrays ``pos`` (F,3,3) and
    optionally ``uv`` (F,3,2), ``normal`` (F,3,3), ``color`` (F,3,4).
    ``textures``: list of (h,w,4) float32 [0,1] arrays.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"

    def cat(key, tail):
        parts = [np.asarray(d[key], np.float32) for d in draws if key in d]
        if len(parts) != len(draws):
            return None
        return np.ascontiguousarray(np.concatenate(parts).reshape(-1, *tail))

    pos = cat("pos", (3, 3))
    uv = cat("uv", (3, 2))
    normal = cat("normal", (3, 3))
    color = cat("color", (3, 4))
    assert pos is not None
    faces = np.asarray(
        [np.asarray(d["pos"]).shape[0] for d in draws], np.int64
    )

    tex_list = [np.ascontiguousarray(np.asarray(t, np.float32)) for t in textures]
    if tex_list:
        tex_data = np.concatenate([t.reshape(-1) for t in tex_list])
        tex_dims = np.asarray([[t.shape[0], t.shape[1]] for t in tex_list], np.int32)
    else:
        tex_data = np.zeros((4,), np.float32)
        tex_dims = np.asarray([[1, 1]], np.int32)

    frame = np.empty((height, width, 4), np.uint8)
    depth = np.empty((height, width), np.float32)
    bg = np.ascontiguousarray(np.asarray(background, np.uint8))
    m = np.ascontiguousarray(np.asarray(model, np.float32))
    v = np.ascontiguousarray(np.asarray(view, np.float32))
    p = np.ascontiguousarray(np.asarray(proj, np.float32))
    vp = np.ascontiguousarray(np.asarray(view_pos, np.float32))
    lp = np.ascontiguousarray(np.asarray(light_pos, np.float32))
    lc = np.ascontiguousarray(np.asarray(light_color, np.float32))

    ntris = lib.fr_render_scene(
        width, height, shader_kind,
        len(draws), faces.ctypes.data_as(_i64p),
        _fptr(pos), _fptr(uv), _fptr(normal), _fptr(color),
        _fptr(m), _fptr(v), _fptr(p),
        _fptr(vp), _fptr(lp), _fptr(lc),
        _fptr(np.ascontiguousarray(tex_data)),
        tex_dims.ctypes.data_as(_i32p), len(tex_list) or 1,
        bg.ctypes.data_as(_u8p),
        frame.ctypes.data_as(_u8p), depth.ctypes.data_as(_f32p),
    )
    return frame, depth, int(ntris)


def voxel_render(
    width: int,
    height: int,
    svo,
    length: float,
    level: int,
    eye,
    inv_mvp,
) -> np.ndarray:
    """Native scalar SVO raycast frame (voxel.rs:135-416 semantics).

    ``svo``: octree.SvoArrays (flat node-table form). Returns (H, W, 4) u8
    BGRA. Single-threaded — the CPU baseline for the voxel540 bench config.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    valid = np.ascontiguousarray(svo.valid_mask, np.int32)
    leafm = np.ascontiguousarray(svo.leaf_mask, np.int32)
    child = np.ascontiguousarray(svo.child_index, np.int32)
    color = np.ascontiguousarray(svo.leaf_color, np.uint8)
    eye = np.ascontiguousarray(eye, np.float32)
    inv_mvp = np.ascontiguousarray(inv_mvp, np.float32)
    out = np.zeros((height, width, 4), np.uint8)
    lib.fr_voxel_render(
        width, height,
        valid.ctypes.data_as(_i32p), leafm.ctypes.data_as(_i32p),
        child.ctypes.data_as(_i32p), color.ctypes.data_as(_u8p),
        ctypes.c_float(length), level,
        eye.ctypes.data_as(_f32p), inv_mvp.ctypes.data_as(_f32p),
        out.ctypes.data_as(_u8p),
    )
    return out


def load_obj(path: str):
    """Native OBJ parse. Returns (verts, norms, uvs, faces) numpy arrays."""
    lib = _load()
    assert lib is not None
    h = lib.fr_obj_load(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        nv = ctypes.c_int64()
        nn = ctypes.c_int64()
        nt = ctypes.c_int64()
        nf = ctypes.c_int64()
        lib.fr_obj_counts(h, ctypes.byref(nv), ctypes.byref(nn),
                          ctypes.byref(nt), ctypes.byref(nf))
        verts = np.empty((nv.value, 3), np.float32)
        norms = np.empty((nn.value, 3), np.float32)
        uvs = np.empty((nt.value, 2), np.float32)
        faces = np.empty((nf.value, 3, 3), np.int32)
        lib.fr_obj_copy(h, _fptr(verts), _fptr(norms), _fptr(uvs),
                        faces.ctypes.data_as(_i32p))
        return verts, norms, uvs, faces
    finally:
        lib.fr_obj_free(h)


def decode_tga(data: bytes, *, bgra: bool = True) -> np.ndarray:
    """Decode a TGA byte buffer to (H, W, 4) u8 (BGRA by default)."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.fr_tga_decode(buf.ctypes.data_as(_u8p), len(data), int(bgra),
                           ctypes.byref(w), ctypes.byref(h), None)
    if rc != 0:
        raise ValueError(f"TGA decode failed: {rc}")
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.fr_tga_decode(buf.ctypes.data_as(_u8p), len(data), int(bgra),
                           ctypes.byref(w), ctypes.byref(h),
                           out.ctypes.data_as(_u8p))
    if rc != 0:
        raise ValueError(f"TGA decode failed: {rc}")
    return out


def write_png(path: str, frame: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    frame = np.ascontiguousarray(np.asarray(frame, np.uint8))
    if frame.ndim == 2:
        frame = np.repeat(frame[..., None], 4, axis=-1)
    if frame.shape[-1] == 3:
        frame = np.concatenate(
            [frame, np.full((*frame.shape[:2], 1), 255, np.uint8)], axis=-1
        )
    rc = lib.fr_png_write(path.encode(), frame.ctypes.data_as(_u8p),
                          frame.shape[1], frame.shape[0])
    if rc != 0:
        raise IOError(f"PNG write failed: {rc}")


def read_png(path: str, *, bgra: bool = False) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.fr_png_read(path.encode(), int(bgra), ctypes.byref(w),
                         ctypes.byref(h), None)
    if rc != 0:
        raise IOError(f"PNG read failed: {rc}")
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.fr_png_read(path.encode(), int(bgra), ctypes.byref(w),
                         ctypes.byref(h), out.ctypes.data_as(_u8p))
    if rc != 0:
        raise IOError(f"PNG read failed: {rc}")
    return out
