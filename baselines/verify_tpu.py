"""On-device validation: render on the real TPU and diff against host truth.

Renders the flagship multi-mesh Phong scene through the production path
(fused Pallas kernel) on the TPU, and through the native C++ reference
implementation on the host, then compares per-pixel. Catches Mosaic
miscompiles / numerical drift that CPU interpret-mode tests cannot.

Usage: python baselines/verify_tpu.py  (needs the TPU; exits nonzero on fail)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    from f_renderer_tpu import native
    from f_renderer_tpu.scene import (
        make_checker_texture,
        make_cube,
        make_phong_scene,
        make_uv_sphere,
    )

    assert jax.default_backend() == "tpu", "run on the real chip"
    sphere = make_uv_sphere(20, 40, radius=0.8)
    sphere["pos"] = sphere["pos"] + np.array([0, 1.2, 0], np.float32)
    cube = make_cube(0.9)
    meshes = [sphere, cube]
    textures = [make_checker_texture()] * 2
    scene = make_phong_scene(
        320, 240, meshes=meshes, textures=textures, clip_cap=64,
        backend="pallas",
    )
    frame, depth, _ = scene.render()
    frame = np.asarray(frame)
    depth = np.asarray(depth)

    nframe, ndepth, ntris = native.render_scene(
        320, 240, native.SHADER_PHONG,
        [{k: np.asarray(v) for k, v in d.items()} for d in scene.draws],
        np.asarray(scene.vs_uniform["model"]),
        np.asarray(scene.vs_uniform["view"]),
        np.asarray(scene.vs_uniform["proj"]),
        np.asarray(scene.ps_uniform["view_pos"]),
        # the pipeline's texel values (u8-backed stack) — native must sample
        # the same data
        list(np.asarray(scene.ps_uniform["textures"].data)),
        background=(30, 30, 30, 255),
    )
    diff = np.abs(frame.astype(np.int32) - nframe.astype(np.int32)).max(axis=-1)
    # TPU f32 (FMA contraction, transcendental ulps) legitimately flips
    # pixel ownership along triangle edges — integer spi rounding and the
    # atan2 clip sort are knife-edge there. Grade interiors strictly and
    # report edges separately: an interior mismatch means a real miscompile.
    d = ndepth
    local_max = d.copy()
    local_min = d.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = np.roll(np.roll(d, dy, 0), dx, 1)
            local_max = np.maximum(local_max, s)
            local_min = np.minimum(local_min, s)
    edge = (local_max - local_min) > 1e-3 * np.maximum(local_max, 1e-9)
    interior = ~edge
    bad_all = (diff > 2).mean()
    bad_int = (diff[interior] > 2).mean()
    both = (depth > 0) & (ndepth > 0) & interior
    depth_ok = np.allclose(depth[both], ndepth[both], rtol=1e-3)
    covered = int((frame[..., 0] != 30).sum())
    print(
        f"tpu-vs-native: interior {bad_int:.3%} differ>2 (all {bad_all:.3%}),"
        f" interior_depth_ok={depth_ok}, covered={covered}, tris={ntris}"
    )
    ok = bad_int <= 0.002 and depth_ok and covered > 5000
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
