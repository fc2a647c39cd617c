"""Measure the single-core CPU baseline for bench.py's ``vs_baseline``.

The reference publishes no numbers (BASELINE.md), so the baseline is our own
native C++ single-threaded implementation of its exact pipeline semantics
(native/src/fr_native.cpp — a faithful stand-in for the Rust reference's
single-threaded renderer, renderer.rs:96-384). Python-loop timing would
inflate the TPU speedup ~100×; the C++ build is the honest comparison.

Writes baselines/cpu_baseline.json: {config: {frame_ms, mpix_per_s, ...}}.

Usage: python baselines/measure_cpu.py [config ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

# Host-only measurement: keep JAX off the TPU tunnel (scene construction
# uses jnp) and out of the axon sitecustomize, mirroring tests/conftest.py.
if os.environ.get("JAX_PLATFORMS") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    "cube512", "cube1080", "gouraud800", "textured1080", "phong1080",
    "stress4k", "voxel540",
]
# Full-frame repetitions per config; heavy configs get fewer.
FRAMES = {
    "cube512": 10, "cube1080": 5, "gouraud800": 5, "textured1080": 3,
    "phong1080": 3, "stress4k": 1, "voxel540": 3,
}
# Shader per config — must match bench.py's build_scene exactly.
SHADER_FOR = {
    "cube512": "phong",
    "cube1080": "flat",
    "gouraud800": "gouraud",
    "textured1080": "textured",
    "phong1080": "phong",
    "stress4k": "phong",
}


def measure_voxel(name: str = "voxel540") -> dict:
    """Native scalar SVO raycast (voxel.rs:139-172 semantics) — the second
    flagship workload's single-core baseline. Same scene/camera as
    bench.bench_voxel (rng seed 0, level-3 octree, 960×540 orbit)."""
    from f_renderer_tpu import native
    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import flatten, gen_randomly

    width, height, level, length = 960, 540, 3, 2.0
    rng = np.random.default_rng(0)
    svo = flatten(gen_randomly(level, rng))
    proj = np.asarray(set_perspective(np.pi * 0.25, width / height, 0.1, 100.0))
    center = np.array([length / 2] * 3, np.float32)

    frames = FRAMES[name]
    t0 = time.time()
    for i in range(frames):
        ang = 0.3 + 0.08 * i
        eye = center + np.array(
            [3.0 * np.cos(ang), 1.2, 3.0 * np.sin(ang)], np.float32
        )
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ np.asarray(set_identity())
        inv_mvp = np.linalg.inv(mvp).astype(np.float32)
        frame = native.voxel_render(
            width, height, svo, length, level, eye, inv_mvp
        )
    dt = (time.time() - t0) / frames
    mray = width * height / dt / 1e6
    rec = {
        "config": name,
        "width": width,
        "height": height,
        "tris": 0,
        "frame_ms": dt * 1e3,
        "mpix_per_s": mray,  # Mrays/s — same unit bench_voxel reports
        "mtris_per_s": 0.0,
        "impl": "native C++ single thread (voxel.rs fixed-step march)",
    }
    print(
        f"[{name}] {width}x{height} level={level} frame={dt * 1e3:.1f}ms "
        f"Mrays/s={mray:.2f}",
        file=sys.stderr,
        flush=True,
    )
    return rec


def measure(name: str) -> dict:
    if name == "voxel540":
        return measure_voxel(name)
    import bench
    from f_renderer_tpu import native
    from f_renderer_tpu.math import set_rotate

    scene = bench.build_scene(name, backend="jnp")
    cfg = scene.config
    draws = [{k: np.asarray(v) for k, v in d.items()} for d in scene.draws]
    n_tris = sum(d["pos"].shape[0] for d in draws)
    textures = [
        np.asarray(t, np.float32)
        for t in np.asarray(scene.ps_uniform["textures"].data)
    ]
    kind = {
        "flat": native.SHADER_FLAT,
        "phong": native.SHADER_PHONG,
        "gouraud": native.SHADER_GOURAUD,
        "textured": native.SHADER_TEXTURED,
    }[SHADER_FOR[name]]
    if kind == native.SHADER_GOURAUD:
        for d in draws:
            d.setdefault(
                "color", np.ones((d["pos"].shape[0], 3, 4), np.float32)
            )

    view = np.asarray(scene.vs_uniform["view"])
    proj = np.asarray(scene.vs_uniform["proj"])
    view_pos = np.asarray(scene.ps_uniform["view_pos"])

    frames = FRAMES[name]
    t0 = time.time()
    for i in range(frames):
        model = np.asarray(set_rotate(np.asarray([0.0, 1.0, 0.0]), 0.1 + 0.05 * i))
        frame, depth, ntris = native.render_scene(
            cfg.width, cfg.height, kind, draws, model, view, proj, view_pos,
            textures, background=cfg.background,
        )
    dt = (time.time() - t0) / frames
    mpix = cfg.width * cfg.height / dt / 1e6
    rec = {
        "config": name,
        "width": cfg.width,
        "height": cfg.height,
        "tris": int(n_tris),
        "frame_ms": dt * 1e3,
        "mpix_per_s": mpix,
        "mtris_per_s": n_tris / dt / 1e6,
        "impl": "native C++ single thread (reference pipeline semantics)",
    }
    print(
        f"[{name}] {cfg.width}x{cfg.height} tris={n_tris} "
        f"frame={dt * 1e3:.1f}ms Mpix/s={mpix:.2f}",
        file=sys.stderr,
        flush=True,
    )
    return rec


def main():
    names = sys.argv[1:] or CONFIGS
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpu_baseline.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in names:
        results[name] = measure(name)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
