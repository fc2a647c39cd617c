"""Benchmark harness — run on the real TPU chip (plain `python bench.py`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: shaded Mpixels/sec on the multi-mesh Phong 1080p scene
(BASELINE.json config #4 — the phong.rs workload shape). ``vs_baseline``
compares against the single-core CPU reference implementation measured by
``baselines/measure_cpu.py`` into ``baselines/cpu_baseline.json`` (the
reference repo publishes no numbers — BASELINE.md).

Env knobs: BENCH_CONFIG (phong1080 | cube512 | gouraud800 | textured1080 |
stress4k | all), BENCH_FRAMES (default 20), BENCH_BACKEND (pallas | jnp).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_scene(name: str, backend: str):
    import jax.numpy as jnp

    from f_renderer_tpu.scene import (
        make_checker_texture,
        make_cube,
        make_instanced_soup,
        make_phong_scene,
        make_uv_sphere,
    )

    if name == "cube512":
        return make_phong_scene(512, 512, meshes=[make_cube()], backend=backend)
    if name == "gouraud800":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(36, 72)  # ~5.2k tris
        cam = Camera.create([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        return make_phong_scene(800, 600, meshes=[sphere], camera=cam, backend=backend)
    if name == "textured1080":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(48, 96)
        cam = Camera.create([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        return make_phong_scene(
            1920, 1080, meshes=[sphere], camera=cam, backend=backend
        )
    if name == "phong1080":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(40, 80)
        cube = make_cube(0.8)
        cube["pos"] = cube["pos"] + np.array([1.6, 0.0, 0.0], np.float32)
        cube2 = make_cube(0.8)
        cube2["pos"] = cube2["pos"] + np.array([-1.6, 0.0, 0.0], np.float32)
        cam = Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        return make_phong_scene(
            1920,
            1080,
            meshes=[sphere, cube, cube2],
            textures=[make_checker_texture(128, 8)] * 3,
            camera=cam,
            backend=backend,
        )
    if name == "stress4k":
        from f_renderer_tpu.camera import Camera

        soup = make_instanced_soup(1_000_000)
        cam = Camera.create([0.0, 0.0, -2.0], [0.0, 0.0, 10.0], [0.0, 1.0, 0.0])
        return make_phong_scene(
            3840, 2160, meshes=[soup], camera=cam, clip_cap=8192, backend=backend
        )
    raise ValueError(name)


def bench_config(name: str, frames: int, backend: str):
    import jax
    import jax.numpy as jnp

    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline import render_frame

    scene = build_scene(name, backend)
    cfg = scene.config
    n_tris = sum(int(jax.tree.leaves(d)[0].shape[0]) for d in scene.draws)

    @jax.jit
    def step(angle, vs_u, ps_u, draws):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(vs_u, model=model)
        frame, depth, _ = render_frame(
            list(draws),
            scene.vertex_shader,
            vs_u,
            scene.pixel_shader,
            ps_u,
            cfg,
        )
        return frame

    draws = tuple(scene.draws)
    t0 = time.time()
    frame = step(jnp.float32(0.1), scene.vs_uniform, scene.ps_uniform, draws)
    frame.block_until_ready()
    _log(f"[{name}] compile+first: {time.time() - t0:.1f}s")

    # steady state
    t0 = time.time()
    for i in range(frames):
        frame = step(jnp.float32(0.1 + 0.05 * i), scene.vs_uniform, scene.ps_uniform, draws)
    frame.block_until_ready()
    dt = (time.time() - t0) / frames
    mpix = cfg.width * cfg.height / dt / 1e6
    mtris = n_tris / dt / 1e6
    _log(
        f"[{name}] {cfg.width}x{cfg.height} tris={n_tris} "
        f"frame={dt * 1e3:.2f}ms fps={1 / dt:.1f} "
        f"Mpix/s={mpix:.1f} Mtris/s={mtris:.2f}"
    )
    return {
        "config": name,
        "width": cfg.width,
        "height": cfg.height,
        "tris": n_tris,
        "frame_ms": dt * 1e3,
        "mpix_per_s": mpix,
        "mtris_per_s": mtris,
    }


def main():
    config = os.environ.get("BENCH_CONFIG", "phong1080")
    frames = int(os.environ.get("BENCH_FRAMES", "20"))
    backend = os.environ.get("BENCH_BACKEND", "")
    if not backend:
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    names = (
        ["cube512", "gouraud800", "textured1080", "phong1080", "stress4k"]
        if config == "all"
        else [config]
    )
    results = {n: bench_config(n, frames, backend) for n in names}

    headline = results.get("phong1080") or next(iter(results.values()))

    cpu_mpix = None
    base_path = os.path.join(os.path.dirname(__file__), "baselines", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            cpu = json.load(f)
        cpu_mpix = cpu.get(headline["config"], {}).get("mpix_per_s")

    vs_baseline = headline["mpix_per_s"] / cpu_mpix if cpu_mpix else 0.0
    print(
        json.dumps(
            {
                "metric": f"shaded_mpix_per_s_{headline['config']}",
                "value": round(headline["mpix_per_s"], 2),
                "unit": "Mpix/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
