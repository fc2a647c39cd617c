"""A/B tile height and texture size for the fused phong1080 path (real TPU).

Separates per-tile fixed costs (tile height sweep) from the in-kernel
texture row-loop cost (512^2 vs 64^2 textures) under the honest
scan-chained two-point protocol.

Usage: python baselines/profile_tiles.py [th ...]
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_timer(run_n, frames: int) -> float:
    run_n(frames)
    run_n(2 * frames)
    t0 = time.time()
    run_n(frames)
    w1 = time.time() - t0
    t0 = time.time()
    run_n(2 * frames)
    w2 = time.time() - t0
    return max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline import render_frame
    from f_renderer_tpu.scene import make_phong_scene, make_checker_texture
    from f_renderer_tpu.camera import Camera
    from f_renderer_tpu.scene import make_cube, make_uv_sphere

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    ths = [int(a) for a in sys.argv[1:]] or [16, 32, 64]

    def build(texsize):
        sphere = make_uv_sphere(40, 80)
        cube = make_cube(0.8)
        cube["pos"] = cube["pos"] + np.array([1.6, 0.0, 0.0], np.float32)
        cube2 = make_cube(0.8)
        cube2["pos"] = cube2["pos"] + np.array([-1.6, 0.0, 0.0], np.float32)
        cam = Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        return make_phong_scene(
            1920, 1080, meshes=[sphere, cube, cube2],
            textures=[
                make_checker_texture(texsize, max(texsize // 16, 2)),
                make_checker_texture(texsize, max(texsize // 32, 2)),
                make_checker_texture(texsize, max(texsize // 21, 2)),
            ],
            camera=cam, backend="pallas",
        )

    for texsize in (512, 64):
        scene = build(texsize)
        draws = tuple(scene.draws)
        for th in ths:
            cfg = dataclasses.replace(scene.config, tile=(th, 128))

            def one_frame(angle, vs_u, ps_u, draws):
                model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
                vs_u = dict(vs_u, model=model)
                frame, depth, _ = render_frame(
                    list(draws), scene.vertex_shader, vs_u,
                    scene.pixel_shader, ps_u, cfg,
                )
                return frame

            @functools.partial(jax.jit, static_argnums=0)
            def run_n(n, vs_u, ps_u, draws):
                angles = 0.1 + 0.05 * jnp.arange(n, dtype=jnp.float32)

                def body(acc, angle):
                    frame = one_frame(angle, vs_u, ps_u, draws)
                    return acc + jnp.sum(
                        frame[::97, ::89, 0].astype(jnp.int32)
                    ), None

                acc, _ = jax.lax.scan(body, jnp.int32(0), angles)
                return acc

            t0 = time.time()
            chk = int(run_n(frames, scene.vs_uniform, scene.ps_uniform, draws))
            print(
                f"tex={texsize} th={th} compile {time.time()-t0:.0f}s "
                f"chk={chk}", flush=True,
            )
            dt = _scan_timer(
                lambda n: int(
                    run_n(n, scene.vs_uniform, scene.ps_uniform, draws)
                ),
                frames,
            )
            print(f"tex={texsize:3d} th={th:3d} {dt*1e3:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
