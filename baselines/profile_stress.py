"""Tile-height sweep for stress4k (1M tiny tris @ 4K) on the real TPU.

Usage: python baselines/profile_stress.py [th ...]   (default 8 16 32)
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline import render_frame

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    ths = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    scene = bench.build_scene("stress4k", backend="pallas")
    draws = tuple(scene.draws)

    for th in ths:
        cfg = dataclasses.replace(
            scene.config, tile=(th, 128), tile_auto=False
        )

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
                return acc + jnp.sum(frame[::97, ::89, 0].astype(jnp.int32)), None

            acc, _ = jax.lax.scan(body, jnp.int32(0), angles)
            return acc

        t0 = time.time()
        chk = int(run_n(frames, scene.vs_uniform, scene.ps_uniform, draws))
        print(f"th={th} compile {time.time()-t0:.0f}s chk={chk}", flush=True)
        dt = bench._scan_timer(
            lambda n: int(run_n(n, scene.vs_uniform, scene.ps_uniform, draws)),
            frames,
        )
        print(f"th={th:3d} {dt*1e3:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
