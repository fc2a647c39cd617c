"""Raster kernel tile/chunk sweep + fused-path timing on the real TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return c, (time.time() - t0) / n


def main():
    import bench
    from f_renderer_tpu.pipeline.render import build_triangles
    from f_renderer_tpu.pipeline.raster_pallas import (
        rasterize_interp_pallas,
        rasterize_pallas,
    )
    from f_renderer_tpu.pipeline.shade import shade_from_planes
    from f_renderer_tpu.shaders.api import make_context_codec

    config = sys.argv[1] if len(sys.argv) > 1 else "phong1080"
    scene = bench.build_scene(config, backend="pallas")
    cfg = scene.config
    h, w = cfg.height, cfg.width

    tri, _ = jax.jit(
        lambda vs_u, draws: build_triangles(
            list(draws), scene.vertex_shader, vs_u, cfg
        )
    )(scene.vs_uniform, tuple(scene.draws))
    jax.block_until_ready(tri)

    for tile in [(8, 128), (16, 128), (32, 128), (64, 128), (128, 128)]:
        for chunk in [128, 256]:
            try:
                f = jax.jit(
                    lambda tri: rasterize_pallas(tri, w, h, tile=tile, chunk=chunk)
                )
                c, t = timeit(f, tri)
                print(f"raster tile={tile} chunk={chunk}: {t * 1e3:.2f}ms "
                      f"(compile {c:.0f}s)", flush=True)
            except Exception as e:
                print(f"raster tile={tile} chunk={chunk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    example = jax.tree.map(
        lambda l: jnp.zeros(l.shape[2:], jnp.float32), scene.draws[0]
    )
    codec = make_context_codec(scene.vertex_shader, scene.vs_uniform, example)

    best = None
    for tile in [(16, 128), (32, 128), (64, 128)]:
        f = jax.jit(
            lambda tri: rasterize_interp_pallas(tri, w, h, tile=tile)
        )
        c, t = timeit(f, tri)
        print(f"raster+interp tile={tile}: {t * 1e3:.2f}ms (compile {c:.0f}s)",
              flush=True)
        if best is None or t < best[1]:
            best = (tile, t)

    tile = best[0]

    @jax.jit
    def shade(tri):
        ctx, ps_idx, winner, depth = rasterize_interp_pallas(tri, w, h, tile=tile)
        return shade_from_planes(
            ctx, ps_idx, winner, scene.pixel_shader, scene.ps_uniform, codec,
            background=cfg.background,
        )

    c, t = timeit(shade, tri)
    print(f"raster+interp+shade tile={tile}: {t * 1e3:.2f}ms (compile {c:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
