"""Micro-profile of the deferred shade stage parts on the real TPU.

Parts: (a) triangle-table gathers + barycentric interp (interpolate_context),
(b) texture sampling alone, (c) lighting math alone.
"""

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
    from f_renderer_tpu.pipeline.raster_pallas import rasterize_pallas
    from f_renderer_tpu.pipeline.shade import interpolate_context
    from f_renderer_tpu.shaders.builtin import _phong_lighting

    scene = bench.build_scene("phong1080", backend="pallas")
    cfg = scene.config
    h, w = cfg.height, cfg.width

    tri, _ = jax.jit(
        lambda vs_u, draws: build_triangles(
            list(draws), scene.vertex_shader, vs_u, cfg
        )
    )(scene.vs_uniform, tuple(scene.draws))
    winner, depth = jax.jit(
        lambda tri: rasterize_pallas(tri, w, h, tile=(64, 128))
    )(tri)

    @jax.jit
    def interp(tri, winner):
        return interpolate_context(tri, winner, w, h)

    c, t = timeit(interp, tri, winner)
    print(f"interpolate_context: compile={c:.1f}s steady={t * 1e3:.2f}ms", flush=True)
    ctx, ps_idx = interp(tri, winner)

    stack = scene.ps_uniform["textures"]

    @jax.jit
    def tex_only(ctx, ps_idx):
        uv = ctx[..., 6:8]
        def s(flat_uv, idx):
            return stack.sample(idx, flat_uv)
        return jax.vmap(jax.vmap(s))(uv, ps_idx)

    c, t = timeit(tex_only, ctx, ps_idx)
    print(f"texture sample: compile={c:.1f}s steady={t * 1e3:.2f}ms", flush=True)

    view_pos = scene.ps_uniform["view_pos"]

    @jax.jit
    def light_only(ctx):
        def l(flat):
            return _phong_lighting(flat[0:3], flat[3:6], view_pos, (1.2, 1.0, 2.0), (1.0, 1.0, 1.0))
        return jax.vmap(jax.vmap(l))(ctx)

    c, t = timeit(light_only, ctx)
    print(f"lighting: compile={c:.1f}s steady={t * 1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
