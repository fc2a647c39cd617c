"""Stage-by-stage TPU timing for the phong1080 bench scene.

Times (a) geometry only, (b) geometry+raster, (c) full frame, for both
backends, to locate the bottleneck. Run on the real chip: python
baselines/profile_tpu.py [config] [--tile TH,TW] [--chunk N].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=None):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.time() - t0) / n


def main():
    import bench
    from f_renderer_tpu.pipeline.render import build_triangles, rasterize
    from f_renderer_tpu.pipeline.raster_pallas import rasterize_pallas
    from f_renderer_tpu.pipeline.shade import shade_deferred
    from f_renderer_tpu.shaders.api import make_context_codec

    config = sys.argv[1] if len(sys.argv) > 1 else "phong1080"
    tile = (64, 128)
    chunk = 256
    for a in sys.argv[2:]:
        if a.startswith("--tile"):
            tile = tuple(int(v) for v in a.split("=")[1].split(","))
        if a.startswith("--chunk"):
            chunk = int(a.split("=")[1])

    scene = bench.build_scene(config, backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    @jax.jit
    def geom(vs_u, draws):
        tri, _ = build_triangles(list(draws), scene.vertex_shader, vs_u, cfg)
        return tri

    c, t = timeit(geom, scene.vs_uniform, draws)
    tri = geom(scene.vs_uniform, draws)
    print(f"geometry: compile={c:.1f}s steady={t * 1e3:.2f}ms slots={tri.num_slots} "
          f"valid={int(np.asarray(tri.valid).sum())}", flush=True)

    @jax.jit
    def rast(tri):
        return rasterize_pallas(
            tri, cfg.width, cfg.height, tile=tile, chunk=chunk
        )

    c, t = timeit(rast, tri)
    print(f"raster(pallas tile={tile} chunk={chunk}): compile={c:.1f}s "
          f"steady={t * 1e3:.2f}ms", flush=True)
    winner, depth = rast(tri)

    example = jax.tree.map(lambda l: jnp.zeros(l.shape[2:], jnp.float32), draws[0])
    codec = make_context_codec(scene.vertex_shader, scene.vs_uniform, example)

    @jax.jit
    def shade(tri, winner):
        return shade_deferred(
            tri, winner, scene.pixel_shader, scene.ps_uniform, codec,
            background=cfg.background,
        )

    c, t = timeit(shade, tri, winner)
    print(f"shade: compile={c:.1f}s steady={t * 1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
