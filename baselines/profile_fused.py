"""Isolate the slow part of the fused kernel on the phong1080 scene."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
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
    from f_renderer_tpu.pipeline.fused import render_fused_pallas
    from f_renderer_tpu.pipeline.render import build_triangles

    scene = bench.build_scene("phong1080", backend="pallas")
    cfg = scene.config

    tri, _ = jax.jit(
        lambda vs_u, draws: build_triangles(
            list(draws), scene.vertex_shader, vs_u, cfg
        )
    )(scene.vs_uniform, tuple(scene.draws))
    jax.block_until_ready(tri)
    print(f"slots={tri.num_slots} valid={int(np.asarray(tri.valid).sum())}",
          flush=True)

    # how many triangles spill (span > 8 tiles at (16,128))?
    spi = np.moveaxis(np.asarray(tri.spi), -1, 0)  # planar (3,2,M) → (M,3,2)
    valid = np.asarray(tri.valid)
    minx = np.clip(spi[:, :, 0].min(1), 0, cfg.width)
    maxx = np.clip(spi[:, :, 0].max(1), 0, cfg.width)
    miny = np.clip(spi[:, :, 1].min(1), 0, cfg.height)
    maxy = np.clip(spi[:, :, 1].max(1), 0, cfg.height)
    ne = valid & (maxx > minx) & (maxy > miny)
    span = (
        (np.maximum(maxx - 1, minx) // 128 - minx // 128 + 1)
        * (np.maximum(maxy - 1, miny) // 16 - miny // 16 + 1)
    )
    print(f"nonempty={ne.sum()} spill(span>8)={(ne & (span > 8)).sum()} "
          f"max_span={span[ne].max()} pairs={span[ne][span[ne]<=8].sum()}",
          flush=True)

    from f_renderer_tpu.pipeline.fused import prep_fused

    f = jax.jit(lambda tri: prep_fused(tri, cfg)[0])
    c, t = timeit(f, tri)
    print(f"prep_fused (pack+sort+gather): {t * 1e3:.2f}ms (compile {c:.0f}s)",
          flush=True)

    class FakeKind:
        pass

    for kind in ["phong", "textured", "gouraud", "flat"]:
        ps = lambda u, c, i: None
        ps.fused_kind = kind
        ps.light_pos = (1.2, 1.0, 2.0)
        ps.light_color = (1.0, 1.0, 1.0)
        try:
            f = jax.jit(
                lambda tri: render_fused_pallas(tri, ps, scene.ps_uniform, cfg)
            )
            c, t = timeit(f, tri)
            print(f"fused kind={kind}: {t * 1e3:.2f}ms (compile {c:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"fused kind={kind}: FAILED {type(e).__name__} {str(e)[:100]}",
                  flush=True)

    ps = lambda u, c, i: None
    ps.fused_kind = "phong"
    ps.light_pos = (1.2, 1.0, 2.0)
    ps.light_color = (1.0, 1.0, 1.0)
    cfg2 = dataclasses.replace(cfg, raster_binned=False)
    f = jax.jit(lambda tri: render_fused_pallas(tri, ps, scene.ps_uniform, cfg2))
    c, t = timeit(f, tri)
    print(f"fused phong UNBINNED: {t * 1e3:.2f}ms (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
