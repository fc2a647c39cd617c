"""Fused-kernel internal split at phong1080 (round 3).

Times render_fused_prepared on the SAME prepped phong1080 triangles with
epilogue variants to attribute kernel time (scan-chained two-point fit,
see bench._scan_timer):

- flat      : triangle loop + chunk-deferred interp + u8 pack (no sampler,
              no lighting) — the raster floor.
- phong4    : + phong lighting + sampler on a 4x4 texture stack (sampler
              range reductions at minimal footprint).
- phong512  : + the real three 512^2 textures — the production epilogue.

lighting+reduction cost ~= phong4 - flat; texel-loop cost ~= phong512 - phong4.

Usage: PROFILE_FRAMES=10 python baselines/profile_r3.py [config]
"""

from __future__ import annotations

import functools
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from f_renderer_tpu.pipeline.fused import prep_fused, render_fused_prepared
    from f_renderer_tpu.pipeline.render import build_triangles
    from f_renderer_tpu.shaders import TextureStack
    from f_renderer_tpu.scene import make_checker_texture

    bench.enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "phong1080"
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config

    tri, _ = build_triangles(
        list(scene.draws), scene.vertex_shader, scene.vs_uniform, cfg
    )
    arrays, statics = prep_fused(tri, cfg)
    arrays = jax.tree.map(jnp.asarray, arrays)
    print(f"[{name}] statics={statics}", flush=True)

    tiny = TextureStack.create([make_checker_texture(4, 2)] * 3)
    real = scene.ps_uniform.get("textures")

    def shader(kind):
        s = types.SimpleNamespace()
        s.fused_kind = kind
        s.light_pos = (1.2, 1.0, 2.0)
        s.light_color = (1.0, 1.0, 1.0)
        return s

    variants = {
        "flat": (shader("flat"), {}),
        "phong4": (shader("phong"), {"textures": tiny}),
        "phong512": (shader("phong"), {"textures": real}),
    }

    results = {}
    for vname, (ps, uni_extra) in variants.items():
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, arrays, ps=ps, uni_extra=uni_extra):
            def body(acc, i):
                ps_u = dict(
                    uni_extra,
                    view_pos=jnp.asarray(
                        [0.0, 0.5, 4.0], jnp.float32
                    ) + 1e-6 * i,
                )
                frame, depth, winner = render_fused_prepared(
                    arrays, statics, ps, ps_u, cfg
                )
                return acc + jnp.sum(
                    frame[::97, ::89, 0].astype(jnp.int32)
                ), None

            acc, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(n, dtype=jnp.float32)
            )
            return acc

        t0 = time.time()
        int(run_n(frames, arrays))
        print(f"[{vname}] compile+first: {time.time() - t0:.1f}s", flush=True)
        dt = bench._scan_timer(lambda n: int(run_n(n, arrays)), frames)
        results[vname] = dt
        print(f"[{vname}] {dt * 1e3:.3f} ms/frame", flush=True)

    f = results["flat"]
    p4 = results["phong4"]
    p512 = results["phong512"]
    print(
        f"split: raster+interp+pack {f*1e3:.2f} | lighting+ranges "
        f"{(p4-f)*1e3:.2f} | texel loops {(p512-p4)*1e3:.2f} | "
        f"kernel total {p512*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
