"""Stage split for stress4k (or any config): geometry | prep | kernel.

Times three nested prefixes of the fused pipeline under the scan-timer
protocol (each stage chained N frames inside one jit with a checksum
readback): geometry = build_triangles; prep = + pack/bin/gather
(prep_fused); full = + the fused kernel. Differences attribute the frame.

Usage: PROFILE_FRAMES=4 python baselines/profile_stress_split.py [config]
"""

from __future__ import annotations

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
    from f_renderer_tpu.pipeline.fused import prep_fused, render_fused_prepared
    from f_renderer_tpu.pipeline.render import build_triangles

    bench.enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "stress4k"
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    def geom(angle, vs_u, draws):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        tri, _ = build_triangles(
            list(draws), scene.vertex_shader, dict(vs_u, model=model), cfg
        )
        return tri

    def stage_geometry(angle, vs_u, ps_u, draws):
        tri = geom(angle, vs_u, draws)
        return jnp.sum(tri.rhw[:, ::1001]) + jnp.sum(tri.ctx[:, ::1001])

    def stage_prep(angle, vs_u, ps_u, draws):
        tri = geom(angle, vs_u, draws)
        arrays, statics = prep_fused(tri, cfg)
        return (
            jnp.sum(arrays["tri_f32"][:, ::1001])
            + jnp.sum(arrays["cb"][::101].astype(jnp.float32))
        )

    def stage_full(angle, vs_u, ps_u, draws):
        tri = geom(angle, vs_u, draws)
        arrays, statics = prep_fused(tri, cfg)
        frame, depth, winner = render_fused_prepared(
            arrays, statics, scene.pixel_shader, ps_u, cfg
        )
        return jnp.sum(frame[::97, ::89, 0].astype(jnp.float32))

    results = {}
    for sname, fn in (
        ("geometry", stage_geometry),
        ("prep", stage_prep),
        ("full", stage_full),
    ):
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, vs_u, ps_u, draws, fn=fn):
            angles = 0.1 + 0.05 * jnp.arange(n, dtype=jnp.float32)

            def body(acc, angle):
                return acc + fn(angle, vs_u, ps_u, draws), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
            return acc

        t0 = time.time()
        float(run_n(frames, scene.vs_uniform, scene.ps_uniform, draws))
        dt = bench._scan_timer(
            lambda n: float(run_n(n, scene.vs_uniform, scene.ps_uniform, draws)),
            frames,
        )
        results[sname] = dt
        print(
            f"[{name}] {sname}: {dt * 1e3:.2f} ms/frame "
            f"(compile {time.time() - t0:.0f}s)",
            flush=True,
        )

    g, p, f = results["geometry"], results["prep"], results["full"]
    print(
        f"[{name}] split: geometry {g * 1e3:.1f} | prep {(p - g) * 1e3:.1f} | "
        f"kernel {(f - p) * 1e3:.1f} | total {f * 1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
