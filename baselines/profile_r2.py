"""Stage-split profiling under the honest scan-chained protocol.

The r1 profilers used dispatch-loop timing, which jitters 30-80 ms on the
tunneled runtime. Here every stage is timed like bench.py: N iterations
chained inside ONE jit via lax.scan with a checksum readback, two-point fit
(wall_2N - wall_N)/N. Per-iteration inputs vary (model angle) so XLA cannot
hoist the body out of the scan.

Usage: PROFILE_CONFIG=phong1080 PROFILE_FRAMES=10 python baselines/profile_r2.py
"""

from __future__ import annotations

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
    from f_renderer_tpu.pipeline.fused import prep_fused
    from f_renderer_tpu.pipeline.render import build_triangles

    bench.enable_compilation_cache()
    name = os.environ.get("PROFILE_CONFIG", "phong1080")
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    def tri_of(angle, vs_u, draws):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(vs_u, model=model)
        tri, _ = build_triangles(list(draws), scene.vertex_shader, vs_u, cfg)
        return tri

    def stage_geometry(angle, vs_u, ps_u, draws):
        tri = tri_of(angle, vs_u, draws)
        return jnp.sum(tri.order) + jnp.sum(tri.spi)

    def stage_prep(angle, vs_u, ps_u, draws):
        tri = tri_of(angle, vs_u, draws)
        arrays, _ = prep_fused(tri, cfg)
        return (
            arrays["cb"][-1]
            + arrays["tri_i32"][0, 0]
            + jnp.sum(arrays["origin"])
        )

    def stage_full(angle, vs_u, ps_u, draws):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(vs_u, model=model)
        frame, depth, _ = render_frame(
            list(draws), scene.vertex_shader, vs_u, scene.pixel_shader,
            ps_u, cfg,
        )
        return jnp.sum(frame[::97, ::89, 0].astype(jnp.int32))

    results = {}
    for sname, stage in [
        ("geometry", stage_geometry),
        ("geometry+prep", stage_prep),
        ("full", stage_full),
    ]:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, vs_u, ps_u, draws, stage=stage):
            angles = 0.1 + 0.05 * jnp.arange(n, dtype=jnp.float32)

            def body(acc, angle):
                return acc + stage(angle, vs_u, ps_u, draws).astype(jnp.int32), None

            acc, _ = jax.lax.scan(body, jnp.int32(0), angles)
            return acc

        t0 = time.time()
        int(run_n(frames, scene.vs_uniform, scene.ps_uniform, draws))
        print(f"[{sname}] compile+first: {time.time() - t0:.1f}s", flush=True)
        dt = _scan_timer(
            lambda n: int(run_n(n, scene.vs_uniform, scene.ps_uniform, draws)),
            frames,
        )
        results[sname] = dt
        print(f"[{sname}] {dt * 1e3:.2f} ms/iter", flush=True)

    g = results["geometry"]
    p = results["geometry+prep"]
    f = results["full"]
    print(
        f"split: geometry {g*1e3:.2f} ms | prep {max(p-g,0)*1e3:.2f} ms | "
        f"kernel+shade {max(f-p,0)*1e3:.2f} ms | total {f*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
