"""Attribute the stress4k fused-kernel time: pair-loop floor vs vector work.

Renders the stress4k config three times with raster_pallas._DEBUG_PAIR_BODY
set to None (production), "cover" (reads + integer cover, no f32 block) and
"floor" (scalar reads only). Differences attribute the pair loop:

  full - cover  = f32 barycentric/depth/accept block
  cover - floor = integer cover block
  floor         = per-pair reads+loop + chunk DMA + deferred update + epilogue

Usage: PROFILE_FRAMES=4 python baselines/profile_kernel_floor.py
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
    from f_renderer_tpu.pipeline import render_frame
    from f_renderer_tpu.pipeline import raster_pallas

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    name = os.environ.get("PROFILE_CONFIG", "stress4k")
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    # Stage all scene inputs to the device OUTSIDE the timed lambdas
    # (closed-over numpy constants re-ship over the tunnel per dispatch —
    # the CLAUDE.md staging trap; measured 23 s/frame of phantom time).
    draws_d = jax.device_put(draws)
    vs_u_d = jax.device_put(scene.vs_uniform)
    ps_u_d = jax.device_put(scene.ps_uniform)

    for mode in (None, "cover", "floor"):
        raster_pallas._DEBUG_PAIR_BODY = mode

        def frame_of(angle, vs_u, ps_u, draws):
            model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
            vs_u = dict(vs_u, model=model)
            frame, _, _ = render_frame(
                list(draws), scene.vertex_shader, vs_u,
                scene.pixel_shader, ps_u, cfg,
            )
            return jnp.sum(frame[::97, ::89, 0].astype(jnp.int32))

        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, vs_u, ps_u, draws):
            def body(c, i):
                a = 0.1 + 0.05 * i.astype(jnp.float32)
                return c + frame_of(a, vs_u, ps_u, draws), None
            out, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(n, dtype=jnp.int32)
            )
            return out

        t0 = time.time()
        jax.block_until_ready(run_n(frames, vs_u_d, ps_u_d, draws_d))
        c = time.time() - t0
        jax.block_until_ready(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))  # warm 2N (avoid timing its compile)
        t0 = time.time()
        jax.block_until_ready(run_n(frames, vs_u_d, ps_u_d, draws_d))
        w1 = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        print(f"[body={mode}] {per * 1e3:.2f} ms/frame (compile+first {c:.0f}s)",
              flush=True)
    raster_pallas._DEBUG_PAIR_BODY = None


if __name__ == "__main__":
    main()
