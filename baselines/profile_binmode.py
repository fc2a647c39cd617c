"""Paired A/B: pair-expansion binning vs single-copy direct binning.

bin_mode="direct" (raster_pallas.bin_direct) sorts m keys instead of
nk·m and permutes m slots instead of gathering nk·m pairs — the two
dominant stress4k prep costs — in exchange for coarse/spill gating of
multi-fine-span triangles in the kernel.

Usage: PROFILE_CONFIGS=stress4k,phong1080 PROFILE_FRAMES=4 \
    python baselines/profile_binmode.py
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
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    names = os.environ.get(
        "PROFILE_CONFIGS", "stress4k"
    ).split(",")

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        for mode in ("pairs", "direct"):
            cfg = dataclasses.replace(scene.config, bin_mode=mode)

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
            chk = int(run_n(frames, vs_u_d, ps_u_d, draws_d))
            c = time.time() - t0
            int(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))  # warm 2N
            t0 = time.time()
            int(run_n(frames, vs_u_d, ps_u_d, draws_d))
            w1 = time.time() - t0
            t0 = time.time()
            int(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))
            w2 = time.time() - t0
            per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
            print(
                f"[{name} bin={mode}] {per * 1e3:.2f} ms/frame "
                f"checksum={chk} (compile+first {c:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
