"""Paired A/B: sampler inner-loop formulation — raw-tap selects vs row folds.

The phong1080 roofline (profile_phong_roofline.py) puts the sampler's
(row, page) iterations at 60% of the frame's issue count (~44 vector
ops/iteration: per-row weight folding + per-tap unpack-fma). The "taps"
formulation resolves each pixel's four packed texels with i32 selects
inside the loop (~15 ops/iteration) and defers weights + unpack to one
block per texture. This script measures both bodies process-paired
(CLAUDE.md: between-process variance ±20%) and checks checksums match.

Usage: PROFILE_CONFIGS=phong1080,textured1080 PROFILE_FRAMES=10 \
    python baselines/profile_sampler_taps.py
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
    from f_renderer_tpu.shaders import texture_pallas

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    names = os.environ.get(
        "PROFILE_CONFIGS", "phong1080,textured1080"
    ).split(",")

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        checks = {}
        for mode in ("rows", "taps"):
            texture_pallas.TAP_MODE = mode

            def frame_of(angle, vs_u, ps_u, draws, cfg=scene.config):
                model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
                vs_u = dict(vs_u, model=model)
                frame, _, _ = render_frame(
                    list(draws), scene.vertex_shader, vs_u,
                    scene.pixel_shader, ps_u, cfg,
                )
                return jnp.sum(frame[::97, ::89, 0].astype(jnp.int32))

            @functools.partial(jax.jit, static_argnums=0)
            def run_n(n, vs_u, ps_u, draws, frame_of=frame_of):
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
            checks[mode] = chk
            print(
                f"[{name} sampler={mode}] {per * 1e3:.2f} ms/frame "
                f"checksum={chk} (compile+first {c:.0f}s)",
                flush=True,
            )
        if checks.get("rows") != checks.get("taps"):
            print(
                f"[{name}] CHECKSUM MISMATCH rows={checks.get('rows')} "
                f"taps={checks.get('taps')} — inspect before adopting",
                flush=True,
            )


if __name__ == "__main__":
    main()
