"""Paired A/B: sampler (row, page) loop unrolling — taps vs taps2 vs taps4.

profile_sampler_taps.py established the loop is LATENCY/CONTROL-bound
(the ~3× arithmetic diet moved textured1080 only 3.37 → 3.27 ms): the
per-iteration chain (scalar row index → dynamic VMEM row load → 2 lane
gathers → selects) serializes across fori trips. "tapsU" flattens the
(row, page) nest into one trip count and unrolls U× so the scheduler can
overlap U independent load/gather chains (tail duplicates are clamped —
idempotent selects make that exact). This script measures the unroll
ladder process-paired (CLAUDE.md: between-process variance ±20%) and
checks all checksums match.

Usage: PROFILE_CONFIGS=phong1080,textured1080 PROFILE_FRAMES=10 \
    python baselines/profile_sampler_unroll.py
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
    modes = os.environ.get("PROFILE_MODES", "taps,taps2,taps4").split(",")

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        checks = {}
        for mode in modes:
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
        if len(set(checks.values())) != 1:
            print(f"[{name}] CHECKSUM MISMATCH {checks} — do not adopt",
                  flush=True)


if __name__ == "__main__":
    main()
