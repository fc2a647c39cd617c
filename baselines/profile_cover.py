"""Paired A/B: pair-loop cover-test formulation — sign-bit OR vs AND chain.

The pair loop is the dominant budget line at phong1080 under the grp2
sampler (53%, profile_phong_roofline.py) and part of stress4k's 230-290 ms
kernel band. The five cover tests (3 edges vs zero + 2 exclusive-bbox
compares, 4 ANDs) fold into ONE compare on a sign-bit OR:
(e01 | e12 | e20 | (maxx-1-cx) | (maxy-1-cy)) >= 0 — boolean-identical
(all non-negative iff the OR's sign is clear), 2 fewer vector ops per
pair. This measures both forms process-paired with checksum equality.

Usage: PROFILE_CONFIGS=phong1080,stress4k PROFILE_FRAMES=4 \
    python baselines/profile_cover.py
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
    names = os.environ.get("PROFILE_CONFIGS", "phong1080,stress4k").split(",")
    forms = os.environ.get("PROFILE_FORMS", "and,or").split(",")

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        checks = {}
        for form in forms:
            raster_pallas._COVER_FORM = form

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
            checks[form] = chk
            print(
                f"[{name} cover={form}] {per * 1e3:.2f} ms/frame "
                f"checksum={chk} (compile+first {c:.0f}s)",
                flush=True,
            )
        if len(set(checks.values())) != 1:
            print(f"[{name}] CHECKSUM MISMATCH {checks} — do not adopt",
                  flush=True)


if __name__ == "__main__":
    main()
