"""Paired A/B: pair-merge formulation — serial fold vs tree reduction.

The unrolled deferred pair loop's accept/select tail reads the previous
pair's depth/worder, so the whole unroll group is ONE serial dependence
chain (~15 chained vector ops per pair) — the same latency pathology the
sampler (taps8/grp) and voxel march (par steps) A/Bs attacked. The "tree"
form (raster_pallas._MERGE_FORM) computes the group's candidates
carry-independently and tree-reduces them by the strict lexicographic
(rhw, order) max, which is exact by the merge algebra (oracle test:
tests/test_fused.py::test_tree_merge_exact).

Sweeps (form, unroll) variants process-paired with checksum equality.

Usage: PROFILE_CONFIGS=stress4k PROFILE_VARIANTS=seq:2,tree:2,tree:4 \
    PROFILE_FRAMES=4 python baselines/profile_merge.py
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
    from f_renderer_tpu.pipeline import raster_pallas

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    names = os.environ.get("PROFILE_CONFIGS", "stress4k").split(",")
    variants = [
        (v.split(":")[0], int(v.split(":")[1]))
        for v in os.environ.get(
            "PROFILE_VARIANTS", "seq:2,tree:2,tree:4"
        ).split(",")
    ]

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        checks = {}
        for form, unroll in variants:
            raster_pallas._MERGE_FORM = form
            cfg = dataclasses.replace(scene.config, unroll_pairs=unroll)

            def frame_of(angle, vs_u, ps_u, draws, cfg=cfg):
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
            checks[(form, unroll)] = chk
            print(
                f"[{name} merge={form} u={unroll}] {per * 1e3:.2f} ms/frame "
                f"checksum={chk} (compile+first {c:.0f}s)",
                flush=True,
            )
        if len(set(checks.values())) != 1:
            print(f"[{name}] CHECKSUM MISMATCH {checks} — do not adopt",
                  flush=True)


if __name__ == "__main__":
    main()
