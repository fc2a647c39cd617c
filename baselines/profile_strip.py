"""Paired A/B: whole-tile pair bodies vs strip-decomposed group bodies.

TIMING-ONLY preview of the fragment-level decomposition (VERDICT r4 #4):
`raster_pallas._STRIP_PROBE` reuses the existing per-tile pair lists but
processes S = th//8 pairs per trip, pair s restricted to row-strip s — the
op mix of the real strip-binned design (1/S vector work per pair, amortized
loop control, one group merge) WITHOUT the prep-side strip binning, so the
frame output is GARBAGE (checksums differ by design). What it measures:
the kernel-side cost per pair in the strip shape. The real design adds a
pair-expansion factor (bbox rows spanning >1 strip) and interleave padding
on top — scale the measured per-pair win by ~1.2-1.7x when projecting.

Usage: PROFILE_CONFIGS=stress4k PROFILE_FRAMES=4 \
    python baselines/profile_strip.py
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
    names = os.environ.get("PROFILE_CONFIGS", "stress4k").split(",")
    variants = os.environ.get("PROFILE_VARIANTS", "tile,strip,tile").split(",")

    import dataclasses

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)
        for form in variants:
            # "tile": production default. "strip": TIMING-ONLY probe body
            # (garbage output). "real": the exact strip mode end-to-end
            # (bin_mode="strip" — strip-binned interleaved pair lists;
            # checksum must MATCH "tile"). A ":N" suffix on any form
            # forces tile height N (e.g. "tile:16,tile:32,tile:64").
            cfg = scene.config
            if ":" in form:
                parts = form.split(":")
                form = parts[0]
                cfg = dataclasses.replace(
                    cfg, tile=(int(parts[1]), 128), tile_auto=False
                )
                if len(parts) > 2:  # "form:th:k" — bin_k override
                    cfg = dataclasses.replace(cfg, bin_k=int(parts[2]))
            raster_pallas._STRIP_PROBE = form == "strip"
            if form == "real":
                cfg = dataclasses.replace(cfg, bin_mode="strip")
            # PROFILE_TH: force a tile height (e.g. 32 to probe the S=4
            # strip body where the S=8 Mosaic compile is pathological).
            th_force = os.environ.get("PROFILE_TH")
            if th_force:
                cfg = dataclasses.replace(
                    cfg, tile=(int(th_force), 128), tile_auto=False
                )
            u_force = os.environ.get("PROFILE_UNROLL")
            if u_force:
                cfg = dataclasses.replace(cfg, unroll_pairs=int(u_force))
            k_force = os.environ.get("PROFILE_K")
            if k_force:
                cfg = dataclasses.replace(cfg, bin_k=int(k_force))

            def frame_of(angle, vs_u, ps_u, draws, cfg=cfg):
                model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
                vs_u = dict(vs_u, model=model)
                frame, _, _ = render_frame(
                    list(draws), scene.vertex_shader, vs_u,
                    scene.pixel_shader, ps_u, cfg,
                )
                return jnp.sum(frame[::97, ::89, 0].astype(jnp.int32))

            # `tag` is a static arg solely to force a fresh trace per
            # variant (the module flag is read at trace time).
            @functools.partial(jax.jit, static_argnums=(0, 1))
            def run_n(tag, n, vs_u, ps_u, draws, frame_of=frame_of):
                def body(c, i):
                    a = 0.1 + 0.05 * i.astype(jnp.float32)
                    return c + frame_of(a, vs_u, ps_u, draws), None

                out, _ = jax.lax.scan(
                    body, jnp.int32(0), jnp.arange(n, dtype=jnp.int32)
                )
                return out

            t0 = time.time()
            chk = int(run_n(form, frames, vs_u_d, ps_u_d, draws_d))
            c = time.time() - t0
            int(run_n(form, 2 * frames, vs_u_d, ps_u_d, draws_d))
            t0 = time.time()
            int(run_n(form, frames, vs_u_d, ps_u_d, draws_d))
            w1 = time.time() - t0
            t0 = time.time()
            int(run_n(form, 2 * frames, vs_u_d, ps_u_d, draws_d))
            w2 = time.time() - t0
            per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
            print(
                f"[{name} body={form}] {per * 1e3:.2f} ms/frame "
                f"checksum={chk} (compile+first {c:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
