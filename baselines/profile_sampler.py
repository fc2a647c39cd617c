"""A/B the fused-kernel sampler strip height (sampler_sub_rows) on TPU.

The texel y-loop does whole-block vector work per (texture row, page);
strips with their own ranges divide the per-iteration vector cost by
(tile_rows / sub_rows) when the uv y-gradient is predominantly vertical
(profile_r3 measured the texel loops at 6.16 ms of phong1080's 8.6 ms
kernel). Usage: PROFILE_FRAMES=10 python baselines/profile_sampler.py
[config ...]
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
    from f_renderer_tpu.pipeline.fused import prep_fused, render_fused_prepared

    bench.enable_compilation_cache()
    names = sys.argv[1:] or ["phong1080", "textured1080"]
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    from f_renderer_tpu.pipeline.render import build_triangles

    for name in names:
        scene = bench.build_scene(name, backend="pallas")
        tri, _ = build_triangles(
            list(scene.draws), scene.vertex_shader, scene.vs_uniform,
            scene.config,
        )
        arrays, statics = prep_fused(tri, scene.config)
        arrays = jax.tree.map(jnp.asarray, arrays)
        for label, kw in (
            ("packed", dict(sampler_unpacked=False)),
            ("unpacked-f32", dict(sampler_unpacked=True)),
        ):
            cfg = dataclasses.replace(scene.config, **kw)

            @functools.partial(jax.jit, static_argnums=0)
            def run_n(n, arrays, cfg=cfg):
                def body(acc, i):
                    ps_u = dict(
                        scene.ps_uniform,
                        view_pos=jnp.asarray(
                            scene.ps_uniform.get("view_pos", (0.0, 0.5, 4.0)),
                            jnp.float32,
                        )
                        + 1e-6 * i,
                    )
                    frame, depth, winner = render_fused_prepared(
                        arrays, statics, scene.pixel_shader, ps_u, cfg
                    )
                    return acc + jnp.sum(
                        frame[::97, ::89, 0].astype(jnp.int32)
                    ), None

                acc, _ = jax.lax.scan(
                    body, jnp.int32(0), jnp.arange(n, dtype=jnp.float32)
                )
                return acc

            t0 = time.time()
            c = int(run_n(frames, arrays))
            dt = bench._scan_timer(lambda n: int(run_n(n, arrays)), frames)
            print(
                f"[{name}] {label}: {dt * 1e3:.3f} ms/frame "
                f"(compile {time.time() - t0:.0f}s, checksum {c})",
                flush=True,
            )


if __name__ == "__main__":
    main()
