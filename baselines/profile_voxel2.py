"""Isolate voxel march cost components on the real TPU.

Cases: real octree / all-empty / all-full, at block = 8 / 32.
If all-full ~= real, per-block fixed costs dominate; if all-empty is slow,
the skip path is broken or per-iteration cost dominates.
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
    import numpy as np

    import bench
    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    bench.enable_compilation_cache()
    frames = 10
    W, H, level = 960, 540, 3
    rng = np.random.default_rng(0)
    gc, gh = densify(gen_randomly(level, rng), level)
    cases = {
        "real": (gc, gh),
        "empty": (gc, np.zeros_like(gh)),
        "full": (gc, np.ones_like(gh)),
    }
    proj = np.asarray(set_perspective(np.pi * 0.25, W / H, 0.1, 100.0))
    center = np.array([1.0] * 3, np.float32)

    def args(i):
        ang = 0.3 + 0.08 * i
        eye = center + np.array([3 * np.cos(ang), 1.2, 3 * np.sin(ang)], np.float32)
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ np.asarray(set_identity())
        return eye, np.linalg.inv(mvp).astype(np.float32)

    for name, (gcv, ghv) in cases.items():
        for block in (8, 32):
            cfg = VoxelRenderConfig(width=W, height=H, level=level)
            gcj, ghj = jnp.asarray(gcv), jnp.asarray(ghv)

            from f_renderer_tpu.voxel import raycast_pallas as rp

            @functools.partial(jax.jit, static_argnums=0)
            def run_n(n, eyes, invs):
                def body(acc, a):
                    eye, inv = a
                    import f_renderer_tpu.voxel.raycast as rc

                    frame = rc.render_voxel_frame(gcj, ghj, eye, inv, cfg)
                    return acc + jnp.sum(frame[::97, ::89, 0].astype(jnp.int32)), None

                acc, _ = jax.lax.scan(body, jnp.int32(0), (eyes, invs))
                return acc

            # patch block size via default arg — march_pallas(block=...)
            import f_renderer_tpu.voxel.raycast as rc

            orig = rp.march_pallas
            rp_block = block

            def patched(*a, **kw):
                kw["block"] = rp_block
                return orig(*a, **kw)

            rp.march_pallas = patched
            try:
                es, ms = zip(*(args(i) for i in range(frames)))
                eyes = jnp.asarray(np.stack(es))
                invs = jnp.asarray(np.stack(ms))
                t0 = time.time()
                int(run_n(frames, eyes, invs))
                c = time.time() - t0
                dt = bench._scan_timer(
                    lambda n: int(
                        run_n(
                            n,
                            *(lambda e, m: (jnp.asarray(np.stack(e)), jnp.asarray(np.stack(m))))(
                                *zip(*(args(i) for i in range(n)))
                            ),
                        )
                    ),
                    frames,
                )
                print(
                    f"{name:6s} block={block:2d} {dt*1e3:8.2f} ms/frame "
                    f"(compile {c:.0f}s)",
                    flush=True,
                )
            finally:
                rp.march_pallas = orig


if __name__ == "__main__":
    main()
