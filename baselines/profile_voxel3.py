"""Direct stage split of the voxel frame on the real TPU.

Stages: unproject | unproject+intersect | march-only (intersect hoisted out
of the scan) | full frame.
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
    from f_renderer_tpu.voxel import raycast as rc

    bench.enable_compilation_cache()
    frames = 10
    W, H, level = 960, 540, 3
    rng = np.random.default_rng(0)
    gc, gh = densify(gen_randomly(level, rng), level)
    gcj, ghj = jnp.asarray(gc), jnp.asarray(gh)
    cfg = rc.VoxelRenderConfig(width=W, height=H, level=level)
    proj = np.asarray(set_perspective(np.pi * 0.25, W / H, 0.1, 100.0))
    center = np.array([1.0] * 3, np.float32)

    def args(i):
        ang = 0.3 + 0.08 * i
        eye = center + np.array([3 * np.cos(ang), 1.2, 3 * np.sin(ang)], np.float32)
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ np.asarray(set_identity())
        return eye, np.linalg.inv(mvp).astype(np.float32)

    def pack(n):
        es, ms = zip(*(args(i) for i in range(n)))
        return jnp.asarray(np.stack(es)), jnp.asarray(np.stack(ms))

    length = jnp.float32(cfg.length)

    def st_unproject(eye, inv):
        d = rc._unproject_dirs(W, H, inv)
        return jnp.sum(d[::53, ::47, 0])

    def st_intersect(eye, inv):
        d = rc._unproject_dirs(W, H, inv)
        s, e, v = rc.cube_intersect(eye, d, length)
        return jnp.sum(s[::53, ::47, 0]) + jnp.sum(e[::53, ::47, 1])

    def st_full(eye, inv):
        f = rc.render_voxel_frame(gcj, ghj, eye, inv, cfg)
        return jnp.sum(f[::97, ::89, 0].astype(jnp.int32)).astype(jnp.float32)

    stages = [
        ("unproject", st_unproject),
        ("unproj+intersect", st_intersect),
        ("full", st_full),
    ]
    for name, fn in stages:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, eyes, invs, fn=fn):
            def body(acc, a):
                return acc + fn(*a), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (eyes, invs))
            return acc

        t0 = time.time()
        float(run_n(frames, *pack(frames)))
        c = time.time() - t0
        dt = bench._scan_timer(lambda n: float(run_n(n, *pack(n))), frames)
        print(f"{name:18s} {dt*1e3:8.2f} ms (compile {c:.0f}s)", flush=True)

    # march with intersect hoisted: precompute rays for ONE pose, scan the
    # march only (vary t_max trivially to defeat hoisting).
    eye0, inv0 = args(0)
    d = rc._unproject_dirs(W, H, jnp.asarray(inv0))
    s, e, v = rc.cube_intersect(jnp.asarray(eye0), d, length)
    t_max_vec = (e - s) / d
    t_max = jnp.fmin(
        jnp.fmin(t_max_vec[..., 0], t_max_vec[..., 1]), t_max_vec[..., 2]
    )
    color_i32 = (
        gcj[..., 0].astype(jnp.int32)
        | (gcj[..., 1].astype(jnp.int32) << 8)
        | (gcj[..., 2].astype(jnp.int32) << 16)
    )
    table_flat = jnp.where(ghj, color_i32 | (1 << 24), color_i32).reshape(-1)
    from f_renderer_tpu.voxel.raycast_pallas import march_pallas

    per_t = float(np.float32(np.float32(2.0) / np.float32(2.0**level)) * np.float32(0.01))
    alive = v & (t_max >= 0.0)
    r = gh.shape[0]

    @functools.partial(jax.jit, static_argnums=0)
    def run_march(n, tmaxs):
        def body(acc, tm):
            f = march_pallas(
                s, d, tm, alive, table_flat, r, 2.0, per_t, (0, 0, 0, 255)
            )
            return acc + jnp.sum(f[::97, ::89, 0].astype(jnp.int32)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), tmaxs)
        return acc

    def tmaxs(n):
        return jnp.stack([t_max * (1.0 - 1e-6 * i) for i in range(n)])

    t0 = time.time()
    int(run_march(frames, tmaxs(frames)))
    c = time.time() - t0
    dt = bench._scan_timer(lambda n: int(run_march(n, tmaxs(n))), frames)
    print(f"{'march-only':18s} {dt*1e3:8.2f} ms (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
