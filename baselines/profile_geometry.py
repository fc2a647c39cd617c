"""Geometry-stage breakdown on the real TPU (phong1080 scene)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    # two-point scan-free estimate: loop with dependency via donate? use sum readback
    t0=time.time()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    w1 = time.time()-t0
    t0=time.time()
    for _ in range(2*n): out = fn(*args)
    jax.block_until_ready(out)
    w2 = time.time()-t0
    return max((w2-w1)/n, 1e-9)

def main():
    import bench
    from f_renderer_tpu.pipeline.render import build_triangles, apply_ps_boundary_quirk
    from f_renderer_tpu.pipeline.geometry import geometry_process

    scene = bench.build_scene("phong1080", backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    full = jax.jit(lambda u, d: build_triangles(list(d), scene.vertex_shader, u, cfg)[0])
    print(f"build_triangles: {timeit(full, scene.vs_uniform, draws)*1e3:.2f}ms", flush=True)

    for cap in [256, 64, 16]:
        import dataclasses
        cfg2 = dataclasses.replace(cfg, clip_cap=cap)
        f = jax.jit(lambda u, d: build_triangles(list(d), scene.vertex_shader, u, cfg2)[0])
        print(f"build_triangles clip_cap={cap}: {timeit(f, scene.vs_uniform, draws)*1e3:.2f}ms", flush=True)

    one = jax.jit(lambda u, d: geometry_process(d, scene.vertex_shader, u, cfg.width, cfg.height, clip_cap=256)[0])
    print(f"geometry_process(1 draw {jax.tree.leaves(draws[0])[0].shape[0]}f): {timeit(one, scene.vs_uniform, draws[0])*1e3:.2f}ms", flush=True)

if __name__ == "__main__":
    main()
