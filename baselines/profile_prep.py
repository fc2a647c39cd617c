"""Break stress4k's fused prep into sub-stages on TPU.

Times (two-point scan fit, like profile_r2): pack_setup alone; pack+bin
keys+sort+searchsorted (no pair gather); full prep (with the (NF, Npad)
pair-order gathers). Also prints the pair-span histogram on host to size
the ``k``/``kc`` expansion caps.

Usage: PROFILE_CONFIG=stress4k PROFILE_FRAMES=4 python baselines/profile_prep.py
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
    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline.fused import pack_fused, prep_fused
    from f_renderer_tpu.pipeline.raster_pallas import (
        _MINXY, _MAXXY, _cdiv, _unpack_xy, bin_pairs,
    )
    from f_renderer_tpu.pipeline.render import build_triangles

    bench.enable_compilation_cache()
    name = os.environ.get("PROFILE_CONFIG", "stress4k")
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config
    draws = tuple(scene.draws)

    draws_d = jax.device_put(draws)
    vs_u_d = jax.device_put(scene.vs_uniform)

    def tri_of(angle, vs_u, draws=None):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(vs_u, model=model)
        tri, _ = build_triangles(
            list(draws if draws is not None else draws_d),
            scene.vertex_shader, vs_u, cfg,
        )
        return tri

    # ---- host-side span histogram (one frame) ----
    tri0 = jax.jit(tri_of)(jnp.float32(0.3), scene.vs_uniform)
    ti, _tf = jax.jit(lambda t: pack_fused(t, cfg))(tri0)
    ti = np.asarray(ti)
    th = 32 if tri0.num_slots > 300_000 else cfg.tile[0]
    tw = cfg.tile[1]
    minx, miny = _unpack_xy(ti[_MINXY])
    maxx, maxy = _unpack_xy(ti[_MAXXY])
    ne = (maxx > minx) & (maxy > miny)
    sx = np.maximum(maxx - 1, minx) // tw - minx // tw + 1
    sy = np.maximum(maxy - 1, miny) // th - miny // th + 1
    span = (sx * sy)[ne]
    hist = {int(s): int((span == s).sum()) for s in np.unique(span)[:12]}
    print(f"nonempty={ne.sum()} span histogram (fine tiles, th={th}): {hist}",
          flush=True)
    print(f"span<=1: {(span <= 1).mean():.3f}  <=2: {(span <= 2).mean():.3f}  "
          f"<=4: {(span <= 4).mean():.3f}  <=6: {(span <= 6).mean():.3f}",
          flush=True)

    k = 6 if tri0.num_slots <= 300_000 else 4
    h_pad = _cdiv(cfg.height, th) * th
    w_pad = _cdiv(cfg.width, tw) * tw
    grid = (h_pad // th, w_pad // tw)

    def stage_pack(angle, vs_u, draws):
        tri = tri_of(angle, vs_u, draws)
        ti, tf = pack_fused(tri, cfg)
        return ti[0, 0] + ti[_MAXXY, -1] + tf[0, 0].astype(jnp.int32)

    def stage_bin(angle, vs_u, draws):
        tri = tri_of(angle, vs_u, draws)
        ti, tf = pack_fused(tri, cfg)
        ptri, off = bin_pairs(
            ti, (th, tw), grid, k, 128, m_dummy=tri.num_slots, kc=k
        )
        return ptri[0] + off[-1] + tf[0, 0].astype(jnp.int32)

    def stage_full(angle, vs_u, draws):
        tri = tri_of(angle, vs_u, draws)
        arrays, _ = prep_fused(tri, cfg)
        return (
            arrays["cb"][-1]
            + arrays["tri_i32"][0, 0]
            + arrays["tri_f32"][0, 0].astype(jnp.int32)
        )

    def stage_geom(angle, vs_u, draws):
        tri = tri_of(angle, vs_u, draws)
        return tri.order[0] + tri.spi[0, 0, 0]

    results = {}
    for sname, stage in [
        ("geometry", stage_geom),
        ("pack", stage_pack),
        ("pack+bin", stage_bin),
        ("prep_full", stage_full),
    ]:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, vs_u, draws, stage=stage):
            def body(c, i):
                a = 0.1 + 0.05 * i.astype(jnp.float32)
                return c + stage(a, vs_u, draws), None
            out, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(n, dtype=jnp.int32)
            )
            return out

        t0 = time.time()
        int(run_n(frames, vs_u_d, draws_d))
        c = time.time() - t0
        int(run_n(2 * frames, vs_u_d, draws_d))  # warm 2N (avoid timing its compile)
        t0 = time.time()
        int(run_n(frames, vs_u_d, draws_d))
        w1 = time.time() - t0
        t0 = time.time()
        int(run_n(2 * frames, vs_u_d, draws_d))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        results[sname] = per
        print(f"[{sname}] {per * 1e3:.2f} ms/iter (compile+first {c:.0f}s)",
              flush=True)

    g = results["geometry"]
    print(
        f"split: pack {1e3 * (results['pack'] - g):.2f} ms | "
        f"bin(sort) {1e3 * (results['pack+bin'] - results['pack']):.2f} ms | "
        f"pair-gather {1e3 * (results['prep_full'] - results['pack+bin']):.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
