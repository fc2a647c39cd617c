"""Paired A/B: pack_setup source-layout cost (stress4k prep stage 1).

pack_setup measured ~23 ms at 1M slots (profile_prep) for ~220 MB of
field-major output — ~10× the bandwidth cost. Suspect: reading the
(M, 3, 2) spi/spf and (M, 3) rhw/top_left slot-major arrays column-wise
(a transpose per row). This probe times, process-paired:

- pack_cur    : pack_setup(tri) as-is
- pack_planar : the same output built from pre-planarized (M,) component
                planes (what geometry.py could hand over directly — it
                already computes exactly these planes before stacking,
                geometry.py:157-166)

If planar wins big, TriangleBuffer should carry planar spi/spf/rhw
(the ctx field already moved for the same reason, types.py docstring).

Usage: PROFILE_CONFIG=stress4k PROFILE_FRAMES=6 python baselines/profile_pack.py
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
    from f_renderer_tpu.pipeline.fused import pack_fused
    from f_renderer_tpu.pipeline.raster_pallas import NF_I, _cdiv, _nf_f
    from f_renderer_tpu.pipeline.render import build_triangles

    bench.enable_compilation_cache()
    name = os.environ.get("PROFILE_CONFIG", "stress4k")
    frames = int(os.environ.get("PROFILE_FRAMES", "6"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config

    def tri_of(angle):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(scene.vs_uniform, model=model)
        tri, _ = build_triangles(
            list(scene.draws), scene.vertex_shader, vs_u, cfg
        )
        return tri

    tri = jax.jit(tri_of)(jnp.float32(0.3))
    tri = jax.block_until_ready(jax.device_put(tri))
    m = tri.num_slots
    m_pad = _cdiv(m + 1, 128) * 128
    c = tri.num_channels

    # pre-planarized sources (outside timing)
    planes = dict(
        sx=[jnp.asarray(tri.spi[v, 0]) for v in range(3)],
        sy=[jnp.asarray(tri.spi[v, 1]) for v in range(3)],
        fx=[jnp.asarray(tri.spf[v, 0]) for v in range(3)],
        fy=[jnp.asarray(tri.spf[v, 1]) for v in range(3)],
        rhw=[jnp.asarray(tri.rhw[v]) for v in range(3)],
        tl=[jnp.asarray(tri.top_left[v]) for v in range(3)],
    )
    planes = jax.block_until_ready(jax.device_put(planes))
    aux = jax.block_until_ready(
        jax.device_put(
            dict(valid=tri.valid, order=tri.order, ps=tri.ps_index, ctx=tri.ctx)
        )
    )

    def pack_cur(pert, tri):
        import dataclasses as dc

        tri = dc.replace(tri, order=tri.order + pert)
        ti, tf = pack_fused(tri, cfg)
        return jnp.sum(ti, dtype=jnp.int32) + jnp.sum(tf).astype(jnp.int32)

    def pack_planar(pert, pl_, ax):
        ax = dict(ax, order=ax["order"] + pert)
        sx, sy = pl_["sx"], pl_["sy"]
        valid = ax["valid"]
        width, height = cfg.width, cfg.height
        minx3 = jnp.minimum(jnp.minimum(sx[0], sx[1]), sx[2])
        maxx3 = jnp.maximum(jnp.maximum(sx[0], sx[1]), sx[2])
        miny3 = jnp.minimum(jnp.minimum(sy[0], sy[1]), sy[2])
        maxy3 = jnp.maximum(jnp.maximum(sy[0], sy[1]), sy[2])
        min_x = jnp.where(valid, jnp.clip(minx3, 0, width), 0)
        max_x = jnp.where(valid, jnp.clip(maxx3, 0, width), 0)
        min_y = jnp.where(valid, jnp.clip(miny3, 0, height), 0)
        max_y = jnp.where(valid, jnp.clip(maxy3, 0, height), 0)
        area2 = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (
            sx[2] - sx[0]
        )
        tl = pl_["tl"]
        ps_tl = (
            ax["ps"].astype(jnp.int32)
            | (tl[0].astype(jnp.int32) << 8)
            | (tl[1].astype(jnp.int32) << 9)
            | (tl[2].astype(jnp.int32) << 10)
        )
        cols_i = jnp.stack(
            [sx[0], sy[0], sx[1], sy[1], sx[2], sy[2], area2, ax["order"],
             min_x, max_x, min_y, max_y,
             jnp.arange(m, dtype=jnp.int32), ps_tl]
        )
        rows_f = [
            pl_["fx"][0], pl_["fy"][0], pl_["fx"][1], pl_["fy"][1],
            pl_["fx"][2], pl_["fy"][2],
            pl_["rhw"][0], pl_["rhw"][1], pl_["rhw"][2],
        ]
        cols_f = jnp.concatenate(
            [jnp.stack(rows_f), ax["ctx"]], axis=0
        )

        def pad_to(rows, nf, dtype):
            out = jnp.zeros((nf, m_pad), dtype)
            return out.at[: rows.shape[0], :m].set(rows.astype(dtype))

        ti = pad_to(cols_i, NF_I, jnp.int32)
        tf = pad_to(cols_f, _nf_f(c), jnp.float32)
        return jnp.sum(ti, dtype=jnp.int32) + jnp.sum(tf).astype(jnp.int32)

    runs = [
        ("pack_cur", pack_cur, (tri,)),
        ("pack_planar", pack_planar, (planes, aux)),
    ]
    for vname, fn, args in runs:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, *a, fn=fn):
            def body(cc, _):
                return cc + fn(cc & 1, *a), None
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return out

        t0 = time.time()
        chk = int(run_n(frames, *args))
        comp = time.time() - t0
        int(run_n(2 * frames, *args))
        t0 = time.time()
        int(run_n(frames, *args))
        w1 = time.time() - t0
        t0 = time.time()
        int(run_n(2 * frames, *args))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        print(
            f"[{vname}] {per * 1e3:.2f} ms/pack checksum={chk} "
            f"(compile+first {comp:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
