"""Paired A/B of pair-order gather formulations (stress4k prep bottleneck).

profile_prep measured the fused prep's pair-order gather
(fused.py: ``tri_i32[:, ptri]`` / ``tri_f32[:, ptri]``) at ~115 ms of the
~287 ms stress4k frame — 56 rows x 2M pairs. CLAUDE.md's gather lesson
says multi-dim indexing can lower far worse than single-axis flat
``jnp.take``; this probe times the same gather as:

- 2d       : arr[:, ptri]                       (current formulation)
- rowtake  : stack(per-row jnp.take(arr[r], ptri))
- flat     : one jnp.take(arr.ravel(), row_offsets + ptri)
- dynslice : n/a (indices are data-dependent)

Inputs are the REAL stress4k packed arrays + pair list (one frame,
host-staged once, passed as jit args). Iterations are serialized through
the checksum carry (index perturbed by carry&1) so XLA cannot hoist the
gather out of the scan.

Usage: PROFILE_CONFIG=stress4k PROFILE_FRAMES=4 python baselines/profile_gather.py
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
    from f_renderer_tpu.pipeline.raster_pallas import _cdiv, bin_pairs
    from f_renderer_tpu.pipeline.render import build_triangles

    bench.enable_compilation_cache()
    name = os.environ.get("PROFILE_CONFIG", "stress4k")
    frames = int(os.environ.get("PROFILE_FRAMES", "4"))
    scene = bench.build_scene(name, backend="pallas")
    cfg = scene.config

    def prep_inputs(angle):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(scene.vs_uniform, model=model)
        tri, _ = build_triangles(
            list(scene.draws), scene.vertex_shader, vs_u, cfg
        )
        ti, tf = pack_fused(tri, cfg)
        n = tri.num_slots
        th = 64 if n > 300_000 else cfg.tile[0]
        tw = cfg.tile[1]
        k = 6 if n <= 300_000 else 2
        h_pad = _cdiv(cfg.height, th) * th
        w_pad = _cdiv(cfg.width, tw) * tw
        ptri, off = bin_pairs(
            ti, (th, tw), (h_pad // th, w_pad // tw), k, 128,
            m_dummy=n, kc=k,
        )
        return ti, tf, ptri

    ti, tf, ptri = jax.jit(prep_inputs)(jnp.float32(0.3))
    ti_d = jax.device_put(jax.block_until_ready(ti))
    tf_d = jax.device_put(jax.block_until_ready(tf))
    pt_d = jax.device_put(jax.block_until_ready(ptri))
    m_pad = ti.shape[1]
    print(
        f"ti {ti.shape} tf {tf.shape} pairs {ptri.shape} "
        f"({(ti.shape[0] + tf.shape[0]) * ptri.shape[0] * 4 / 1e6:.0f} MB "
        "gathered/frame)",
        flush=True,
    )

    def g_2d(ti, tf, idx):
        return ti[:, idx], tf[:, idx]

    def g_rowtake(ti, tf, idx):
        bi = jnp.stack([jnp.take(ti[r], idx) for r in range(ti.shape[0])])
        bf = jnp.stack([jnp.take(tf[r], idx) for r in range(tf.shape[0])])
        return bi, bf

    def g_flat(ti, tf, idx):
        def one(arr):
            nf = arr.shape[0]
            offs = (jnp.arange(nf, dtype=jnp.int32) * arr.shape[1])[:, None]
            return jnp.take(arr.ravel(), offs + idx[None, :])
        return one(ti), one(tf)

    variants = [("2d", g_2d), ("rowtake", g_rowtake), ("flat", g_flat)]
    sel = os.environ.get("PROFILE_VARIANTS")
    if sel:
        keep = set(sel.split(","))
        variants = [v for v in variants if v[0] in keep]

    for vname, fn in variants:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, ti, tf, pt, fn=fn):
            def body(c, _):
                idx = jnp.minimum(pt + (c & 1), m_pad - 1)
                bi, bf = fn(ti, tf, idx)
                c2 = (
                    jnp.sum(bi, dtype=jnp.int32)
                    + jnp.sum(bf).astype(jnp.int32)
                )
                return c + c2, None
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return out

        t0 = time.time()
        chk = int(run_n(frames, ti_d, tf_d, pt_d))
        comp = time.time() - t0
        int(run_n(2 * frames, ti_d, tf_d, pt_d))
        t0 = time.time()
        int(run_n(frames, ti_d, tf_d, pt_d))
        w1 = time.time() - t0
        t0 = time.time()
        int(run_n(2 * frames, ti_d, tf_d, pt_d))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        print(
            f"[{vname}] {per * 1e3:.2f} ms/gather checksum={chk} "
            f"(compile+first {comp:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
