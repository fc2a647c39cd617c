"""phong1080 fused-kernel roofline: hand-counted issue bound on the bench scene.

VERDICT r3 #3: do for the raster what profile_voxel_roofline.py did for the
voxel march — count what the fused kernel + sampler MUST execute on the
exact phong1080 bench scene and publish a VPU-issue-bound frame time, so
"≥1 Gpix/s @1080p" is either reachable or provably not with this design.

Method (runs on CPU, no TPU needed):
1. Render the exact bench scene through the jnp backend to get the
   per-pixel winner / ps / uv planes (bit-faithful interpolation — the
   same values the fused kernel computes in its deferred pass).
2. Replicate the binning (pack_fused bboxes → per-(32,128)-tile pair and
   chunk counts) and the sampler's per-(tile, texture) row/page ranges
   (texture_pallas.sample_packed_planar's y_lo..y_hi × p_lo..p_hi) in
   NumPy to get exact per-tile loop-iteration counts.
3. Multiply by hand-counted per-iteration VPU issue counts (from the
   kernel bodies in raster_pallas._make_kernel / fused._make_epilogue /
   texture_pallas.sample_packed_planar) and report the issue-bound frame
   time at the v5e clock range, next to the measured frame.

Hand-counted issue constants (v5e VPU = (8,128) lanes/issue; a (32,128)
plane op = 4 issues):

- PAIR loop body (deferred, th=32):   59 vector ops  → 236 issues/pair
    i32 edges e01/e20/e12+cover: 19; f32 spf subs+crosses+s+inv+la..lc+rhw:
    31; merge accept/depth/worder/wpair: 9.
- deferred chunk update:             ~150 ops        → 600 issues/chunk
    35 lane-gathers (33 f32 + 2 i32; broadcast+gather each), bary
    recompute 22, coefs 6, 8-ch interp 48, winner/ps/mask 6.
- phong epilogue (lighting+combine+pack, no sampler):
                                     ~110 ops        → 440 issues/tile
- sampler per-texture setup:          ~30 ops + 4 cross-lane reductions
    (measured ~200 cyc each on (32,128) — CLAUDE.md)
                                                     → 120 issues + 800 cyc
- sampler (row, page) iteration, "rows" body (r2-r4 mid):
                                      ~44 ops        → 176 issues/iter
    2 lane gathers, 6 weight ops, 3 ch × (unpack 6 + fma 4), alpha 2,
    wy_row amortized, loop overhead.
- sampler 8-row GROUP, "grp2" body (r4 late, the shipped default):
    tile load 2 + sub/page-mask prep 8 ops + 8 × (broadcast + 2 lane
    gathers + 4 compares + 4 selects = 11 ops) + ~8 scalar flat-index ops
                                                     → ~394 issues/group
- sampler per-texture post-loop tap epilogue (grp/taps only): weights 4 +
  3 ch × (4 unpack·3 + fma 4) + alpha 3 ≈ 55 ops     → 220 issues/setup

The bound assumes 1 issue/cycle retired (no multi-ALU superscalar credit)
and zero DMA stall — i.e. the optimistic floor for THIS design. Both the
legacy rows-body model (which the 8.38 ms r4-start frame matched) and the
shipped grp2 model are printed.

Usage: python baselines/profile_phong_roofline.py
"""

from __future__ import annotations

import os
import sys

# JAX_PLATFORMS=cpu set before any jax import keeps this replica local;
# (the axon sitecustomize still registers its plugin — that's harmless, it
# just isn't selected. Stripping PYTHONPATH here would be a no-op: sys.path
# was already built at interpreter startup — re-exec like tests/conftest.py
# if full isolation is ever needed.)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TH, TW = 32, 128
CHUNK = 128

ISS_PAIR = 236
ISS_CHUNK_UPD = 600
ISS_EPILOGUE = 440
ISS_SAMP_SETUP = 120
CYC_SAMP_REDUCTIONS = 800
ISS_SAMP_ITER = 176
ISS_SAMP_GROUP = 394
ISS_SAMP_EPI = 220
CLOCKS = (0.94e9, 1.7e9)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline.fused import pack_fused
    from f_renderer_tpu.pipeline.raster_pallas import (
        _MAXXY, _MINXY, _unpack_xy,
    )
    from f_renderer_tpu.pipeline.render import build_triangles, rasterize
    from f_renderer_tpu.pipeline.shade import interpolate_context

    scene = bench.build_scene("phong1080", backend="jnp")
    cfg = scene.config
    W, H = cfg.width, cfg.height
    angle = 0.35  # mid-animation frame (bench sweeps angles; one is typical)
    model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
    vs_u = dict(scene.vs_uniform, model=model)

    tri, _ = build_triangles(list(scene.draws), scene.vertex_shader, vs_u, cfg)
    ti, _tf = pack_fused(tri, cfg)
    ti = np.asarray(ti)
    winner, _depth = rasterize(tri, cfg)
    ctx, ps = interpolate_context(tri, winner, W, H)
    winner = np.asarray(winner)
    ps = np.where(winner >= 0, np.asarray(ps), -1)
    uv = np.asarray(ctx[..., 6:8])  # phong ctx order: normal(3) pos(3) uv(2)

    stack = scene.ps_uniform["textures"]
    dims = np.asarray(stack.dims)  # (T, 2) = (h, w)
    t_count = dims.shape[0]
    hmax = int(dims[:, 0].max())
    pages = -(-int(dims[:, 1].max()) // 128)

    nty, ntx = -(-H // TH), -(-W // TW)
    minx, miny = (np.asarray(v) for v in _unpack_xy(ti[_MINXY]))
    maxx, maxy = (np.asarray(v) for v in _unpack_xy(ti[_MAXXY]))

    # --- per-tile pair counts (exact bbox-tile intersections; at 6.4k
    # slots every span fits the k=6 fine caps, so own pairs = all pairs).
    tx0 = np.clip(minx // TW, 0, ntx - 1)
    tx1 = np.clip((maxx - 1) // TW, 0, ntx - 1)
    ty0 = np.clip(miny // TH, 0, nty - 1)
    ty1 = np.clip((maxy - 1) // TH, 0, nty - 1)
    nonempty = (maxx > minx) & (maxy > miny)
    pairs_per_tile = np.zeros((nty, ntx), np.int64)
    for s in np.nonzero(nonempty)[0]:
        pairs_per_tile[ty0[s]:ty1[s] + 1, tx0[s]:tx1[s] + 1] += 1
    n_pairs = int(pairs_per_tile.sum())
    chunks_per_tile = -(-pairs_per_tile // CHUNK)
    n_chunks = int(chunks_per_tile.sum())
    live_tiles = int((pairs_per_tile > 0).sum())

    # --- per-(tile, texture) sampler iteration counts, replicating
    # sample_packed_planar's range math on the interpolated uv planes.
    Hp, Wp = nty * TH, ntx * TW
    ps_p = np.full((Hp, Wp), -1, np.int32)
    ps_p[:H, :W] = ps
    u_p = np.zeros((Hp, Wp), np.float32)
    v_p = np.zeros((Hp, Wp), np.float32)
    u_p[:H, :W] = uv[..., 0]
    v_p[:H, :W] = uv[..., 1]

    total_iters = 0
    total_groups = 0
    setups = 0
    for ty in range(nty):
        for tx in range(ntx):
            if pairs_per_tile[ty, tx] == 0:
                continue
            sl = np.s_[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW]
            tps, tu, tv = ps_p[sl], u_p[sl], v_p[sl]
            for t in range(t_count):
                setups += 1
                sel = tps == t
                if not sel.any():
                    continue
                h_t, w_t = int(dims[t, 0]), int(dims[t, 1])
                x = tu[sel] * w_t
                y = tv[sel] * h_t
                x = np.where(np.isnan(x), 0.0, x)
                y = np.where(np.isnan(y), 0.0, y)
                y_hi_clamp = w_t - 1  # width-clamp-on-y quirk
                x1 = np.clip(np.trunc(x), 0, w_t - 1).astype(np.int64)
                y1 = np.clip(np.trunc(y), 0, y_hi_clamp).astype(np.int64)
                x2 = np.minimum(x1 + 1, w_t - 1)
                y2 = np.minimum(y1 + 1, y_hi_clamp)
                y1 = np.minimum(y1, hmax - 1)
                y2 = np.minimum(y2, hmax - 1)
                y_lo, y_hi = int(y1.min()), int(y2.max())
                p_lo, p_hi = int((x1 >> 7).min()), int((x2 >> 7).max())
                p_span = p_hi - p_lo + 1
                total_iters += (y_hi - y_lo + 1) * p_span
                total_groups += ((y_hi >> 3) - (y_lo >> 3) + 1) * p_span

    shaded = int((winner >= 0).sum())
    print(f"scene: {tri.num_slots} slots, {n_pairs} pairs, "
          f"{n_chunks} chunks, {live_tiles}/{nty * ntx} live tiles, "
          f"{shaded / (W * H):.1%} coverage")
    print(f"sampler: {total_iters} (row,page) iterations over {setups} "
          f"(tile,texture) setups "
          f"(avg {total_iters / max(live_tiles, 1):.1f}/tile)")

    red_cyc = setups * CYC_SAMP_REDUCTIONS
    base = {
        "pair loop": n_pairs * ISS_PAIR,
        "chunk updates": n_chunks * ISS_CHUNK_UPD,
        "epilogue": live_tiles * ISS_EPILOGUE,
        "sampler setup+reductions": setups * ISS_SAMP_SETUP + red_cyc,
    }
    models = {
        "rows body (r2-r4 mid)": dict(
            base, **{"sampler iterations": total_iters * ISS_SAMP_ITER}
        ),
        "grp2 body (shipped)": dict(
            base,
            **{
                "sampler groups": total_groups * ISS_SAMP_GROUP,
                "sampler tap epilogue": setups * ISS_SAMP_EPI,
            },
        ),
    }
    for name, parts in models.items():
        total_cyc = sum(parts.values())
        print(f"\nissue-cycle budget — {name}:")
        for k, v in parts.items():
            print(f"  {k:26s} {v / 1e6:7.2f} Mcyc  ({v / total_cyc:5.1%})")
        print(f"  {'TOTAL':26s} {total_cyc / 1e6:7.2f} Mcyc")
        for clk in CLOCKS:
            ms = total_cyc / clk * 1e3
            print(f"floor @ {clk / 1e9:.2f} GHz: {ms:.2f} ms "
                  f"({W * H / 1e6 / (ms / 1e3):.0f} Mpix/s)")


if __name__ == "__main__":
    main()
