"""End-to-end frame rendering: geometry → raster → deferred shade.

Mirrors the phong.rs:314-387 frame structure (geometry over all draws
building one submission-ordered triangle list, then rasterization), fully
jittable. A "draw" is one mesh batch sharing a ps_index (the reference's
PLACE enum selecting a texture, phong.rs:34-38).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from f_renderer_tpu.pipeline.geometry import MAX_FAN, geometry_process
from f_renderer_tpu.pipeline.raster_jnp import rasterize_jnp
from f_renderer_tpu.pipeline.shade import shade_deferred
from f_renderer_tpu.pipeline.types import TriangleBuffer
from f_renderer_tpu.shaders.api import make_context_codec

I32_MAX = jnp.int32(2147483647)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int
    height: int
    background: tuple = (0, 0, 0, 255)
    clip_cap: int = 256
    # (32, 128) is the measured sweet spot for the binned fused kernel at
    # 1080p (baselines/profile_tiles.py, r2): vs (16, 128) it halves the
    # per-program fixed costs (first-chunk DMA wait, sampler range
    # reductions, grid bookkeeping) for less added per-triangle vector
    # work. The jnp path reshapes to tiles only for memory bounding,
    # where it matters little.
    tile: tuple = (32, 128)
    backend: str = "jnp"  # "jnp" | "pallas"
    replicate_ps_boundary_quirk: bool = True
    # Batched pixel-shader calls (see shade.shade_from_planes). Set False
    # for scalar-style custom shaders that cannot broadcast.
    shade_vectorized: bool = True
    # Single-kernel raster+shade for fused_kind-tagged shaders
    # (pipeline/fused.py); falls back automatically for custom shaders.
    fused_shade: bool = True
    # Exact per-tile triangle binning in the fused kernel (bin_pairs) vs
    # chunk-scan with bbox gates.
    raster_binned: bool = True
    # Drop back-facing triangles instead of the reference's winding repair
    # (renderer.rs:309-312). Off by default for parity (SURVEY.md §7.3.3).
    cull_backfaces: bool = False
    # Let the fused kernel pick a taller tile for huge triangle counts.
    tile_auto: bool = True
    # Slot count above which tile_auto switches to 64-row tiles (exposed so
    # tests can force the tall-tile path at small scene sizes). 64 measured
    # faster than 32 on the 1M-tri stress scene (334 vs 349 ms paired A/B,
    # r3) — fewer pairs (bbox h p50 = 8 px) and half the chunk visits.
    tile_auto_threshold: int = 300_000
    # Chunk-deferred varying interpolation in the fused kernel (None =
    # auto: on whenever the kernel carries ctx channels). Exposed for
    # paired A/B profiling (baselines/profile_deferred.py).
    deferred_interp: bool | None = None
    # Pairs per own-range loop iteration in the fused kernel (exact for
    # any value: tail steps clamp-reprocess the last pair, which the
    # idempotent merge rejects). >1 exposes independent scalar reads to
    # the Mosaic scheduler — A/B with baselines/profile_unroll.py.
    # None = auto: 2 above tile_auto_threshold slots (r4 new-scene A/B:
    # th64 368.2 → unroll2 356.0 ms, and the same ~3% at th32; the r3
    # reject was on the clip-truncated old scene), 1 below.
    unroll_pairs: int | None = None
    # Override the per-tile pair-expansion cap (None = size heuristic).
    # Small values force the hierarchical coarse-bin/spill kernel paths.
    bin_k: int | None = None
    # Pair-order gather formulation in the fused prep (None = default;
    # "2d" | "rowtake" | "flat" — baselines/profile_gather.py A/B). The
    # same values can be forced globally via the FR_GATHER env var.
    gather_form: str | None = None
    # Budget on the pair-order gather. The sorted bin table is
    # [real pairs | dummy tail]; the gather is the stress4k prep mountain
    # at ~1 element/cycle no matter the formulation
    # (baselines/profile_gather.py, profile_gather_c64.py,
    # profile_sortpayload.py — r4) and scales linearly with gathered
    # lanes, so only the table prefix actually holding pairs is worth
    # gathering. Auto mode (both knobs None) splits the table into 8
    # uniform 128-aligned segments above tile_auto_threshold slots; each
    # segment past the first is gathered under a lax.cond only when
    # total_pairs reaches it, so the per-frame cost is
    # ceil(occupancy·8)/8 of the full gather — exact for ANY scene.
    # ``pair_budget_frac`` forces the r4 head+tail form instead (one
    # always-gathered head of frac·table columns, one cond-gathered
    # remainder) — kept for paired A/Bs (/tmp/ab_budget.py pattern).
    pair_budget_frac: float | None = None
    # Segment count for auto mode (None = 8 above tile_auto_threshold
    # slots, 1 — no budgeting — below).
    pair_budget_segments: int | None = None
    # Binning scheme: "pairs" (exact per-tile lists via pair expansion,
    # default) or "direct" (single-copy per-slot buckets, raster_pallas.
    # bin_direct — half the bin sort + gather at mid scene sizes, at the
    # cost of coarse/spill gating for multi-fine-span triangles). Above
    # tile_auto_threshold slots "direct" auto-falls-back to "pairs": its
    # ungated spill bucket pathologizes huge scenes (BASELINE.md r3).
    bin_mode: str | None = None
    # Multi-device communication backend (parallel/sharding.py):
    # "all_gather" (default — every device holds the whole packed scene)
    # or "stream" (ppermute triangle shards around the dp ring past
    # resident row slabs — O(scene/n_dp) memory per device, the
    # beyond-HBM decomposition of SURVEY §5).
    comm_mode: str | None = None


def apply_ps_boundary_quirk(
    tri: TriangleBuffer, num_draws: int, slot_ranges=None
) -> TriangleBuffer:
    """Reproduce the inclusive `<=` texture-range boundaries (phong.rs:364-370).

    The reference assigns triangle index i to draw d via chained
    ``prev_off < i <= off_d`` checks, so the *first emitted* triangle of each
    draw lands in the earliest draw whose cumulative offset equals its index
    — i.e. ``searchsorted(offsets, i, side='left')``. Only the first triangle
    per draw differs from its true draw id, so we patch exactly those.

    ``slot_ranges`` — per-draw [lo, hi) slot spans (each draw's slots are
    contiguous in the concatenated buffer): per-draw counts/min-order become
    O(slots) static-slice reductions instead of the O(draws × slots)
    compare-everything fallback (VERDICT r2 weak #6).
    """
    if num_draws <= 1:
        return tri
    valid = tri.valid
    if slot_ranges is not None:
        assert len(slot_ranges) == num_draws
        counts, mins = [], []
        for lo, hi in slot_ranges:
            v = valid[lo:hi]
            counts.append(jnp.sum(v).astype(jnp.int32))
            mins.append(jnp.min(jnp.where(v, tri.order[lo:hi], I32_MAX)))
        offsets = jnp.cumsum(jnp.stack(counts))
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-1]])
        target = jnp.searchsorted(offsets, start, side="left").astype(jnp.int32)
        segs = []
        for d, (lo, hi) in enumerate(slot_ranges):
            is_first = valid[lo:hi] & (tri.order[lo:hi] == mins[d])
            segs.append(
                jnp.where(is_first, target[d], tri.ps_index[lo:hi])
            )
        return dataclasses.replace(tri, ps_index=jnp.concatenate(segs))
    d_ids = jnp.arange(num_draws, dtype=jnp.int32)
    counts = jax.vmap(
        lambda d: jnp.sum(valid & (tri.ps_index == d)).astype(jnp.int32)
    )(d_ids)
    offsets = jnp.cumsum(counts)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-1]])
    target = jnp.searchsorted(offsets, start, side="left").astype(jnp.int32)
    order_masked = jnp.where(valid, tri.order, I32_MAX)
    min_order = jax.vmap(
        lambda d: jnp.min(jnp.where(tri.ps_index == d, order_masked, I32_MAX))
    )(d_ids)
    is_first = valid & (tri.order == min_order[tri.ps_index])
    new_ps = jnp.where(is_first, target[tri.ps_index], tri.ps_index)
    return dataclasses.replace(tri, ps_index=new_ps)


def build_triangles(
    draws: Sequence,
    vertex_shader: Callable,
    vs_uniform,
    config: RenderConfig,
):
    """Geometry stage over all draws → one TriangleBuffer + stats."""
    # ps_index is packed into an i32 setup field (raster_pallas._PS) whose
    # kernel reads mask with PS_MASK = 0xFF.
    assert len(draws) <= 256, "at most 256 draws per frame"
    bufs = []
    order_base = 0
    num_clipped = jnp.int32(0)
    for d, vs_inputs in enumerate(draws):
        f = jax.tree.leaves(vs_inputs)[0].shape[0]
        buf, stats = geometry_process(
            vs_inputs,
            vertex_shader,
            vs_uniform,
            config.width,
            config.height,
            clip_cap=config.clip_cap,
            ps_index=d,
            order_base=order_base,
            cull=config.cull_backfaces,
        )
        order_base += f * MAX_FAN
        num_clipped = num_clipped + stats["num_clipped"]
        bufs.append(buf)
    tri = functools.reduce(lambda a, b: a.concat(b), bufs)
    if config.replicate_ps_boundary_quirk:
        ranges = []
        lo = 0
        for b in bufs:
            ranges.append((lo, lo + b.num_slots))
            lo += b.num_slots
        tri = apply_ps_boundary_quirk(tri, len(draws), ranges)
    return tri, {"num_clipped": num_clipped}


def rasterize(tri: TriangleBuffer, config: RenderConfig):
    if config.backend == "pallas":
        from f_renderer_tpu.pipeline.raster_pallas import rasterize_pallas

        return rasterize_pallas(tri, config.width, config.height, tile=config.tile)
    return rasterize_jnp(tri, config.width, config.height, tile=config.tile)


def render_frame(
    draws: Sequence,
    vertex_shader: Callable,
    vs_uniform,
    pixel_shader: Callable,
    ps_uniform,
    config: RenderConfig,
):
    """Render one frame. Returns (frame (H,W,4) u8, depth (H,W) f32, stats).

    ``draws``: sequence of vs_input pytrees (leaves (F_d, 3, ...)).
    Fully traceable: wrap in jax.jit holding `draws` structure static.
    """
    tri, stats = build_triangles(draws, vertex_shader, vs_uniform, config)
    example = jax.tree.map(
        lambda l: jnp.zeros(l.shape[2:], jnp.float32), draws[0]
    )
    codec = make_context_codec(vertex_shader, vs_uniform, example)

    if config.backend == "pallas":
        from f_renderer_tpu.pipeline.fused import fused_path_ok

        if (
            config.fused_shade
            and hasattr(pixel_shader, "fused_kind")
            and fused_path_ok(pixel_shader, ps_uniform)
        ):
            # Whole per-pixel pipeline in one kernel (pipeline/fused.py).
            from f_renderer_tpu.pipeline.fused import render_fused_pallas

            frame, depth, _ = render_fused_pallas(
                tri, pixel_shader, ps_uniform, config
            )
            return frame, depth, stats

        # Fused raster + varying interpolation: per-pixel gathers from the
        # triangle table lower to scalar loops on TPU; the kernel
        # interpolates densely in VMEM instead (raster_pallas.py docstring).
        from f_renderer_tpu.pipeline.raster_pallas import rasterize_interp_pallas
        from f_renderer_tpu.pipeline.shade import shade_from_planes

        ctx, ps_idx, winner, depth = rasterize_interp_pallas(
            tri, config.width, config.height, tile=config.tile
        )
        frame = shade_from_planes(
            ctx,
            ps_idx,
            winner,
            pixel_shader,
            ps_uniform,
            codec,
            background=config.background,
            vectorized=config.shade_vectorized,
        )
        return frame, depth, stats

    winner, depth = rasterize(tri, config)
    frame = shade_deferred(
        tri,
        winner,
        pixel_shader,
        ps_uniform,
        codec,
        background=config.background,
        vectorized=config.shade_vectorized,
    )
    return frame, depth, stats
