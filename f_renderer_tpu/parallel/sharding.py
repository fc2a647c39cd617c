"""shard_map multi-device rendering.

Device mesh axes:

- ``dp`` — data parallel over faces: each shard runs the geometry stage on
  its contiguous block of faces (submission order preserved by block
  sharding + per-shard order offsets), then ``all_gather`` (tiled) rebuilds
  the full TriangleBuffer on every device — the triangle setup is small
  (~100 B/slot) so this rides ICI cheaply.
- ``sp`` — spatial parallel over framebuffer row slabs: each device
  rasterizes + shades rows [lin·slab, (lin+1)·slab) of the frame using the
  origin-offset partial-frame path (the reference's width_range/height_range
  concept, renderer.rs:269-298). Slabs are disjoint → no z-merge collective
  needed; the (rhw, order) argmax is local.

Output frame/depth are sharded over rows across all devices.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from f_renderer_tpu.pipeline.geometry import MAX_FAN, geometry_process
from f_renderer_tpu.pipeline.types import TriangleBuffer
from f_renderer_tpu.pipeline.raster_jnp import rasterize_jnp
from f_renderer_tpu.pipeline.render import RenderConfig
from f_renderer_tpu.pipeline.shade import shade_deferred
from f_renderer_tpu.shaders.api import make_context_codec


def make_render_mesh(devices=None, dp: int | None = None, sp: int | None = None) -> Mesh:
    """Build a ("dp", "sp") mesh over the given (or all) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp = 1
        sp = n
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"dp*sp={dp * sp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def _pad_faces(vs_inputs, multiple: int):
    """Pad the face axis to a multiple with degenerate (zero-area) faces.

    Padding replicates corner 0 of face 0 across all three corners: such a
    face has zero area, so it covers no pixel under the fill rule
    (all edge functions 0 < threshold 1) and the s==0 guard.
    """
    leaves = jax.tree.leaves(vs_inputs)
    f = leaves[0].shape[0]
    pad = (-f) % multiple
    if pad == 0:
        return vs_inputs, f

    def pad_leaf(l):
        degen = jnp.broadcast_to(l[0:1, 0:1], (pad,) + l.shape[1:])
        return jnp.concatenate([jnp.asarray(l), degen], axis=0)

    return jax.tree.map(pad_leaf, vs_inputs), f + pad


def _ps_boundary_quirk_sharded(tri_local, num_draws: int, slot_ranges):
    """render.apply_ps_boundary_quirk on dp-sharded slots.

    The quirk patches the globally-first triangle of each draw
    (phong.rs:364-370 inclusive `<=` boundaries); per-draw counts and
    min-order are O(slots) static-slice reductions over the local
    contiguous draw spans (``slot_ranges``), psum/pmin-reduced over "dp";
    each shard then patches only slots it owns. Exact: order ids are
    globally unique.
    """
    import dataclasses

    import jax.numpy as jnp

    from f_renderer_tpu.pipeline.render import I32_MAX

    if num_draws <= 1:
        return tri_local
    valid = tri_local.valid
    counts, mins = [], []
    for lo, hi in slot_ranges:
        v = valid[lo:hi]
        counts.append(jnp.sum(v).astype(jnp.int32))
        mins.append(jnp.min(jnp.where(v, tri_local.order[lo:hi], I32_MAX)))
    counts = jax.lax.psum(jnp.stack(counts), "dp")
    mins = jax.lax.pmin(jnp.stack(mins), "dp")
    offsets = jnp.cumsum(counts)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-1]])
    target = jnp.searchsorted(offsets, start, side="left").astype(jnp.int32)
    segs = []
    for d, (lo, hi) in enumerate(slot_ranges):
        is_first = valid[lo:hi] & (tri_local.order[lo:hi] == mins[d])
        segs.append(jnp.where(is_first, target[d], tri_local.ps_index[lo:hi]))
    return dataclasses.replace(
        tri_local, ps_index=jnp.concatenate(segs)
    )


def render_frame_sharded(
    draws: Sequence,
    vertex_shader: Callable,
    vs_uniform,
    pixel_shader: Callable,
    ps_uniform,
    config: RenderConfig,
    mesh: Mesh,
):
    """Multi-device render. Returns (frame (H,W,4) u8, depth (H,W) f32),
    sharded over rows across the whole mesh.

    Requires ``config.height % num_devices == 0``.
    """
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    n_lin = n_dp * n_sp
    h, w = config.height, config.width
    assert h % n_lin == 0, f"height {h} must divide by {n_lin} devices"
    slab = h // n_lin

    draws_padded = []
    f_sizes = []
    for d in draws:
        dp_pad, f_pad = _pad_faces(d, n_dp)
        draws_padded.append(dp_pad)
        f_sizes.append(f_pad)

    example = jax.tree.map(lambda l: jnp.zeros(l.shape[2:], jnp.float32), draws[0])
    codec = make_context_codec(vertex_shader, vs_uniform, example)

    def step(vs_uniform, ps_uniform, *draw_shards):
        dp = jax.lax.axis_index("dp")
        sp = jax.lax.axis_index("sp")

        bufs = []
        order_base = 0
        for d, vsin in enumerate(draw_shards):
            f_local = f_sizes[d] // n_dp
            buf, _ = geometry_process(
                vsin,
                vertex_shader,
                vs_uniform,
                w,
                h,
                clip_cap=config.clip_cap,
                ps_index=d,
                order_base=order_base + dp * f_local * MAX_FAN,
            )
            order_base += f_sizes[d] * MAX_FAN
            bufs.append(buf)
        tri_local = functools.reduce(lambda a, b: a.concat(b), bufs)
        if config.replicate_ps_boundary_quirk:
            ranges = []
            lo = 0
            for b in bufs:
                ranges.append((lo, lo + b.num_slots))
                lo += b.num_slots
            tri_local = _ps_boundary_quirk_sharded(
                tri_local, len(draws), ranges
            )
        lin = dp * n_sp + sp
        y0 = lin * slab

        comm = getattr(config, "comm_mode", None) or "all_gather"
        if comm == "stream" and n_dp > 1:
            # Streaming decomposition (SURVEY §5): instead of all_gather
            # replicating the whole scene on every device, the dp ring
            # ppermutes TriangleBuffer shards past each device's resident
            # row slab — O(scene / n_dp) triangle memory per device, the
            # beyond-HBM scaling story. Each round rasterizes + varying-
            # interpolates the resident shard against the local slab; the
            # rounds merge under the exact lexicographic (rhw, order) max
            # (associative + idempotent, so the ring order is irrelevant
            # and the result is bit-identical to the gathered path's
            # raster). Shading happens ONCE at the end from the merged
            # context planes (the XLA shading path — works for custom and
            # builtin shaders alike).
            from f_renderer_tpu.pipeline.raster_pallas import ORDER_NONE
            from f_renderer_tpu.pipeline.shade import (
                interpolate_context,
                shade_from_planes,
            )

            m_local = tri_local.num_slots
            nc = tri_local.num_channels
            tile = (min(config.tile[0], slab), config.tile[1])
            depth = jnp.zeros((slab, w), jnp.float32)
            worder = jnp.full((slab, w), ORDER_NONE, jnp.int32)
            winner = jnp.full((slab, w), -1, jnp.int32)
            psx = jnp.zeros((slab, w), jnp.int32)
            ctxp = jnp.zeros((slab, w, nc), jnp.float32)
            ring = [(i, (i + 1) % n_dp) for i in range(n_dp)]
            tri_cur = tri_local
            for r in range(n_dp):
                if config.backend == "pallas":
                    from f_renderer_tpu.pipeline.raster_pallas import (
                        rasterize_interp_pallas,
                    )

                    ctx_r, ps_r, win_r, d_r = rasterize_interp_pallas(
                        tri_cur, w, slab, tile=tile,
                        origin=(y0, 0), full_size=(h, w),
                    )
                else:
                    win_r, d_r = rasterize_jnp(
                        tri_cur, w, slab, tile=tile,
                        origin=(y0, 0), full_size=(h, w),
                    )
                    ctx_r, ps_r = interpolate_context(
                        tri_cur, win_r, w, slab, origin=(y0, 0)
                    )
                o_r = jnp.where(
                    win_r >= 0,
                    jnp.take(tri_cur.order, jnp.maximum(win_r, 0)),
                    ORDER_NONE,
                )
                better = (d_r > depth) | ((d_r >= depth) & (o_r > worder))
                # after r ppermutes (send i→i+1) device dp holds the shard
                # packed by device (dp − r) mod n_dp; globalize winner ids
                # with that owner's slot offset
                owner = jax.lax.rem(dp - r + n_dp, n_dp)
                depth = jnp.where(better, d_r, depth)
                worder = jnp.where(better, o_r, worder)
                winner = jnp.where(
                    better,
                    jnp.where(win_r >= 0, win_r + owner * m_local, -1),
                    winner,
                )
                psx = jnp.where(better, ps_r, psx)
                ctxp = jnp.where(better[..., None], ctx_r, ctxp)
                if r + 1 < n_dp:
                    tri_cur = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, "dp", ring), tri_cur
                    )
            frame = shade_from_planes(
                ctxp, psx, winner, pixel_shader, ps_uniform, codec,
                background=config.background,
                vectorized=config.shade_vectorized,
            )
            return frame, depth

        from f_renderer_tpu.pipeline.fused import fused_path_ok

        if (
            config.backend == "pallas"
            and config.fused_shade
            and hasattr(pixel_shader, "fused_kind")
            and fused_path_ok(pixel_shader, ps_uniform)
        ):
            # Pack-before-gather (VERDICT r2 weak #5): pack_setup runs on
            # each device's LOCAL slots; only the field-major (NF, m_pad)
            # arrays ride the all_gather, and the per-device O(scene)
            # repack disappears. Slot ids are globalized by a row offset;
            # the order/ps rows were already global.
            from f_renderer_tpu.pipeline.fused import (
                pack_fused,
                prep_fused_packed,
                render_fused_prepared,
            )
            from f_renderer_tpu.pipeline.raster_pallas import _SLOT

            ti, tf = pack_fused(tri_local, config)
            m_pad_local = ti.shape[1]
            ti = ti.at[_SLOT].add(dp * m_pad_local)
            ti_g = jax.lax.all_gather(ti, "dp", axis=1, tiled=True)
            tf_g = jax.lax.all_gather(tf, "dp", axis=1, tiled=True)
            n_global = tri_local.num_slots * n_dp
            arrays, statics = prep_fused_packed(
                ti_g, tf_g, n_global, tri_local.num_channels, config,
                origin=(y0, 0), size=(slab, w),
                # Every shard's trailing padding slots are empty-bbox; the
                # last slot of the gathered array is one of them.
                m_dummy=n_dp * m_pad_local - 1,
            )
            frame, depth, _ = render_fused_prepared(
                arrays, statics, pixel_shader, ps_uniform, config
            )
            return frame, depth

        # Non-fused paths shade from the TriangleBuffer (winner-indexed
        # gathers), so they need the gathered pytree. The buffer is planar:
        # the slot axis is the LAST axis of every field.
        def gather_slots(name, leaf):
            return jax.lax.all_gather(leaf, "dp", axis=leaf.ndim - 1, tiled=True)

        import dataclasses

        tri = TriangleBuffer(
            **{
                f.name: gather_slots(f.name, getattr(tri_local, f.name))
                for f in dataclasses.fields(tri_local)
            }
        )
        if config.backend == "pallas":
            from f_renderer_tpu.pipeline.raster_pallas import rasterize_pallas

            winner, depth = rasterize_pallas(
                tri,
                w,
                slab,
                tile=(min(config.tile[0], slab), config.tile[1]),
                origin=(y0, 0),
                full_size=(h, w),
            )
        else:
            winner, depth = rasterize_jnp(
                tri,
                w,
                slab,
                tile=(min(config.tile[0], slab), config.tile[1]),
                origin=(y0, 0),
                full_size=(h, w),
            )
        frame = shade_deferred(
            tri,
            winner,
            pixel_shader,
            ps_uniform,
            codec,
            background=config.background,
            origin=(y0, 0),
            vectorized=config.shade_vectorized,
        )
        return frame, depth

    shard_spec = P(("dp", "sp"))
    stepped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P()) + tuple(P("dp") for _ in draws_padded),
        out_specs=(shard_spec, shard_spec),
        check_vma=False,
    )
    return stepped(vs_uniform, ps_uniform, *draws_padded)
