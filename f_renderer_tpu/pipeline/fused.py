"""Fully fused single-kernel renderer: raster + interp + shade + pack.

For the built-in shader family (flat / gouraud / textured / phong — the
reference's example shaders, phong.rs:114-154), the whole per-pixel pipeline
runs inside one Pallas kernel: the triangle loop leaves depth / ps / varying
planes in VMEM registers, then a planar shading epilogue computes lighting,
samples textures with in-VMEM 128-lane gathers (see
shaders/texture_pallas.py for the technique), and packs RGBA8 into one u32
plane — no intermediate HBM traffic between raster and shade.

Channel layout note: inside a TPU kernel the last two dims are (sublane,
lane) tiles, so (H, W, 3)-shaped math would waste 125/128 lanes. The
epilogues therefore operate on per-channel (th, tw) planes — which is why
this path is restricted to shaders the module knows how to planarize
(pixel shaders tagged with ``fused_kind`` by shaders/builtin.py). Custom
shaders use the non-fused pallas path (XLA shading) automatically.

Varying channel order matches the ContextCodec dict-key sort:
flat/gouraud → color; textured → uv; phong → normal(3), pos(3), uv(2).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f_renderer_tpu.pipeline.raster_pallas import (
    NF_I,
    NF_I_REAL,
    NF_SMEM_F,
    _SLOT,
    _cdiv,
    _make_kernel,
    _prep,
)
from f_renderer_tpu.pipeline.types import TriangleBuffer

LANES = 128


def _rsqrt(x):
    return jax.lax.rsqrt(x)


def _normalize3(x, y, z):
    inv = _rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _phong_light_planar(nx, ny, nz, px, py, pz, view_pos, light_pos, light_color):
    """Planar mirror of builtin._phong_lighting (phong.rs:133-144)."""
    lp = light_pos
    lc = light_color
    nx, ny, nz = _normalize3(nx, ny, nz)
    ldx, ldy, ldz = _normalize3(lp[0] - px, lp[1] - py, lp[2] - pz)
    diff = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
    vdx, vdy, vdz = _normalize3(view_pos[0] - px, view_pos[1] - py, view_pos[2] - pz)
    # reflect(-light_dir, n) = normalize(2 (L·N) N − L), L = -light_dir
    d = -(ldx * nx + ldy * ny + ldz * nz)
    rx, ry, rz = _normalize3(2.0 * d * nx + ldx, 2.0 * d * ny + ldy, 2.0 * d * nz + ldz)
    spec = jnp.maximum(vdx * rx + vdy * ry + vdz * rz, 0.0) ** 32
    return tuple(0.1 * lc[c] + diff * lc[c] + 0.5 * spec * lc[c] for c in range(3))


def _make_epilogue(
    kind, *, t_count, hmax, pages, bg_packed, light_pos, light_color,
    opaque=False,
):
    from f_renderer_tpu.shaders.texture_pallas import sample_packed_planar

    def epilogue(depth, worder, winner, ps, ctx, refs):
        uni_ref, dims_ref, tex_ref, rgba_ref, depth_ref, winner_ref = refs
        shape = depth.shape
        psm = jnp.where(winner >= 0, ps, -1)
        view_pos = (uni_ref[0], uni_ref[1], uni_ref[2])

        def sample(u, v):
            return sample_packed_planar(
                tex_ref, dims_ref, psm, u, v,
                t_count=t_count, hmax=hmax, pages=pages, opaque=opaque,
            )

        if kind == "flat":
            color = (ctx[0], ctx[1], ctx[2], ctx[3])
        elif kind == "gouraud":
            color = (ctx[0], ctx[1], ctx[2], jnp.ones(shape, jnp.float32))
        elif kind == "textured":
            color = sample(ctx[0], ctx[1])
        elif kind == "phong":
            light = _phong_light_planar(
                ctx[0], ctx[1], ctx[2], ctx[3], ctx[4], ctx[5],
                view_pos, light_pos, light_color,
            )
            tex = sample(ctx[6], ctx[7])
            color = (tex[0] * light[0], tex[1] * light[1], tex[2] * light[2], tex[3])
        else:
            raise ValueError(kind)

        def u8(p):
            return jnp.clip(p * 255.0, 0.0, 255.0).astype(jnp.int32)

        packed = (
            u8(color[0])
            | (u8(color[1]) << 8)
            | (u8(color[2]) << 16)
            | (u8(color[3]) << 24)
        )
        rgba_ref[:] = jnp.where(winner >= 0, packed, jnp.int32(bg_packed))
        depth_ref[:] = depth
        winner_ref[:] = winner

    return epilogue


def fused_path_ok(pixel_shader, ps_uniform) -> bool:
    """Can the fused single-kernel path run this shader + uniforms?

    The in-kernel sampler keeps the whole packed RGBA8 stack in VMEM
    (4 bytes/texel, any width — texture_pallas.sample_packed_planar);
    stacks past the VMEM budget fall back to the rasterize_interp +
    XLA-shade path. render.py checks this BEFORE selecting the fused path
    so an oversized stack degrades gracefully (VERDICT r1 weak #4).
    """
    kind = getattr(pixel_shader, "fused_kind", None)
    if kind not in ("textured", "phong"):
        return True
    stack = ps_uniform.get("textures") if hasattr(ps_uniform, "get") else None
    if stack is None:
        return True
    from f_renderer_tpu.shaders.texture import PACKED_VMEM_BUDGET

    return stack.packed_nbytes <= PACKED_VMEM_BUDGET


def pack_fused(tri: TriangleBuffer, config):
    """Pack a TriangleBuffer into the kernel's field-major arrays.

    Stage 1 of the fused prep — O(slots) work with NO dependence on the
    render sub-rect, so multi-device renderers run it **sharded** over
    their local slots and all_gather the packed (NF, m_pad) arrays along
    the slot (lane) axis instead of gathering the TriangleBuffer pytree
    and re-packing the full scene on every device (VERDICT r2 weak #5).
    Bboxes clip against the full config frame. m_pad guarantees ≥1
    trailing padding slot (empty bbox — usable as the bin dummy).
    """
    from f_renderer_tpu.pipeline.raster_pallas import pack_setup

    m = tri.num_slots
    m_pad = _cdiv(m + 1, 128) * 128
    return pack_setup(
        tri, config.width, config.height, m_pad, with_ctx=True
    )


def _pair_gather(arr, idx, form=None):
    """Pair-order gather of field-major (NF, m_pad) → (NF, n_pairs).

    Formulation matters enormously on TPU: this is the stress4k prep
    bottleneck (~115 ms of the ~287 ms r3 frame for 56 rows × 2M pairs,
    baselines/profile_prep.py). ``arr[:, idx]`` (a multi-dim gather) vs
    per-row flat ``jnp.take`` lower very differently — see
    baselines/profile_gather.py for the paired A/B. Selected per config
    (RenderConfig.gather_form) or globally via FR_GATHER (2d | rowtake |
    flat).
    """
    import os

    form = form or os.environ.get("FR_GATHER", "2d")
    if form == "2d":
        return arr[:, idx]
    if form == "flat":
        nf, m_pad = arr.shape
        offs = (jnp.arange(nf, dtype=jnp.int32) * m_pad)[:, None]
        return jnp.take(arr.ravel(), offs + idx[None, :])
    return jnp.stack([jnp.take(arr[r], idx) for r in range(arr.shape[0])])


def prep_fused_packed(
    tri_i32,
    tri_f32,
    n_slots: int,
    n_ctx: int,
    config,
    *,
    origin=(0, 0),
    size: tuple | None = None,
    m_dummy: int | None = None,
):
    """Stage 2 of the fused prep: bin + pair-order gather on packed arrays.

    ``n_slots`` is the (static) real-slot count driving the tile/bin-cap
    heuristics; ``m_dummy`` an empty-bbox slot index for pair padding
    (default: the first padding slot, = n_slots, valid when the arrays
    came from :func:`pack_fused` un-gathered).
    """
    from f_renderer_tpu.pipeline.raster_pallas import bin_pairs

    full = (config.height, config.width)
    height, width = size if size is not None else full
    th, tw = config.tile
    tile_auto_threshold = getattr(config, "tile_auto_threshold", 300_000)
    if getattr(config, "tile_auto", True) and n_slots > tile_auto_threshold:
        # Huge scenes: taller tiles shrink the pair table and halve chunk
        # visits (r2: 16->32 measured 1.8x; r3 paired A/B: 64 beats 32,
        # 334 vs 349 ms on the 1M-tri stress scene).
        th = max(th, 64)
    elif (
        getattr(config, "tile_auto", True)
        and n_slots <= 2048
        and (th, tw) == (32, LANES)
    ):
        # Tiny scenes are GRID-bound, not pair-bound: at 12 triangles /
        # 1080p the kernel's 0.7 ms was 510 near-empty (32, 128) programs
        # of fixed per-program cost (r5 split). 128-row tiles cut the
        # program count 4x (measured: cube1080 1.36 -> 1.30 ms / 1599
        # Mpix/s / 101x single-core, cube512 0.89 -> 0.92 wash); the
        # extra whole-tile vector work per pair is irrelevant at these
        # pair counts. Applied only to the DEFAULT (32, 128) tile so an
        # explicitly-set tile always wins.
        th = 128
    assert tw == LANES, "fused path requires tile width 128"
    chunk = 128
    # pair-expansion cap: pair tables and the bin sort scale with
    # max(k, kc) · slots; k=6 covers 3×2-fine-tile spans (the common
    # clipped-tri case), and triangles past k go to COARSE×COARSE
    # coarse bins (kc cap) before the every-tile spill bucket
    # (raster_pallas.bin_pairs). Huge scenes shrink both caps to bound
    # the bin sort: at 1M tris / 4K / (32,128) tiles, 97.4% of nonempty
    # bboxes span ≤2 fine tiles (baselines/profile_prep.py), so k=2
    # halves the sorted keys vs k=4 while sending only ~2.6% of
    # triangles to the (bbox-gated) coarse bins.
    # Mid-size default k=4 (r5 paired ladder, textured1080 th32:
    # k6 3.32/3.31 | k4 3.18 | k3 4.37 | k2 4.41 ms — k4 trims the bin
    # sort + pair gather while 2x2-fine-tile spans stay exact; k<=3
    # dumps common spans into the gated coarse path and loses 30%.
    # phong1080/gouraud800 measured a wash (within-process drift > effect).
    k = getattr(config, "bin_k", None) or (4 if n_slots <= 300_000 else 2)
    h_pad = _cdiv(height, th) * th
    w_pad = _cdiv(width, tw) * tw
    if m_dummy is None:
        m_dummy = n_slots
    mode = getattr(config, "bin_mode", None) or os.environ.get(
        "FR_PAIRS", ""
    ) or "pairs"
    deferred_ok = bool(
        n_ctx
        and chunk == tw
        and getattr(config, "deferred_interp", None) is not False
    )
    if mode == "strip" and not (deferred_ok and th % 8 == 0):
        mode = "pairs"  # strip groups need the deferred carry layout
    if mode == "direct" and n_slots > tile_auto_threshold:
        # Defused (VERDICT r3 weak #5): direct binning's shared spill
        # bucket (multi-coarse-span triangles, ~3-5% of a 1M-tri scene) is
        # scanned per-triangle-gated by EVERY tile with no chunk-skip —
        # projected hundreds of ms at stress scale. The paper analysis in
        # BASELINE.md (r3) showed every gated-scan fix (super-coarse level,
        # 4-neighbor min-coarse segments) still loses to exact pair lists
        # at ~15 cyc/reject, so above the huge-scene threshold the knob
        # silently routes to "pairs" instead of pathologizing the frame.
        mode = "pairs"
    b_fine = 0
    if mode == "direct":
        from f_renderer_tpu.pipeline.raster_pallas import bin_direct

        ptri, off = bin_direct(
            tri_i32, (th, tw), (h_pad // th, w_pad // tw), origin=origin
        )
    elif mode == "strip":
        # Fragment-level strip decomposition (bin_pairs_strip docstring):
        # interleaved groups of th//8 pairs, S-pairs-per-trip kernel loop.
        from f_renderer_tpu.pipeline.raster_pallas import bin_pairs_strip

        ptri, off, b_fine = bin_pairs_strip(
            tri_i32, (th, tw), (h_pad // th, w_pad // tw), k, chunk,
            m_dummy=m_dummy, origin=origin, kc=k,
        )
    else:
        ptri, off = bin_pairs(
            tri_i32, (th, tw), (h_pad // th, w_pad // tw), k, chunk,
            m_dummy=m_dummy, origin=origin, kc=k,
        )
    form = getattr(config, "gather_form", None)
    # Pair-budget (RenderConfig.pair_budget_frac / pair_budget_segments):
    # the sorted table is [real pairs | dummy tail] and the gather costs
    # ~1 element/cycle × gathered lanes (baselines/profile_gather_c64.py:
    # exactly linear in lanes), so only the columns up to the segment
    # boundary covering total_pairs need gathering; the rest are filled
    # with zeros (inert: a zero i32 row has maxx=0, so the kernel's
    # `cx < maxx` cover test rejects every pixel). Each segment past the
    # first is gated by a lax.cond on total_pairs (the spill range end —
    # the last bin offset), so the per-frame cost is
    # ceil(occupancy·S)/S · full-gather, exact for ANY scene. The r4
    # head+tail form (pair_budget_frac) is kept as an explicit override
    # for paired A/Bs; auto mode uses S uniform segments, which beats a
    # fixed head both below it (typical occupancy 0.22 → 2/8 gathered)
    # and above it (the honest stress4k scene sits at 0.55 every frame —
    # a 0.5 head would cond-gather the whole remainder every frame).
    frac = getattr(config, "pair_budget_frac", None)
    n_table = ptri.shape[0]
    if mode == "direct":
        bounds = [n_table]
    elif frac is not None:
        cap = min(_cdiv(max(int(frac * n_table), 128), 128) * 128, n_table)
        bounds = [cap, n_table] if cap < n_table else [n_table]
    else:
        segs = getattr(config, "pair_budget_segments", None)
        if segs is None:
            segs = 8 if n_slots > tile_auto_threshold else 1
        seg = _cdiv(_cdiv(n_table, max(segs, 1)), 128) * 128
        bounds = list(range(seg, n_table, seg)) + [n_table]
    total_pairs = off[-1] if len(bounds) > 1 else None

    def gather(arr):
        if len(bounds) == 1:
            return _pair_gather(arr, ptri, form)
        pieces = [_pair_gather(arr, ptri[: bounds[0]], form)]
        lo = bounds[0]
        for hi in bounds[1:]:
            pieces.append(
                jax.lax.cond(
                    total_pairs > lo,
                    lambda lo=lo, hi=hi: _pair_gather(arr, ptri[lo:hi], form),
                    lambda lo=lo, hi=hi: jnp.zeros(
                        (arr.shape[0], hi - lo), arr.dtype
                    ),
                )
            )
            lo = hi
        return jnp.concatenate(pieces, axis=1)

    # Only the real field rows are gathered (i32: 14 of 16; f32: 9 base +
    # 3·C ctx of the 8-padded block — 33 of 40 at C=8); the sublane pad
    # rows are re-appended as zeros afterwards. XLA fuses the pad into the
    # gather's write loop, so the pad rows cost a write but not a gather
    # read (~16% of the stress4k pair-gather traffic). The kernel never
    # reads them — its chunk DMA copies whole 8-aligned row blocks.
    from f_renderer_tpu.pipeline.raster_pallas import _CTX0

    bi = gather(tri_i32[:NF_I_REAL])
    bi = jnp.pad(bi, ((0, NF_I - NF_I_REAL), (0, 0)))
    nf_f = tri_f32.shape[0]
    real_f = _CTX0 + 3 * n_ctx  # 9 base fields + 3·C ctx
    bf = gather(tri_f32[:real_f])
    if real_f < nf_f:
        bf = jnp.pad(bf, ((0, nf_f - real_f), (0, 0)))
    origin_arr = jnp.stack(
        [jnp.asarray(origin[0], jnp.int32), jnp.asarray(origin[1], jnp.int32)]
    )
    arrays = dict(cb=off, origin=origin_arr, tri_i32=bi, tri_f32=bf)
    statics = dict(
        th=th, tw=tw, chunk=chunk, binned=True, n_ctx=n_ctx,
        h_pad=h_pad, w_pad=w_pad, height=height, width=width,
        # Chunk-deferred varying interpolation (raster_pallas._make_kernel
        # docstring) needs the 128-lane in-chunk gather: chunk == tw.
        deferred=deferred_ok,
        # unroll 2 everywhere: with the r5 tree-merge default the unrolled
        # group front-ends are carry-independent, and paired A/Bs show
        # tree:2 beats seq:1 at EVERY scale measured (stress4k 340.5 →
        # 330.5, textured1080 3.53 → 3.23, phong1080 5.75 → 5.69 ms;
        # tree:4 never better — register pressure).
        unroll=int(getattr(config, "unroll_pairs", None) or 2),
        strip=mode == "strip",
        b_fine=b_fine,
    )
    return arrays, statics


def prep_fused(
    tri: TriangleBuffer,
    config,
    *,
    origin=(0, 0),
    size: tuple | None = None,
):
    """Geometry-side prep for the fused kernel: pack + bin + gather.

    Everything here depends only on the projected triangles (geometry +
    camera), not on shading uniforms — callers rendering a static scene
    with animated lighting can compute it once (scene.Scene.prepare) and
    replay frames with ``render_fused_prepared``.

    Returns ``(arrays, statics)``: ``arrays`` is a dict of device arrays
    (jit-traceable pytree), ``statics`` a dict of python ints/bools that
    parameterize the kernel build.
    """
    binned = getattr(config, "raster_binned", True)
    if binned:
        tri_i32, tri_f32 = pack_fused(tri, config)
        return prep_fused_packed(
            tri_i32, tri_f32, tri.num_slots, tri.num_channels, config,
            origin=origin, size=size,
        )
    full = (config.height, config.width)
    height, width = size if size is not None else full
    th, tw = config.tile
    tile_auto_threshold = getattr(config, "tile_auto_threshold", 300_000)
    if getattr(config, "tile_auto", True) and tri.num_slots > tile_auto_threshold:
        th = max(th, 32)
    assert tw == LANES, "fused path requires tile width 128"
    n_ctx = tri.num_channels
    chunk = 256
    tri_i32, tri_f32, cb, origin_arr, h_pad, w_pad = _prep(
        tri, width, height, (th, tw), chunk, origin, full, with_ctx=True
    )
    arrays = dict(cb=cb, origin=origin_arr, tri_i32=tri_i32, tri_f32=tri_f32)
    statics = dict(
        th=th, tw=tw, chunk=chunk, binned=False, n_ctx=n_ctx,
        h_pad=h_pad, w_pad=w_pad, height=height, width=width,
        deferred=False,
    )
    return arrays, statics


def render_fused_prepared(
    arrays,
    statics,
    pixel_shader,
    ps_uniform,
    config,
    *,
    interpret: bool | None = None,
):
    """Run the fused kernel from :func:`prep_fused` products.

    Shading inputs (textures, view_pos, the shader's light constants) are
    read fresh from ``pixel_shader``/``ps_uniform`` — a static scene with
    animated lighting re-runs only this.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kind = pixel_shader.fused_kind
    light_pos = getattr(pixel_shader, "light_pos", (1.2, 1.0, 2.0))
    light_color = getattr(pixel_shader, "light_color", (1.0, 1.0, 1.0))
    cb = arrays["cb"]
    origin_arr = arrays["origin"]
    tri_i32 = arrays["tri_i32"]
    tri_f32 = arrays["tri_f32"]
    th, tw, chunk = statics["th"], statics["tw"], statics["chunk"]
    binned, n_ctx = statics["binned"], statics["n_ctx"]
    h_pad, w_pad = statics["h_pad"], statics["w_pad"]
    height, width = statics["height"], statics["width"]
    if binned:
        cb_spec = pl.BlockSpec(
            cb.shape, lambda ty, tx: (0,), memory_space=pltpu.SMEM
        )
    else:
        cb_spec = pl.BlockSpec(
            (5, cb.shape[1]), lambda ty, tx: (0, 0), memory_space=pltpu.SMEM
        )

    stack = ps_uniform.get("textures") if hasattr(ps_uniform, "get") else None
    if stack is not None and kind in ("textured", "phong"):
        texpk = stack.packed
        dims = stack.dims.astype(jnp.int32)
        hmax = int(stack.data.shape[1])
        pages = stack.pages
        opaque = bool(getattr(stack, "opaque", False))
    else:
        # Dummy stack must honor the page-major 8-row-aligned layout
        # (texture.py:pack_rgba8): the default grp sampler mode loads one
        # aligned (8, 128) tile per row group, so even an hmax=1 dummy
        # needs hmax_padded(1) = 8 physical rows.
        from f_renderer_tpu.shaders.texture import hmax_padded

        texpk = jnp.zeros((hmax_padded(1), LANES), jnp.int32)
        dims = jnp.ones((1, 2), jnp.int32)
        hmax = 1
        pages = 1
        opaque = False
    t_count = dims.shape[0]

    view_pos = ps_uniform.get("view_pos") if hasattr(ps_uniform, "get") else None
    uni = jnp.zeros((8,), jnp.float32)
    if view_pos is not None:
        uni = uni.at[:3].set(jnp.asarray(view_pos, jnp.float32))

    bg = config.background
    bg_packed = int(bg[0]) | (int(bg[1]) << 8) | (int(bg[2]) << 16) | (
        int(bg[3]) << 24
    )
    if bg_packed >= 2**31:
        bg_packed -= 2**32

    epilogue = _make_epilogue(
        kind,
        t_count=t_count,
        hmax=hmax,
        pages=pages,
        bg_packed=bg_packed,
        light_pos=light_pos,
        light_color=light_color,
        opaque=opaque,
    )
    deferred = bool(statics.get("deferred", False))
    # Cross-program DMA prefetch relies on scratch/semaphore state persisting
    # across sequential grid programs — true on hardware, not guaranteed by
    # the interpreter, so interpret runs keep the self-start path.
    cross_prefetch = binned and not interpret
    kernel = _make_kernel(
        th=th, tw=tw, chunk=chunk, id_base=0, n_ctx=n_ctx, epilogue=epilogue,
        binned=binned, deferred=deferred, cross_prefetch=cross_prefetch,
        bg_empty=bg_packed, unroll=int(statics.get("unroll", 1)),
        strip=bool(statics.get("strip", False)),
        b_fine=int(statics.get("b_fine", 0)),
    )

    grid = (h_pad // th, w_pad // tw)
    nf_f = tri_f32.shape[0]
    # Fence the operands against XLA's cross-custom-call "optimization"
    # (same pathology as the voxel march, raycast_pallas.py: producers get
    # rebuilt through scoped-VMEM async slices and the composed program
    # slows by an order of magnitude).
    cb, origin_arr, tri_i32, tri_f32, uni, dims, texpk = (
        jax.lax.optimization_barrier(
            (cb, origin_arr, tri_i32, tri_f32, uni, dims, texpk)
        )
    )
    tile_spec = pl.BlockSpec((th, tw), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM)
    rgba, depth, winner = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            cb_spec,
            pl.BlockSpec((2,), lambda ty, tx: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8,), lambda ty, tx: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                dims.shape, lambda ty, tx: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                texpk.shape, lambda ty, tx: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
        ),
        scratch_shapes=(
            [
                pltpu.SMEM((2, NF_I, chunk), jnp.int32),
                pltpu.SMEM((2, NF_SMEM_F, chunk), jnp.float32),
                pltpu.VMEM((2, NF_I - 8, chunk), jnp.int32),
                pltpu.VMEM((2, nf_f, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if deferred
            else [
                pltpu.SMEM((2, NF_I, chunk), jnp.int32),
                pltpu.SMEM((2, nf_f, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if binned
            else [
                pltpu.SMEM((NF_I, chunk), jnp.int32),
                pltpu.SMEM((nf_f, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
        interpret=interpret,
    )(cb, origin_arr, tri_i32, tri_f32, uni, dims, texpk)

    frame = jax.lax.bitcast_convert_type(rgba[:height, :width], jnp.uint8)
    return frame, depth[:height, :width], winner[:height, :width]


def render_fused_pallas(
    tri: TriangleBuffer,
    pixel_shader,
    ps_uniform,
    config,
    *,
    interpret: bool | None = None,
    origin=(0, 0),
    size: tuple | None = None,
):
    """One-kernel render for ``fused_kind``-tagged pixel shaders.

    Returns (frame (H, W, 4) u8, depth (H, W) f32, winner (H, W) i32).
    ``origin``/``size`` render a sub-rect of the config-sized frame (the
    sharded row-slab case; origin may be traced). ``interpret`` defaults to
    pallas interpret mode off-TPU, so backend="pallas" works everywhere.
    """
    arrays, statics = prep_fused(tri, config, origin=origin, size=size)
    return render_fused_prepared(
        arrays, statics, pixel_shader, ps_uniform, config, interpret=interpret
    )
