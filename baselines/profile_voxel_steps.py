"""Paired A/B: voxel march fixed-step formulation × ray-block size.

The parity-mode roofline (profile_voxel_roofline.py) put the measured
frame at 2-3× the 1-issue VPU bound and attributed the gap to lane-gather
LATENCY and cross-lane exit checks, with block divergence NOT the limiter
(worst-lane p95/p50 = 1.2). Two levers, both bit-exact:

  step mode "par"  — the 8 fixed steps per exit check become independent
                     gather chains (candidate t's precomputed by a short
                     add/min chain that provably reaches the same f32
                     values) resolved by one priority select, overlapping
                     the gather latency the serial form pays 8×.
  block 8→16→32    — amortizes while-loop scalar control + cross-lane
                     `any` over more rays, paying worst-lane divergence
                     (low) and more live vregs per step.

Sweeps both for parity mode plus block for DDA, process-paired, checksums
must be identical (the formulations are exact by construction).

Usage: PROFILE_FRAMES=10 python baselines/profile_voxel_steps.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel import raycast_pallas
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import (
        VoxelRenderConfig,
        render_voxel_frame,
    )

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))
    width, height, level, length = 960, 540, 3, 2.0

    rng = np.random.default_rng(0)
    root = gen_randomly(level, rng)
    grid_color, grid_hit = densify(root, level)
    grid_color = jnp.asarray(grid_color)
    grid_hit = jnp.asarray(grid_hit)
    proj = np.asarray(set_perspective(np.pi * 0.25, width / height, 0.1, 100.0))
    center = np.array([length / 2] * 3, np.float32)

    def args(i):
        ang = 0.3 + 0.08 * i
        eye = center + np.array(
            [3.0 * np.cos(ang), 1.2, 3.0 * np.sin(ang)], np.float32
        )
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ np.asarray(set_identity())
        return eye, np.linalg.inv(mvp).astype(np.float32)

    def pack_args(n):
        es, ms = zip(*(args(i) for i in range(n)))
        return jnp.asarray(np.stack(es)), jnp.asarray(np.stack(ms))

    packs = {frames: pack_args(frames), 2 * frames: pack_args(2 * frames)}

    cases = [
        ("fixed", "ser", 8, 8),  # the r4 shipped state
        ("fixed", "par", 8, 8),
        ("fixed", "par", 16, 8),
        ("fixed", "par", 32, 8),
        ("fixed", "ser", 32, 8),
        ("dda", "par", 8, 8),
        ("dda", "par", 32, 8),
    ]
    only = os.environ.get("PROFILE_CASES")
    if only:  # e.g. PROFILE_CASES=fixed:par:8,fixed:ser:8
        want = {tuple(c.split(":")) for c in only.split(",")}
        cases = [c for c in cases if (c[0], c[1], str(c[2])) in want]
    groups = os.environ.get("PROFILE_GROUPS")
    if groups:  # e.g. PROFILE_GROUPS=fixed:32:4,fixed:32:16 — par-mode
        cases = [
            ("fixed" if c.split(":")[0] == "fixed" else "dda",
             "par", int(c.split(":")[1]), int(c.split(":")[2]))
            for c in groups.split(",")
        ]

    checks = {}
    for traversal, mode, block, group in cases:
        raycast_pallas.STEP_MODE = mode
        raycast_pallas.GROUP = group
        cfg = VoxelRenderConfig(
            width=width, height=height, level=level, length=length,
            traversal=traversal, block=block,
        )

        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, eyes, inv_mvps, cfg=cfg):
            def body(acc, a):
                eye, inv_mvp = a
                frame = render_voxel_frame(
                    grid_color, grid_hit, eye, inv_mvp, cfg
                )
                return (
                    acc + jnp.sum(frame[::97, ::89, 0].astype(jnp.int32)),
                    None,
                )

            acc, _ = jax.lax.scan(body, jnp.int32(0), (eyes, inv_mvps))
            return acc

        t0 = time.time()
        chk = int(run_n(frames, *packs[frames]))
        c = time.time() - t0
        int(run_n(2 * frames, *packs[2 * frames]))
        t0 = time.time()
        int(run_n(frames, *packs[frames]))
        w1 = time.time() - t0
        t0 = time.time()
        int(run_n(2 * frames, *packs[2 * frames]))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        checks.setdefault(traversal, {})[(mode, block, group)] = chk
        print(
            f"[voxel540 {traversal} steps={mode} block={block} "
            f"group={group}] {per * 1e3:.2f} ms/frame checksum={chk} "
            f"(compile+first {c:.0f}s)",
            flush=True,
        )
    for traversal, m in checks.items():
        if len(set(m.values())) != 1:
            print(
                f"[{traversal}] CHECKSUM MISMATCH {m} — do not adopt",
                flush=True,
            )


if __name__ == "__main__":
    main()
