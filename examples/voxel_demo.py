"""Sparse-voxel-octree raycaster — the voxel.rs analogue.

Reference: examples/src/bin/voxel.rs — 960×540 interactive raycast over a
random level-3 SVO (70% occupancy / 30% leaves, voxel.rs:492-516), camera
orbit, wgpu presentation, fps print. Here the octree is densified into a
flat grid (voxel/octree.py — equivalent to the recursive find_leaf descent),
rays march in a vectorized lax.while_loop, and frames go to a Display sink.

Usage:
  python examples/voxel_demo.py [--frames 24] [--size 960x540] [--level 3]
      [--out out/voxel] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", default="960x540")
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--out", default="out/voxel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ascii", action="store_true")
    ap.add_argument("--dda", action="store_true",
                    help="cell-exact traversal (~50x; skips the reference's "
                         "fixed-step thin-leaf quirk)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_renderer_tpu.display import AsciiDisplay, PngSequenceDisplay, render_loop
    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    rng = np.random.default_rng(args.seed)
    root = gen_randomly(args.level, rng)
    grid_color, grid_hit = densify(root, args.level)
    grid_color = jnp.asarray(grid_color)
    grid_hit = jnp.asarray(grid_hit)

    length = 2.0
    cfg = VoxelRenderConfig(
        width=w, height=h, level=args.level, length=length,
        traversal="dda" if args.dda else "fixed",
    )
    proj = np.asarray(set_perspective(np.pi * 0.25, w / h, 0.1, 100.0))
    model = np.asarray(set_identity())
    center = np.array([length / 2] * 3, np.float32)

    @jax.jit
    def frame_step(eye, inv_mvp):
        return render_voxel_frame(grid_color, grid_hit, eye, inv_mvp, cfg)

    def step(angle, event):
        # camera orbit around the cube center (voxel.rs:74-130 analogue)
        eye = center + np.array(
            [3.0 * np.cos(angle), 1.2, 3.0 * np.sin(angle)], np.float32
        )
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ model
        inv_mvp = np.linalg.inv(mvp).astype(np.float32)
        frame = frame_step(jnp.asarray(eye), jnp.asarray(inv_mvp))
        return frame, angle + 0.08

    display = AsciiDisplay() if args.ascii else PngSequenceDisplay(args.out)
    t0 = time.time()
    render_loop(step, 0.0, display, frames=args.frames)
    dt = (time.time() - t0) / max(args.frames, 1)
    print(
        f"avg frame {dt * 1e3:.1f}ms ({1 / dt:.1f} fps, "
        f"{w * h / dt / 1e6:.0f} Mrays/s)",
        file=sys.stderr,
    )
    if not args.ascii:
        print(f"frames written to {args.out}/", file=sys.stderr)


if __name__ == "__main__":
    main()
