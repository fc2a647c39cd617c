"""Multi-mesh textured Phong viewer — the phong.rs analogue.

Reference: examples/src/bin/phong.rs — a 1920×1080 interactive viewer over a
3-mesh textured character (OBJ + TGA assets) with an orbiting camera and a
per-frame fps print. The assets are not distributed with the reference repo,
so by default this renders procedural meshes; pass ``--obj mesh.obj
--tex diffuse.tga`` (repeatable) to reproduce the original asset flow
(OBJ parse → per-face corners, TGA decode → BGRA texture,
phong.rs:166-171).

The window is replaced by a Display sink (PNG sequence by default); camera
orbit reproduces the reference's right-drag orbit math (phong.rs:287-298).

Usage:
  python examples/phong_demo.py [--frames 24] [--size 1920x1080]
      [--out out/phong] [--obj a.obj --tex a.tga ...] [--backend pallas|jnp]
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
    ap.add_argument("--out", default="out/phong")
    ap.add_argument("--obj", action="append", default=[])
    ap.add_argument("--tex", action="append", default=[])
    ap.add_argument("--backend", default="")
    ap.add_argument("--ascii", action="store_true", help="terminal preview")
    ap.add_argument(
        "--video",
        default="",
        help="encode the orbit to this .mp4 (ffmpeg) or .gif (PIL fallback)",
    )
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_renderer_tpu import camera as cam
    from f_renderer_tpu.display import (
        AsciiDisplay,
        PngSequenceDisplay,
        VideoDisplay,
        render_loop,
    )
    from f_renderer_tpu.pipeline import render_frame
    from f_renderer_tpu.scene import make_cube, make_phong_scene, make_uv_sphere

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "jnp"
    )

    meshes, textures = [], []
    if args.obj:
        from f_renderer_tpu.io.obj import load_obj

        for path in args.obj:
            meshes.append(load_obj(path, verbose=True).corners())
        for path in args.tex:
            if path.endswith(".tga"):
                from f_renderer_tpu import native

                with open(path, "rb") as f:
                    textures.append(native.decode_tga(f.read()))
            else:
                from f_renderer_tpu.io.image import load_texture

                textures.append(load_texture(path, verbose=True))
    else:
        sphere = make_uv_sphere(24, 48, radius=0.8)
        sphere["pos"] = sphere["pos"] + np.array([0, 1.2, 0], np.float32)
        cube = make_cube(0.9)
        cube2 = make_cube(0.5)
        cube2["pos"] = cube2["pos"] + np.array([1.1, 0.3, 0.4], np.float32)
        meshes = [sphere, cube, cube2]

    scene = make_phong_scene(
        w, h, meshes=meshes, textures=textures or None, backend=backend
    )

    @jax.jit
    def frame_step(view, eye, draws):
        vs_u = dict(scene.vs_uniform, view=view)
        ps_u = dict(scene.ps_uniform, view_pos=eye)
        frame, _, _ = render_frame(
            list(draws),
            scene.vertex_shader,
            vs_u,
            scene.pixel_shader,
            ps_u,
            scene.config,
        )
        return frame

    draws = tuple(scene.draws)
    camera = cam.Camera.create([0.0, 1.0, 3.5], [0.0, 0.6, 0.0], [0.0, 1.0, 0.0])

    def step(camera, event):
        # ~right-drag orbit of 6 px/frame (phong.rs:287-298)
        camera = cam.orbit(camera, 6.0, 1.5)
        frame = frame_step(camera.look_at(), camera.eye, draws)
        return frame, camera

    if args.video:
        os.makedirs(os.path.dirname(args.video) or ".", exist_ok=True)
        display = VideoDisplay(args.video, fps=24)
    elif args.ascii:
        display = AsciiDisplay()
    else:
        display = PngSequenceDisplay(args.out)
    t0 = time.time()
    with display:
        render_loop(step, camera, display, frames=args.frames)
    dt = (time.time() - t0) / max(args.frames, 1)
    print(
        f"avg frame {dt * 1e3:.1f}ms ({1 / dt:.1f} fps, "
        f"{w * h / dt / 1e6:.0f} Mpix/s) backend={backend}",
        file=sys.stderr,
    )
    if args.video:
        print(f"video written near {args.video}", file=sys.stderr)
    elif not args.ascii:
        print(f"frames written to {args.out}/", file=sys.stderr)


if __name__ == "__main__":
    main()
