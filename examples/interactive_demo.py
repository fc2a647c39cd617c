"""Live interactive viewer: keyboard-driven camera over the phong scene.

The reference forwards winit window/mouse events into the frame callback
(vulkan_base.rs:803) and the phong app turns them into orbit / pan / zoom
(phong.rs:214-311). A headless TPU host has no window, so the live-input
path here is a raw-mode terminal (display.StdinKeys) feeding
FrameEvent.keys — plus real pointer input via xterm SGR-1006 mouse
reports (FrameEvent.mouse) — with the frame shown in-terminal
(AsciiDisplay): a real event → camera → render loop, not an offline
orbit.

Controls: a/d orbit left/right · w/s orbit up/down · h/j/k/l pan ·
q/e zoom in/out · x quit · right-drag orbit · middle-drag pan ·
wheel zoom (the phong.rs:214-311 mouse mapping).

Usage:
  python examples/interactive_demo.py [--size 480x270] [--frames 0]
      [--backend pallas|jnp] [--keys "adwsqe"]   # --keys: scripted input
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ScriptedKeys:
    """Replays a fixed key string one char per frame (CI / headless test)."""

    def __init__(self, keys: str):
        self._keys = list(keys)

    def poll(self) -> str:
        return self._keys.pop(0) if self._keys else "x"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="480x270")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--backend", default="")
    ap.add_argument("--keys", default="", help="scripted key sequence")
    ap.add_argument("--out", default="", help="also save last frame as PNG")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax
    import numpy as np

    from f_renderer_tpu import camera as cam
    from f_renderer_tpu.display import AsciiDisplay, StdinKeys, render_loop
    from f_renderer_tpu.pipeline import render_frame
    from f_renderer_tpu.scene import make_cube, make_phong_scene, make_uv_sphere

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "jnp"
    )
    sphere = make_uv_sphere(24, 48)
    cube = make_cube(0.8)
    cube["pos"] = cube["pos"] + np.array([1.6, 0.0, 0.0], np.float32)
    scene = make_phong_scene(
        w, h, meshes=[sphere, cube], backend=backend, clip_cap=128
    )

    @jax.jit
    def render(view):
        vs_u = dict(scene.vs_uniform, view=view)
        frame, _, _ = render_frame(
            scene.draws, scene.vertex_shader, vs_u,
            scene.pixel_shader, scene.ps_uniform, scene.config,
        )
        return frame

    # Mouse-delta equivalents per keypress (phong.rs orbit ratio 0.005/px:
    # one keypress ≈ a 40 px drag).
    DRAG = 40.0

    def step(camera, event):
        for ch in event.keys:
            if ch == "x":
                return None, camera
            elif ch == "a":
                camera = cam.orbit(camera, -DRAG, 0.0)
            elif ch == "d":
                camera = cam.orbit(camera, DRAG, 0.0)
            elif ch == "w":
                camera = cam.orbit(camera, 0.0, -DRAG)
            elif ch == "s":
                camera = cam.orbit(camera, 0.0, DRAG)
            elif ch == "h":
                camera = cam.pan(camera, -DRAG, 0.0)
            elif ch == "l":
                camera = cam.pan(camera, DRAG, 0.0)
            elif ch == "k":
                camera = cam.pan(camera, 0.0, -DRAG)
            elif ch == "j":
                camera = cam.pan(camera, 0.0, DRAG)
            elif ch == "q":
                camera = cam.zoom(camera, 1.0)
            elif ch == "e":
                camera = cam.zoom(camera, -1.0)
        # Pointer path — the same mapping as the reference's winit handler
        # (phong.rs:214-311): right-drag orbits, middle-drag pans, wheel
        # zooms. Deltas arrive from the terminal's SGR-1006 reports.
        buttons = getattr(step, "_buttons", set())
        for ev in event.mouse:
            if ev.kind == "press":
                buttons.add(ev.button)
            elif ev.kind == "release":
                buttons.discard(ev.button)
            elif ev.kind == "move":
                # Terminal cells are ~8-16 px; scale cell deltas toward
                # the reference's per-pixel ratios (phong.rs 0.005/px).
                if 2 in buttons:
                    camera = cam.orbit(camera, ev.dx * 8.0, ev.dy * 8.0)
                elif 1 in buttons:
                    camera = cam.pan(camera, ev.dx * 8.0, ev.dy * 8.0)
            elif ev.kind == "wheel":
                camera = cam.zoom(camera, ev.wheel)
        step._buttons = buttons
        return render(camera.look_at()), camera

    camera = cam.Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    source = ScriptedKeys(args.keys) if args.keys else StdinKeys(mouse=True)
    print("controls: a/d w/s orbit · h/j/k/l pan · q/e zoom · x quit · "
          "right-drag orbit · middle-drag pan · wheel zoom",
          file=sys.stderr)
    camera = render_loop(
        step,
        camera,
        AsciiDisplay(),
        frames=args.frames,
        input_source=source,
    )
    if args.out:
        from f_renderer_tpu.io import save_png

        frame = np.asarray(render(camera.look_at()))
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_png(args.out, frame)
        print(f"saved {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
