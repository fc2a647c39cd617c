"""Presentation layer — the TPU-native analogue of vulkan_base.rs/wgpu_base.rs.

The reference's L3 layer is an OS window plus a dumb blit of a CPU-computed
byte buffer (vulkan_base.rs:723 maps a staging buffer, the app memcpys the
framebuffer into it, the GPU copies it to the swapchain; wgpu_base.rs:140-176
is the same via ``copy_buffer_to_texture``). On a headless TPU host the
equivalent "present" is a device→host DMA of the rendered frame followed by a
sink write: PNG sequence, raw byte stream (pipeable to ffmpeg et al.), npy,
or an in-terminal preview.

``render_loop`` reproduces the per-frame structure of
``DisplayBase::render_loop`` (vulkan_base.rs:696-805): an event callback
mutates app state (camera), a render step produces the frame, present blits
it. JAX's async dispatch plays the role of the double-buffered staging
copy — frame N+1 is dispatched to the TPU before frame N's host copy
completes, so device compute and host IO overlap.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Callable, Optional

import numpy as np


class Display:
    """Present sink interface (WgpuRenderer / DisplayBase analogue)."""

    def present(self, frame: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NullDisplay(Display):
    """Swallow frames (benchmarking without IO)."""

    def present(self, frame: np.ndarray) -> None:
        pass


class PngSequenceDisplay(Display):
    """Write frame_NNNN.png per present (native libpng when available)."""

    def __init__(self, directory: str, prefix: str = "frame"):
        self.directory = directory
        self.prefix = prefix
        self.index = 0
        os.makedirs(directory, exist_ok=True)

    def present(self, frame: np.ndarray) -> None:
        path = os.path.join(self.directory, f"{self.prefix}_{self.index:04d}.png")
        save_frame(path, frame)
        self.index += 1


class RawStreamDisplay(Display):
    """Stream raw H*W*4 bytes per frame to a file object.

    The closest analogue of the reference's mapped staging buffer
    (phong.rs:386 ``image_slice.copy_from_slice``): a plain byte blit.
    Pipe to ffmpeg: ``-f rawvideo -pix_fmt rgba -s WxH -i -``.
    """

    def __init__(self, fileobj):
        self.fileobj = fileobj

    def present(self, frame: np.ndarray) -> None:
        self.fileobj.write(np.ascontiguousarray(frame, np.uint8).tobytes())
        self.fileobj.flush()


class VideoDisplay(Display):
    """Encode presented frames into a playable video file.

    When ``ffmpeg`` is on PATH, frames are piped as rawvideo into an H.264
    encoder (the RawStreamDisplay→ffmpeg wiring, done for you). Otherwise
    (this image ships no ffmpeg) frames are collected and written as an
    animated GIF/APNG via PIL on ``close`` — still a playable artifact of
    the render_loop event path (vulkan_base.rs:696-805's observable
    capability).
    """

    def __init__(self, path: str, fps: int = 30):
        import shutil

        self.path = path
        self.fps = fps
        self.proc = None
        self.frames = []
        self.size = None
        self._ffmpeg = shutil.which("ffmpeg") if path.endswith(".mp4") else None

    def _start_ffmpeg(self, w: int, h: int):
        import subprocess

        self.proc = subprocess.Popen(
            [
                self._ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgba",
                "-s", f"{w}x{h}", "-r", str(self.fps), "-i", "-",
                "-pix_fmt", "yuv420p", "-c:v", "libx264", self.path,
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def present(self, frame: np.ndarray) -> None:
        frame = np.ascontiguousarray(np.asarray(frame)[..., :4], np.uint8)
        if self._ffmpeg:
            if self.proc is None:
                self.size = frame.shape[:2]
                self._start_ffmpeg(frame.shape[1], frame.shape[0])
            self.proc.stdin.write(frame.tobytes())
        else:
            self.frames.append(frame)

    def close(self) -> None:
        if self.proc is not None:
            self.proc.stdin.close()
            self.proc.wait()
            self.proc = None
        elif self.frames:
            from PIL import Image

            path = self.path
            if path.endswith(".mp4"):  # no encoder available — save a GIF
                path = path[: path.rfind(".")] + ".gif"
            ims = [Image.fromarray(f[..., :3], "RGB") for f in self.frames]
            ims[0].save(
                path,
                save_all=True,
                append_images=ims[1:],
                duration=max(1000 // self.fps, 20),
                loop=0,
            )
            self.frames = []


class AsciiDisplay(Display):
    """Coarse in-terminal preview using 256-color half blocks."""

    def __init__(self, max_cols: int = 96, out=None):
        self.max_cols = max_cols
        self.out = out or sys.stdout

    def present(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        h, w = frame.shape[:2]
        step = max(1, w // self.max_cols)
        small = frame[:: step * 2, ::step, :3].astype(np.int32)
        lines = []
        for row in small:
            cells = [
                f"\x1b[48;2;{r};{g};{b}m " for r, g, b in row
            ]
            lines.append("".join(cells) + "\x1b[0m")
        self.out.write("\n".join(lines) + "\n")
        self.out.flush()


def save_frame(path: str, frame: np.ndarray) -> None:
    """Save one frame by extension: .png (native libpng → PIL), .npy, .raw."""
    frame = np.asarray(frame)
    if path.endswith(".npy"):
        np.save(path, frame)
        return
    if path.endswith(".raw"):
        with open(path, "wb") as f:
            f.write(np.ascontiguousarray(frame, np.uint8).tobytes())
        return
    from f_renderer_tpu import native

    if native.is_available():
        native.write_png(path, frame)
    else:
        from f_renderer_tpu.io.image import save_png

        save_png(path, frame)


@dataclasses.dataclass
class FrameEvent:
    """Per-frame event record passed to the app callback (winit analogue).

    ``keys``: characters received from the loop's input source since the
    previous frame — the live-input analogue of the reference forwarding
    non-redraw winit events into render_func (vulkan_base.rs:803).
    """

    index: int
    time: float
    dt: float
    keys: str = ""


class StdinKeys:
    """Non-blocking raw-mode keyboard input from a controlling terminal.

    The headless-host stand-in for the reference's winit mouse/scroll
    events (phong.rs:214-311): puts the tty in cbreak mode and drains
    pending characters each frame without blocking. On a non-tty stdin
    (pipes, CI) it degrades to an always-empty source.
    """

    def __init__(self):
        self._fd = None
        self._saved = None
        try:
            if sys.stdin.isatty():
                import termios
                import tty

                self._fd = sys.stdin.fileno()
                self._saved = termios.tcgetattr(self._fd)
                tty.setcbreak(self._fd)
        except Exception:
            self._fd = None

    def poll(self) -> str:
        if self._fd is None:
            return ""
        import select

        out = []
        while select.select([self._fd], [], [], 0)[0]:
            ch = os.read(self._fd, 1).decode(errors="ignore")
            if not ch:
                break
            out.append(ch)
        return "".join(out)

    def close(self) -> None:
        if self._fd is not None and self._saved is not None:
            import termios

            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)
            self._fd = None


def render_loop(
    step: Callable,
    state,
    display: Optional[Display] = None,
    *,
    frames: int = 0,
    print_fps: bool = True,
    max_in_flight: int = 2,
    input_source=None,
):
    """Drive a frame loop (DisplayBase::render_loop, vulkan_base.rs:696-805).

    ``step(state, event) -> (frame_device_array, new_state)`` — typically a
    jitted closure; ``frames=0`` runs until KeyboardInterrupt. Keeps up to
    ``max_in_flight`` dispatched frames outstanding so TPU compute overlaps
    the host-side present (the staging double-buffer analogue).

    ``input_source``: object with ``poll() -> str`` (e.g. :class:`StdinKeys`)
    whose pending characters are forwarded in ``event.keys`` — the live
    input path (examples/interactive_demo.py).

    Returns the final state.
    """
    display = display or NullDisplay()
    pending = []  # (device_frame,) awaiting present
    t_prev = time.time()
    i = 0
    try:
        while frames == 0 or i < frames:
            now = time.time()
            keys = input_source.poll() if input_source is not None else ""
            event = FrameEvent(index=i, time=now, dt=now - t_prev, keys=keys)
            t_prev = now
            frame, state = step(state, event)
            if frame is None:  # step signals quit
                break
            pending.append(frame)
            if len(pending) >= max_in_flight:
                display.present(np.asarray(pending.pop(0)))
            if print_fps:
                dt = max(event.dt, 1e-9)
                print(f"fps: {1.0 / dt:.1f}", file=sys.stderr)
            i += 1
    except KeyboardInterrupt:
        pass
    finally:
        if input_source is not None and hasattr(input_source, "close"):
            input_source.close()
    for frame in pending:
        display.present(np.asarray(frame))
    return state
