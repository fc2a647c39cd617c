"""Presentation smoke test — the test_wgpu.rs analogue.

Reference: examples/src/bin/test_wgpu.rs — pushes 1024×1024 black pixels into
a BufferVec once and presents it every frame. Here: build one host frame,
present it through each Display sink once, verify the bytes survive.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f_renderer_tpu.display import (
    NullDisplay,
    PngSequenceDisplay,
    RawStreamDisplay,
    render_loop,
)


def main():
    frame = np.zeros((1024, 1024, 4), np.uint8)
    frame[..., 3] = 255  # opaque black (Rgba::new, wgpu_base.rs:23-30)

    def step(state, event):
        return frame, state

    render_loop(step, None, NullDisplay(), frames=3, print_fps=True)

    with tempfile.TemporaryDirectory() as d:
        png = PngSequenceDisplay(d)
        png.present(frame)
        import f_renderer_tpu.native as native

        back = native.read_png(os.path.join(d, "frame_0000.png"))
        assert (back == frame).all()

        raw_path = os.path.join(d, "stream.raw")
        with open(raw_path, "wb") as f:
            RawStreamDisplay(f).present(frame)
        assert os.path.getsize(raw_path) == frame.nbytes
    print("display smoke OK", file=sys.stderr)


if __name__ == "__main__":
    main()
