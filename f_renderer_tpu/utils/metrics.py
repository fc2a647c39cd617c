"""Observability: per-stage counters and timing (SURVEY.md §5).

The reference's only instrumentation is a per-frame fps println
(phong.rs:383-384, voxel.rs:171-172). Here: structured per-frame counters
(triangles in/clipped/drawn, pixels covered — device-computed, cheap) plus a
host-side stage timer that doubles as an fps/Mpix meter. For deep kernel
profiling use ``jax.profiler.trace`` around a frame and inspect in
TensorBoard/XProf; StageTimer covers the everyday case.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameStats:
    """Device-side per-frame counters (all scalar i32). Jit-friendly."""

    triangles_in: jnp.ndarray
    triangles_clipped: jnp.ndarray
    triangles_emitted: jnp.ndarray
    pixels_covered: jnp.ndarray

    @staticmethod
    def gather(tri, winner, num_clipped, faces_in) -> "FrameStats":
        return FrameStats(
            triangles_in=jnp.asarray(faces_in, jnp.int32),
            triangles_clipped=jnp.asarray(num_clipped, jnp.int32),
            triangles_emitted=jnp.sum(tri.valid).astype(jnp.int32),
            pixels_covered=jnp.sum(winner >= 0).astype(jnp.int32),
        )

    def as_dict(self) -> dict:
        return {
            "triangles_in": int(self.triangles_in),
            "triangles_clipped": int(self.triangles_clipped),
            "triangles_emitted": int(self.triangles_emitted),
            "pixels_covered": int(self.pixels_covered),
        }


class StageTimer:
    """Wall-clock stage timer + fps/Mpix meter (host side).

    Usage::

        timer = StageTimer()
        with timer.stage("frame"):
            frame = step(...)
            jax.block_until_ready(frame)
        print(timer.report(pixels=W * H))
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def stage(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                timer.totals[name] = timer.totals.get(name, 0.0) + dt
                timer.counts[name] = timer.counts.get(name, 0) + 1

        return _Ctx()

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts.get(name, 0), 1)

    def report(self, pixels: Optional[int] = None) -> str:
        parts = []
        for name in self.totals:
            m = self.mean(name)
            s = f"{name}: {m * 1e3:.2f}ms"
            if pixels:
                s += f" ({pixels / m / 1e6:.1f} Mpix/s)"
            parts.append(s)
        return "; ".join(parts)


def xprof_trace(log_dir):
    """Deep-profiling scope: a ``jax.profiler.trace`` context manager that
    captures device (TPU) and host timelines for TensorBoard/XProf, or a
    no-op when ``log_dir`` is falsy — so call sites can be wired
    unconditionally (bench.py honors ``BENCH_TRACE_DIR``). The everyday
    fps/Mpix case stays on :class:`StageTimer`; this is the §5 "tracing"
    analogue of the reference's lone fps println (phong.rs:383-384)."""
    import contextlib

    if not log_dir:
        return contextlib.nullcontext()
    import jax.profiler

    return jax.profiler.trace(log_dir)
