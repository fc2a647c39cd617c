"""Pair-gather as complex64: halve the element count of the 1-elem/cycle gather.

profile_gather.py (r4): the 47-row pair gather costs 81-145 ms at stress4k
scale, ~1 ELEMENT per cycle regardless of formulation, and
profile_sortpayload.py showed carrying rows through the bin sort is
superlinear (P16 already 32.7 ms). XLA's TPU gather is issue-bound per
element, not per byte — so packing two f32/i32 rows into one complex64 row
should halve the cost if c64 gathers lower natively (8 B/element).

Measures, on the real stress4k packed table + pair list:
  f32x47   : arr[:, ptri] on 47 f32 rows              (current cost)
  c64x24   : bitcast row pairs -> (24, m) c64, gather, bitcast back
  pfx60    : f32x47 on the first 60% of the table     (pair-budget model)

Usage: python baselines/profile_gather_c64.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baselines.profile_sort import _scan_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench.enable_compilation_cache()
    m = 1_155_712
    n = 2 * m
    n_rows = 47

    rows = jax.device_put(
        (jnp.arange(n_rows * m, dtype=jnp.float32) * 0.5).reshape(n_rows, m)
    )
    ptri = jax.device_put((jnp.arange(n, dtype=jnp.int32) * 40503) % m)
    iters = 4

    def checksum(arr2d):
        return jnp.sum(arr2d[:, ::4096].astype(jnp.float32))

    def v_f32(rows, ptri, salt):
        idx = (ptri + salt) % m
        return checksum(rows[:, idx])

    def v_c64(rows, ptri, salt):
        idx = (ptri + salt) % m
        pad = jnp.concatenate([rows, rows[:1]], axis=0)  # 48 rows
        re = pad[0::2]
        im = pad[1::2]
        c = jax.lax.complex(re, im)  # (24, m) c64
        g = c[:, idx]
        out = jnp.concatenate([jnp.real(g), jnp.imag(g)], axis=0)
        return checksum(out)

    def v_pfx(rows, ptri, salt):
        idx = (ptri[: int(n * 0.6)] + salt) % m
        return checksum(rows[:, idx])

    for name, fn in [("f32x47", v_f32), ("c64x24", v_c64), ("pfx60", v_pfx)]:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(mm, rows, ptri, fn=fn):
            def body(acc, i):
                return acc + fn(rows, ptri, i), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(mm, dtype=jnp.int32)
            )
            return acc

        t0 = time.time()
        float(run_n(iters, rows, ptri))
        print(f"[{name}] compile+first {time.time()-t0:.1f}s", flush=True)
        dt = _scan_timer(lambda mm: float(run_n(mm, rows, ptri)), iters)
        print(f"{name:8s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
