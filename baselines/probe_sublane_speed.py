"""Per-iteration cost of in-kernel sublane vs lane gathers on v5e.

probe_sublane_gather.py established LEGALITY (8-row-group sublane gather
via ``take_along_axis(axis=0)`` lowers on v5e, incl. the (8,128)-src x
(32,128)-idx sub-block form). This probe establishes COST: if Mosaic
lowers the sublane gather as a select chain instead of a real gather op,
the group-loop sampler redesign (BASELINE.md r4 "future work": texel
rows stepped in 8-row groups, per-pixel 2-step (sublane, lane) gathers)
is dead on arrival.

Kernels carry a (32,128) i32 plane through N=2000 data-dependent loop
iterations; variants:
  base   mix ops only (loop + arithmetic floor)
  lane   + 1 lane gather/iter        take_along_axis(rows32, idx, axis=1)
  subl   + 1 grouped sublane gather  4x take_along_axis((8,128), axis=0)
  iter_old  old sampler iteration core: 2 lane gathers + weight/unpack
  iter_new  group-loop iteration core: 2 subl + 4 lane gathers + masks

Protocol: one process, paired, _scan_timer two-point fit per variant
(CLAUDE.md: staged jit args, warm both scan lengths, int() readback).

Usage: python baselines/probe_sublane_speed.py   (real TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERS = 2000


def scan_timer(run_n, frames):
    run_n(frames)
    run_n(2 * frames)
    t0 = time.time()
    run_n(frames)
    w1 = time.time() - t0
    t0 = time.time()
    run_n(2 * frames)
    w2 = time.time() - t0
    return max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend())

    def grouped_subl(src8, idx):
        # (8,128) src x (32,128) idx -> (32,128), 4 sub-block gathers.
        return jnp.concatenate(
            [
                jnp.take_along_axis(src8, idx[b * 8 : (b + 1) * 8, :], axis=0)
                for b in range(4)
            ],
            axis=0,
        )

    def make_kernel(body):
        def kernel(x_ref, rows_ref, o_ref):
            rows = rows_ref[:]
            src8 = rows[:8, :]

            def it(i, x):
                return body(i, x, rows, src8)

            o_ref[:] = jax.lax.fori_loop(0, N_ITERS, it, x_ref[:])

        return kernel

    def b_base(i, x, rows, src8):
        return (x * 5 + i) & 0x7FFFFFFF

    def b_lane(i, x, rows, src8):
        g = jnp.take_along_axis(rows, x & 127, axis=1)
        return (x * 5 + g + i) & 0x7FFFFFFF

    def b_subl(i, x, rows, src8):
        g = grouped_subl(src8, x & 7)
        return (x * 5 + g + i) & 0x7FFFFFFF

    def b_iter_old(i, x, rows, src8):
        # old sampler (row,page) iteration core: 1 row bcast + 2 lane
        # gathers + weight mask + 3ch unpack-fma (abridged arithmetic).
        trow = jnp.broadcast_to(rows[0:1, :], x.shape)
        g1 = jnp.take_along_axis(trow, x & 127, axis=1)
        g2 = jnp.take_along_axis(trow, (x + 1) & 127, axis=1)
        accf = jnp.float32(0.0)
        for c in range(3):
            accf = accf + (
                ((g1 >> (8 * c)) & 0xFF).astype(jnp.float32)
                + ((g2 >> (8 * c)) & 0xFF).astype(jnp.float32)
            )
        return (x * 5 + g1 + g2 + accf.astype(jnp.int32) + i) & 0x7FFFFFFF

    def b_iter_new(i, x, rows, src8):
        # group-loop iteration core: 2 sublane + 4 lane gathers + in-group
        # masks + 4-tap 3ch unpack-fma (abridged).
        r1 = x & 7
        r2 = (x + 1) & 7
        rows1 = grouped_subl(src8, r1)
        rows2 = grouped_subl(src8, r2)
        g11 = jnp.take_along_axis(rows1, x & 127, axis=1)
        g12 = jnp.take_along_axis(rows1, (x + 1) & 127, axis=1)
        g21 = jnp.take_along_axis(rows2, x & 127, axis=1)
        g22 = jnp.take_along_axis(rows2, (x + 1) & 127, axis=1)
        in1 = ((x & 15) < 8).astype(jnp.int32)
        accf = jnp.float32(0.0)
        for g in (g11, g12, g21, g22):
            for c in range(3):
                accf = accf + ((g >> (8 * c)) & 0xFF).astype(jnp.float32)
        return (
            x * 5 + g11 + g12 + g21 + g22 + in1 + accf.astype(jnp.int32) + i
        ) & 0x7FFFFFFF

    rng = np.random.RandomState(0)
    x0 = jax.device_put(rng.randint(0, 2**30, (32, 128)).astype(np.int32))
    rows = jax.device_put(rng.randint(0, 2**30, (32, 128)).astype(np.int32))

    results = {}
    for name, body in [
        ("base", b_base),
        ("lane", b_lane),
        ("subl", b_subl),
        ("iter_old", b_iter_old),
        ("iter_new", b_iter_new),
    ]:
        call = pl.pallas_call(
            make_kernel(body),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        )

        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, x0=x0, rows=rows, call=call):
            def step(x, _):
                return call(x, rows), None

            x, _ = jax.lax.scan(step, x0, None, length=n)
            return jnp.sum(x)

        dt = scan_timer(lambda n, f=run_n: int(f(n)), 50)
        per_iter_ns = dt / N_ITERS * 1e9
        results[name] = per_iter_ns
        extra = ""
        if name != "base" and "base" in results:
            cyc = (per_iter_ns - results["base"]) * 0.94
            extra = f"  marginal ~{cyc:.0f} cyc @0.94GHz"
        print(f"{name:9s} {per_iter_ns:8.1f} ns/iter{extra}")
    if "iter_old" in results and "iter_new" in results:
        print(
            f"new/old iteration cost ratio: "
            f"{results['iter_new'] / results['iter_old']:.2f} "
            f"(break-even iteration reduction)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
