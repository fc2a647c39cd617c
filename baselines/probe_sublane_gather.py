"""Mosaic legality probe: per-pixel 2D gather inside a Pallas TPU kernel.

The sampler's (row, page) loop pays whole-tile work per texel row because
per-lane dynamic ROW addressing was assumed unsupported (only the 128-lane
`take_along_axis` lane gather is known-good on v5e, CLAUDE.md). If Mosaic
also legalizes a SUBLANE gather (`take_along_axis(..., axis=0)`), the loop
can step over 8-row texel GROUPS with a per-pixel (sublane, lane) two-step
gather — ~8x fewer iterations.

Variants probed (each compiled separately so one failure doesn't mask the
rest):
  A  take_along_axis(src (8,128),  idx (8,128),  axis=0)
  B  take_along_axis(src (32,128), idx (32,128), axis=0)   cross-vreg rows
  C  full 2D gather: sublane-gather then lane-gather, vs numpy truth
  D  src (8,128) broadcast against idx (32,128) via 4 sub-blocks

Usage: python baselines/probe_sublane_gather.py   (real TPU)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(name, build):
    import jax

    try:
        out = build()
        out = np.asarray(out)
        print(f"{name}: OK  checksum={out.sum():.1f}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}")
        return None


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    src8 = rng.randint(0, 1000, (8, 128)).astype(np.int32)
    src32 = rng.randint(0, 1000, (32, 128)).astype(np.int32)
    idx8 = rng.randint(0, 8, (8, 128)).astype(np.int32)
    idx32_8 = rng.randint(0, 8, (32, 128)).astype(np.int32)
    idx32_32 = rng.randint(0, 32, (32, 128)).astype(np.int32)
    lane32 = rng.randint(0, 128, (32, 128)).astype(np.int32)

    def make(kernel, *arrs, out_shape):
        def go():
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
            )(*arrs)

        return go

    # A: (8,128) sublane gather
    def ka(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    outa = run_case("A sublane (8,128)", make(ka, src8, idx8, out_shape=(8, 128)))
    if outa is not None:
        truth = np.take_along_axis(src8, idx8, axis=0)
        print("A correct:", np.array_equal(outa, truth))

    # B: (32,128) sublane gather, cross-vreg row indices
    def kb(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    outb = run_case(
        "B sublane (32,128)", make(kb, src32, idx32_32, out_shape=(32, 128))
    )
    if outb is not None:
        truth = np.take_along_axis(src32, idx32_32, axis=0)
        print("B correct:", np.array_equal(outb, truth))

    # C: full 2D gather (row then lane), vs numpy truth
    def kc(s_ref, r_ref, l_ref, o_ref):
        rows = jnp.take_along_axis(s_ref[:], r_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(rows, l_ref[:], axis=1)

    outc = run_case(
        "C 2D gather (32,128)",
        make(kc, src32, idx32_32, lane32, out_shape=(32, 128)),
    )
    if outc is not None:
        truth = src32[idx32_32, lane32]
        print("C correct:", np.array_equal(outc, truth))

    # D: (8,128) source rows addressed by a (32,128) index — the sampler's
    # shape (pixel block taller than the texel group). Needs broadcast of
    # the 8 source rows across the 32-row index; express as 4 sub-gathers.
    def kd(s_ref, i_ref, o_ref):
        s = s_ref[:]
        for b in range(4):
            o_ref[b * 8 : (b + 1) * 8, :] = jnp.take_along_axis(
                s, i_ref[b * 8 : (b + 1) * 8, :], axis=0
            )

    outd = run_case(
        "D (8,128) src x (32,128) idx", make(kd, src8, idx32_8, out_shape=(32, 128))
    )
    if outd is not None:
        truth = np.take_along_axis(
            np.broadcast_to(src8[None], (4, 8, 128)).reshape(4, 8, 128),
            idx32_8.reshape(4, 8, 128),
            axis=1,
        ).reshape(32, 128)
        print("D correct:", np.array_equal(outd, truth))
    return 0


if __name__ == "__main__":
    sys.exit(main())
