"""Can the bin sort CARRY the field rows, replacing the pair gather?

The stress4k pair-order gather (``arr[:, ptri]``, 47 real rows x 2.3M pair
slots) measured 144.9 ms on TPU — ~1 element/cycle, and the rowtake/flat
reformulations are 7x/15x WORSE (baselines/profile_gather.py, r4). XLA's
gather is scalar-issue-bound; the only fast indexed-data paths on TPU are
DMA (contiguous) and the 128-lane in-kernel gather (page-local).

Alternative: skip ptri entirely — sort the packed key with ALL field rows
as extra `lax.sort` operands. If XLA lowers multi-operand sort as
vectorized compare-exchange networks, payload movement runs at VPU width
(~1024 elem/cycle), not 1/cycle. This probe measures, at the real
stress4k table size:

  gather47 : packed sort_key_val(key, iota) + 47-row arr[:, idx]  (current)
  sortP<N> : lax.sort((key, row0..rowN-1), num_keys=1)

Payload expansion (each slot's row duplicated to its k=2 key slots) is a
reshape/tile, not a gather — included in the sortP timings.

Usage: python baselines/profile_sortpayload.py [n_slots] [k]
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
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1_155_712
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = m * k
    n_rows = 47
    iters = 4
    ntiles = 1020

    key = jax.device_put(
        (jnp.arange(n, dtype=jnp.int32) * 40503) % ntiles
    )
    rows = jax.device_put(
        jnp.arange(n_rows * m, dtype=jnp.int32).reshape(n_rows, m)
    )

    id_bits = 21  # slots < 2^21

    def checksum(arr2d):
        return jnp.sum(arr2d[:, ::4096], dtype=jnp.int32)

    def v_gather(key, rows, salt):
        packed = (key + salt) * jnp.int32(1 << id_bits) + (
            jnp.arange(n, dtype=jnp.int32) % m
        )
        s = jnp.sort(packed)
        ptri = s & ((1 << id_bits) - 1)
        out = rows[:, ptri]
        return checksum(out)

    def make_sortp(p):
        def v_sortp(key, rows, salt):
            packed = (key + salt) * jnp.int32(1 << id_bits) + (
                jnp.arange(n, dtype=jnp.int32) % m
            )
            # slot i's row value appears at each of its k key slots:
            # key layout here is iota%m so expansion is a (k, m) tile.
            expanded = [
                jnp.tile(rows[r], (k,)) for r in range(p)
            ]
            out = jax.lax.sort(
                (packed, *expanded), num_keys=1, is_stable=False
            )
            return checksum(jnp.stack(out[1:])) + out[0][-1]

        return v_sortp

    cases = [("gather47", v_gather)]
    for p in (8, 16, 47):
        cases.append((f"sortP{p}", make_sortp(p)))

    for name, fn in cases:
        @functools.partial(jax.jit, static_argnums=0)
        def run_n(mm, key, rows, fn=fn):
            def body(acc, i):
                return acc + fn(key, rows, i), None

            acc, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(mm, dtype=jnp.int32)
            )
            return acc

        t0 = time.time()
        int(run_n(iters, key, rows))
        print(
            f"[{name}] compile+first {time.time()-t0:.1f}s", flush=True
        )
        dt = _scan_timer(lambda mm: int(run_n(mm, key, rows)), iters)
        print(
            f"n={n} rows={n_rows} {name:9s} {dt*1e3:8.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
