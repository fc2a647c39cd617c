"""Microbench the bin_pairs sort strategies on TPU (scan-chained timing).

Compares, at realistic pair counts:
- argsort(key) + 2 gathers (current bin_pairs)
- lax.sort_key_val(key, tri)
- single jnp.sort of packed (key << idbits | tri)

Usage: python baselines/profile_sort.py [n_keys ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_timer(run_n, iters: int) -> float:
    run_n(iters)
    run_n(2 * iters)
    t0 = time.time()
    run_n(iters)
    w1 = time.time() - t0
    t0 = time.time()
    run_n(2 * iters)
    w2 = time.time() - t0
    return max((w2 - w1) / iters, w2 / (4 * iters), 1e-7)


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench.enable_compilation_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [280_000, 2_500_000, 10_000_000]
    iters = 10
    nbuckets = 1100

    for n in sizes:
        key0 = (jnp.arange(n, dtype=jnp.int32) * 40503) % nbuckets
        tri0 = jnp.arange(n, dtype=jnp.int32) % 100_000

        def v_argsort(key, tri):
            perm = jnp.argsort(key, stable=True)
            return tri[perm][0] + key[perm][-1]

        def v_sortkv(key, tri):
            ks, ts = jax.lax.sort_key_val(key, tri, is_stable=True)
            return ts[0] + ks[-1]

        def v_packed(key, tri):
            packed = key * jnp.int32(1 << 20) + tri  # tri < 2^20 here
            s = jnp.sort(packed)
            return (s[0] & ((1 << 20) - 1)) + (s[-1] >> 20)

        for name, fn in [
            ("argsort", v_argsort),
            ("sort_kv", v_sortkv),
            ("packed", v_packed),
        ]:
            @functools.partial(jax.jit, static_argnums=0)
            def run_n(m, key, tri, fn=fn):
                def body(acc, i):
                    return acc + fn(key + i, tri), None

                acc, _ = jax.lax.scan(
                    body, jnp.int32(0), jnp.arange(m, dtype=jnp.int32)
                )
                return acc

            int(run_n(iters, key0, tri0))
            dt = _scan_timer(lambda m: int(run_n(m, key0, tri0)), iters)
            print(f"n={n:>9} {name:8s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
