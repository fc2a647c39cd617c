"""Isolate the slow op in shade_from_planes on the real TPU.

Variants (all over 1920x1080 px, T=3 128x128 textures):
  s1: vmap(vmap(TextureStack.sample))          — the pipeline's path
  s2: same but dims hardcoded (no dims gather)
  s3: batched flat-take sample (no vmap at all) — the known-24ms form
  s4: full shade_from_planes with the phong pixel shader
  s5: vmapped phong shader with texture sample REMOVED (lighting+unflatten)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, T, TH, TW = 1080, 1920, 3, 128, 128


def timeit(fn, *args, n=10):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return c, (time.time() - t0) / n


rng = np.random.default_rng(0)
texd = jnp.asarray(rng.random((T, TH, TW, 4), np.float32))
uv = jnp.asarray(rng.random((H, W, 2), np.float32))
ps = jnp.asarray(rng.integers(0, T, (H, W)), jnp.int32)

from f_renderer_tpu.shaders.texture import TextureStack

stack = TextureStack(data=texd, dims=jnp.asarray([[TH, TW]] * T, jnp.int32))


@jax.jit
def s1(uv, ps):
    return jax.vmap(jax.vmap(lambda u, i: stack.sample(i, u)))(uv, ps)


@jax.jit
def s2(uv, ps):
    flat = texd.reshape(-1, 4)

    def one(u, i):
        x = u[0] * TW
        y = u[1] * TH
        a = x - jnp.trunc(x)
        b = y - jnp.trunc(y)
        x1 = jnp.clip(jnp.trunc(x), 0, TW - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.trunc(y), 0, TW - 1).astype(jnp.int32)
        x2 = jnp.clip(x1 + 1, 0, TW - 1)
        y2 = jnp.clip(y1 + 1, 0, TW - 1)
        base = i * (TH * TW)

        def tap(yy, xx):
            return jnp.take(flat, base + yy * TW + xx, axis=0)

        return (
            tap(y1, x1) * (1 - a) * (1 - b)
            + tap(y2, x1) * (1 - a) * b
            + tap(y1, x2) * a * (1 - b)
            + tap(y2, x2) * a * b
        )

    return jax.vmap(jax.vmap(one))(uv, ps)


@jax.jit
def s3(uv, ps):
    x = uv[..., 0] * TW
    y = uv[..., 1] * TH
    a = (x - jnp.trunc(x))[..., None]
    b = (y - jnp.trunc(y))[..., None]
    x1 = jnp.clip(jnp.trunc(x), 0, TW - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.trunc(y), 0, TW - 1).astype(jnp.int32)
    x2 = jnp.clip(x1 + 1, 0, TW - 1)
    y2 = jnp.clip(y1 + 1, 0, TW - 1)
    flat = texd.reshape(-1, 4)
    base = ps * (TH * TW)

    def tap(yy, xx):
        return jnp.take(flat, base + yy * TW + xx, axis=0)

    return (
        tap(y1, x1) * (1 - a) * (1 - b)
        + tap(y2, x1) * (1 - a) * b
        + tap(y1, x2) * a * (1 - b)
        + tap(y2, x2) * a * b
    )


from f_renderer_tpu.pipeline.shade import shade_from_planes
from f_renderer_tpu.shaders.api import make_context_codec
from f_renderer_tpu.shaders.builtin import make_phong_shaders, _phong_lighting

vs, pxs = make_phong_shaders()
ctx = jnp.asarray(rng.random((H, W, 8), np.float32))
winner = jnp.zeros((H, W), jnp.int32)
vs_u = {
    "model": jnp.eye(4), "view": jnp.eye(4), "proj": jnp.eye(4),
}
example = {
    "pos": jnp.zeros(3), "uv": jnp.zeros(2), "normal": jnp.zeros(3),
}
codec = make_context_codec(vs, vs_u, example)
ps_u = {"textures": stack, "view_pos": jnp.asarray([0.0, 1.0, 3.0])}


@jax.jit
def s4(ctx, ps, winner):
    return shade_from_planes(ctx, ps, winner, pxs, ps_u, codec)


@jax.jit
def s5(ctx, ps):
    def one(flat, idx):
        c = codec.unflatten(flat)
        light = _phong_lighting(
            c["normal"], c["pos"], ps_u["view_pos"], (1.2, 1.0, 2.0), (1, 1, 1)
        )
        return jnp.concatenate([light, jnp.ones(1)])

    return jax.vmap(jax.vmap(one))(ctx, ps)


def main():
    for name, fn, args in [
        ("s1 vmap-sample", s1, (uv, ps)),
        ("s2 vmap-static-dims", s2, (uv, ps)),
        ("s3 batched-flat", s3, (uv, ps)),
        ("s4 shade_from_planes", s4, (ctx, ps, winner)),
        ("s5 vmap-light-only", s5, (ctx, ps)),
    ]:
        try:
            c, t = timeit(fn, *args)
            print(f"{name}: steady={t * 1e3:.2f}ms compile={c:.0f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
