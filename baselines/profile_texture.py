"""Texture-sampling strategy shootout on the real TPU.

Variants over 1920x1080 pixels, (3, 128, 128, 4) f32 texture stack:
  v1: per-pixel vmapped TextureStack.sample (current; known slow)
  v2: XLA flat-index jnp.take of (N, 4) rows, 4 taps
  v3: pallas kernel — in-VMEM texture, one-hot row matmul (MXU) + weighted
      lane reduce (exact bilinear)
  v4: pallas kernel — jnp.take_along_axis lane gather (if Mosaic supports)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1080, 1920
TH, TW, T = 128, 128, 3


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
tex = jnp.asarray(rng.random((T, TH, TW, 4), np.float32))
uv = jnp.asarray(rng.random((H, W, 2), np.float32))
ps = jnp.asarray(rng.integers(0, T, (H, W)), jnp.int32)


def taps(uv):
    x = uv[..., 0] * TW
    y = uv[..., 1] * TH
    a = x - jnp.trunc(x)
    b = y - jnp.trunc(y)
    x1 = jnp.clip(jnp.trunc(x), 0, TW - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.trunc(y), 0, TW - 1).astype(jnp.int32)
    x2 = jnp.clip(x1 + 1, 0, TW - 1)
    y2 = jnp.clip(y1 + 1, 0, TW - 1)
    return x1, y1, x2, y2, a, b


# ---- v1: current vmapped sample ----
from f_renderer_tpu.shaders.texture import TextureStack

stack = TextureStack(data=tex, dims=jnp.asarray([[TH, TW]] * T, jnp.int32))


@jax.jit
def v1(uv, ps):
    return jax.vmap(jax.vmap(stack.sample))(uv, ps)


# ---- v2: flat take of (N, 4) rows ----
@jax.jit
def v2(uv, ps):
    x1, y1, x2, y2, a, b = taps(uv)
    flat = tex.reshape(-1, 4)
    base = ps * (TH * TW)

    def tap(yy, xx):
        return jnp.take(flat, base + yy * TW + xx, axis=0)

    a = a[..., None]
    b = b[..., None]
    return (
        tap(y1, x1) * (1 - a) * (1 - b)
        + tap(y2, x1) * (1 - a) * b
        + tap(y1, x2) * a * (1 - b)
        + tap(y2, x2) * a * b
    )


# ---- v3: pallas one-hot matmul sampler ----
# texture reshaped (T*TH, TW*4); pixel block P: wy (P, T*TH) @ tex → (P, TW*4)
# then weighted reduce over TW with wx.
PBLK = 512


def _v3_kernel(uv_ref, ps_ref, tex_ref, out_ref):
    uvb = uv_ref[...]  # (PBLK, 2)
    psb = ps_ref[...]  # (PBLK, 1)
    x = uvb[:, 0] * TW
    y = uvb[:, 1] * TH
    a = x - jnp.trunc(x)
    b = y - jnp.trunc(y)
    x1 = jnp.clip(jnp.trunc(x), 0, TW - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.trunc(y), 0, TW - 1).astype(jnp.int32)
    x2 = jnp.clip(x1 + 1, 0, TW - 1)
    y2 = jnp.clip(y1 + 1, 0, TW - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (PBLK, T * TH), 1)
    ybase = psb[:, 0] * TH
    wy = jnp.where(rows == (ybase + y1)[:, None], (1.0 - b)[:, None], 0.0)
    wy = wy + jnp.where(rows == (ybase + y2)[:, None], b[:, None], 0.0)
    rowdata = jnp.dot(wy, tex_ref[...], preferred_element_type=jnp.float32)
    rd = rowdata.reshape(PBLK, TW, 4)
    cols = jax.lax.broadcasted_iota(jnp.int32, (PBLK, TW), 1)
    wx = jnp.where(cols == x1[:, None], (1.0 - a)[:, None], 0.0)
    wx = wx + jnp.where(cols == x2[:, None], a[:, None], 0.0)
    out_ref[...] = jnp.sum(rd * wx[:, :, None], axis=1)


@jax.jit
def v3(uv, ps):
    p = H * W
    uvf = uv.reshape(p, 2)
    psf = ps.reshape(p, 1)
    texm = tex.reshape(T * TH, TW * 4)
    out = pl.pallas_call(
        _v3_kernel,
        grid=(p // PBLK,),
        in_specs=[
            pl.BlockSpec((PBLK, 2), lambda i: (i, 0)),
            pl.BlockSpec((PBLK, 1), lambda i: (i, 0)),
            pl.BlockSpec((T * TH, TW * 4), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((PBLK, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
    )(uvf, psf, texm)
    return out.reshape(H, W, 4)


# ---- v4: pallas lane-gather (support probe) ----
def _v4_kernel(idx_ref, tab_ref, out_ref):
    idx = idx_ref[...]  # (8, 128) i32 in [0, 128)
    tab = tab_ref[...]  # (8, 128) f32
    out_ref[...] = jnp.take_along_axis(tab, idx, axis=1)


def v4_probe():
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    tab = jnp.asarray(rng.random((8, 128), np.float32))
    out = pl.pallas_call(
        _v4_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, tab)
    ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)
    return True


def main():
    for name, fn in [("v1 vmap-sample", v1), ("v2 flat-take", v2), ("v3 pallas-onehot-mxu", v3)]:
        try:
            c, t = timeit(fn, uv, ps)
            r = np.asarray(fn(uv, ps))
            ok = np.allclose(r, np.asarray(v2(uv, ps)), atol=1e-5)
            print(f"{name}: compile={c:.1f}s steady={t * 1e3:.2f}ms match_v2={ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    try:
        v4_probe()
        print("v4 lane-gather: SUPPORTED", flush=True)
    except Exception as e:
        print(f"v4 lane-gather: unsupported ({type(e).__name__}: {str(e)[:150]})", flush=True)


if __name__ == "__main__":
    main()
