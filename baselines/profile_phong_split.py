"""Isolate the phong1080 fused-kernel cost components on TPU.

Variants (same geometry, same shader, only the texture stack changes):
  tex512  — the bench config (3× 512² maps): full sampler row loops
  tex8    — 3× 8² maps: sampler loops ~1-2 iterations → difference vs
            tex512 ≈ the texel-loop share
  gouraud — vertex-lit (n_ctx=3, no sampler): raster+merge+pack floor

Usage: PROFILE_FRAMES=10 python baselines/profile_phong_split.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline import render_frame
    from f_renderer_tpu.scene import make_checker_texture, make_phong_scene
    from f_renderer_tpu.camera import Camera

    bench.enable_compilation_cache()
    frames = int(os.environ.get("PROFILE_FRAMES", "10"))

    def build(tex_n, shader="phong"):
        from f_renderer_tpu.scene import make_cube, make_uv_sphere

        sphere = make_uv_sphere(40, 80)
        cube = make_cube(0.8)
        cube["pos"] = cube["pos"] + np.array([1.6, 0.0, 0.0], np.float32)
        cube2 = make_cube(0.8)
        cube2["pos"] = cube2["pos"] + np.array([-1.6, 0.0, 0.0], np.float32)
        cam = Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        return make_phong_scene(
            1920, 1080, meshes=[sphere, cube, cube2],
            textures=[
                make_checker_texture(tex_n, max(tex_n // 16, 1)),
                make_checker_texture(tex_n, max(tex_n // 32, 1)),
                make_checker_texture(tex_n, max(tex_n // 21, 1)),
            ],
            camera=cam, backend="pallas", shader=shader,
        )

    for label, scene in [
        ("tex512", build(512)),
        ("tex8", build(8)),
        ("gouraud", build(512, shader="gouraud")),
    ]:
        cfg = scene.config
        # Stage inputs outside the timed lambdas (tunnel staging trap).
        draws_d = jax.device_put(tuple(scene.draws))
        vs_u_d = jax.device_put(scene.vs_uniform)
        ps_u_d = jax.device_put(scene.ps_uniform)

        def frame_of(angle, vs_u, ps_u, draws):
            model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
            vs_u = dict(vs_u, model=model)
            frame, _, _ = render_frame(
                list(draws), scene.vertex_shader, vs_u,
                scene.pixel_shader, ps_u, cfg,
            )
            return jnp.sum(frame[::97, ::89, 0].astype(jnp.int32))

        @functools.partial(jax.jit, static_argnums=0)
        def run_n(n, vs_u, ps_u, draws):
            def body(c, i):
                a = 0.1 + 0.05 * i.astype(jnp.float32)
                return c + frame_of(a, vs_u, ps_u, draws), None
            out, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(n, dtype=jnp.int32)
            )
            return out

        t0 = time.time()
        int(run_n(frames, vs_u_d, ps_u_d, draws_d))
        c = time.time() - t0
        int(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))  # warm 2N (avoid timing its compile)
        t0 = time.time()
        int(run_n(frames, vs_u_d, ps_u_d, draws_d))
        w1 = time.time() - t0
        t0 = time.time()
        int(run_n(2 * frames, vs_u_d, ps_u_d, draws_d))
        w2 = time.time() - t0
        per = max((w2 - w1) / frames, w2 / (4 * frames), 1e-7)
        print(f"[{label}] {per * 1e3:.2f} ms/frame (compile+first {c:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
