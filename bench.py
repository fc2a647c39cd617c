"""Benchmark harness — run on the real TPU chip (plain `python bench.py`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: shaded Mpixels/sec on the multi-mesh Phong 1080p scene
(BASELINE.json config #4 — the phong.rs workload shape). ``vs_baseline``
compares against the single-core CPU reference implementation measured by
``baselines/measure_cpu.py`` into ``baselines/cpu_baseline.json`` (the
reference repo publishes no numbers — BASELINE.md).

Env knobs: BENCH_CONFIG (phong1080 | cube512 | cube1080 | gouraud800 |
textured1080 | stress4k | voxel540 | voxel540dda | all), BENCH_FRAMES
(default 10), BENCH_BACKEND (pallas | jnp), BENCH_BUDGET_S (all-mode wall
budget, default 1500 — configs that no longer fit are skipped so the
artifact still lands with rc=0).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def enable_compilation_cache():
    """Persistent XLA compilation cache (first full-pipeline compile over the
    tunnel is minutes; cached reloads are seconds — measured in BASELINE.md)."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)



def build_scene(name: str, backend: str):
    import jax.numpy as jnp

    from f_renderer_tpu.scene import (
        make_checker_texture,
        make_cube,
        make_instanced_soup,
        make_phong_scene,
        make_uv_sphere,
    )

    if name == "cube512":
        # clip_cap=16 > the cube's 12 faces, so the cap can NEVER drop
        # a face on this scene (this close-up camera does clip up to 10
        # faces at the bench angles — measured r5 — all within cap).
        return make_phong_scene(
            512, 512, meshes=[make_cube()], clip_cap=16, backend=backend
        )
    if name == "cube1080":
        from f_renderer_tpu.camera import Camera

        # BASELINE config #1's workload shape ("flat-shaded spinning cube
        # with z-buffer") at the 1080p target resolution of the ≥1 Gpix/s
        # shaded-throughput bar — the low-triangle-density point of the
        # throughput curve (r4 probe: flat 1152 / per-pixel phong 1026
        # Mpix/s; density, not shading, is what moves the number).
        cam = Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # clip_cap=16 > the cube's 12 faces: the cap can NEVER drop a
        # face even if every face clipped (this camera clips zero at
        # every bench angle — measured over 20 angles r5).
        return make_phong_scene(
            1920, 1080, meshes=[make_cube()], camera=cam, clip_cap=16,
            backend=backend, shader="flat",
        )
    if name == "gouraud800":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(36, 72)  # ~5.2k tris
        cam = Camera.create([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # clip_cap=64: zero faces clip at every bench angle (measured
        # over 20 angles, r5) — 64 keeps margin for numerically marginal
        # poses while shedding the default 256-slot clip machinery.
        return make_phong_scene(
            800, 600, meshes=[sphere], camera=cam, clip_cap=64,
            backend=backend, shader="gouraud",
        )
    if name == "textured1080":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(48, 96)
        cam = Camera.create([0.0, 0.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # clip_cap=64: zero faces clip at every bench angle (see gouraud800).
        return make_phong_scene(
            1920, 1080, meshes=[sphere], camera=cam, clip_cap=64,
            backend=backend, shader="textured",
        )
    if name == "phong1080":
        from f_renderer_tpu.camera import Camera

        sphere = make_uv_sphere(40, 80)
        cube = make_cube(0.8)
        cube["pos"] = cube["pos"] + np.array([1.6, 0.0, 0.0], np.float32)
        cube2 = make_cube(0.8)
        cube2["pos"] = cube2["pos"] + np.array([-1.6, 0.0, 0.0], np.float32)
        cam = Camera.create([0.0, 0.5, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # Three distinct 512² diffuse maps — the reference's phong.rs uses
        # three character TGA textures at realistic sizes (phong.rs:166-171).
        # clip_cap=64: zero faces clip at every bench angle (see gouraud800).
        return make_phong_scene(
            1920,
            1080,
            clip_cap=64,
            meshes=[sphere, cube, cube2],
            textures=[
                make_checker_texture(512, 32),
                make_checker_texture(512, 16),
                make_checker_texture(512, 24),
            ],
            camera=cam,
            backend=backend,
        )
    if name == "stress4k":
        from f_renderer_tpu.camera import Camera

        # Frustum-interior, y-rotation-invariant soup (r4 scene fix): the
        # r1-r3 distribution (x,y ∈ ±8, z ∈ [2,30]) pushed 248k-903k faces
        # per frame through the frustum planes — clip_cap=8192 silently
        # dropped up to 97% of them, so the TPU frame rendered a different
        # image than the full-clipping CPU baseline. A ±3.2 cube viewed
        # from z=-12 keeps every face inside the frustum at every bench
        # angle (y never changes under the y-rotation; worst-case |x'| =
        # 4.53 < the 8.8 frustum half-width at its depth), making the
        # 1M-triangle workload honest: all faces rasterize in BOTH
        # implementations. CPU baseline re-measured on this scene.
        soup = make_instanced_soup(1_000_000, box=3.2)
        cam = Camera.create([0.0, 0.0, -12.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        # clip_cap sizes the fixed-shape clipped-face arrays processed
        # every frame (measured 24.0 ms at cap=8192 vs 8.1 at cap=128,
        # /tmp/geo_split probe). The frustum-interior scene clips
        # 0/0/8/44/7 faces at the bench angles 0.10/0.35/0.55/0.80/1.05
        # (measured) — 512 is ~11× headroom over the worst angle at
        # ~9 ms of fixed cost. Do NOT lower it near 44: past the cap,
        # faces are silently dropped (the r1-r3 honesty bug).
        return make_phong_scene(
            3840, 2160, meshes=[soup], camera=cam, clip_cap=512, backend=backend
        )
    raise ValueError(name)


def _scan_timer(run_n, frames: int, reps: int = 3) -> float:
    """Honest per-frame time on an async/tunneled runtime.

    ``run_n(n)`` must execute n dependency-chained frames inside ONE jit
    dispatch and return a checksum scalar (forced readback — nothing can
    return early). Two-point fit (N vs 2N wall time) cancels the constant
    dispatch/readback overhead, which jitters by tens of ms on the tunnel.

    Best-of-``reps`` fits: the r4 driver capture recorded phong1080 at
    40 ms where a clean re-run of the SAME commit measured 5.78 (checksum
    identical) — transient device/tunnel congestion can poison any single
    fit, so the minimum over a few cheap repetitions is the number of
    record. Measurement is seconds; compile (paid once, before this) is
    the expensive part.
    """
    run_n(frames)  # warm (already compiled for this n or compiles now)
    run_n(2 * frames)
    best = float("inf")
    for _ in range(max(1, reps)):
        t0 = time.time()
        run_n(frames)
        w1 = time.time() - t0
        t0 = time.time()
        run_n(2 * frames)
        w2 = time.time() - t0
        best = min(best, max((w2 - w1) / frames, w2 / (4 * frames), 1e-7))
    return best


def bench_config(name: str, frames: int, backend: str):
    import jax
    import jax.numpy as jnp

    from f_renderer_tpu.math import set_rotate
    from f_renderer_tpu.pipeline import render_frame

    scene = build_scene(name, backend)
    cfg = scene.config
    n_tris = sum(int(jax.tree.leaves(d)[0].shape[0]) for d in scene.draws)

    def one_frame(angle, vs_u, ps_u, draws):
        model = set_rotate(jnp.asarray([0.0, 1.0, 0.0]), angle)
        vs_u = dict(vs_u, model=model)
        frame, depth, _ = render_frame(
            list(draws),
            scene.vertex_shader,
            vs_u,
            scene.pixel_shader,
            ps_u,
            cfg,
        )
        return frame

    draws = tuple(scene.draws)
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, vs_u, ps_u, draws):
        angles = 0.1 + 0.05 * jnp.arange(n, dtype=jnp.float32)

        def body(acc, angle):
            frame = one_frame(angle, vs_u, ps_u, draws)
            return acc + jnp.sum(frame[::97, ::89, 0].astype(jnp.int32)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), angles)
        return acc

    t0 = time.time()
    chk = int(run_n(frames, scene.vs_uniform, scene.ps_uniform, draws))
    _log(f"[{name}] compile+first({frames} frames): {time.time() - t0:.1f}s "
         f"checksum={chk}")
    from f_renderer_tpu.utils.metrics import xprof_trace

    # BENCH_TRACE_DIR=<dir>: capture an XProf/TensorBoard device trace of
    # the timed region (utils.metrics.xprof_trace; no-op when unset).
    with xprof_trace(os.environ.get("BENCH_TRACE_DIR")):
        dt = _scan_timer(
            lambda n: int(run_n(n, scene.vs_uniform, scene.ps_uniform, draws)),
            frames,
        )
    mpix = cfg.width * cfg.height / dt / 1e6
    mtris = n_tris / dt / 1e6
    _log(
        f"[{name}] {cfg.width}x{cfg.height} tris={n_tris} "
        f"frame={dt * 1e3:.2f}ms fps={1 / dt:.1f} "
        f"Mpix/s={mpix:.1f} Mtris/s={mtris:.2f}"
    )
    return {
        "config": name,
        "width": cfg.width,
        "height": cfg.height,
        "tris": n_tris,
        "frame_ms": dt * 1e3,
        "mpix_per_s": mpix,
        "mtris_per_s": mtris,
    }


def bench_voxel(frames: int, width=960, height=540, level=3,
                traversal=None, name="voxel540"):
    """SVO raycast (voxel.rs workload: 960×540, level-3 random octree).

    ``traversal``: "fixed" (reference fixed-step parity semantics) or
    "dda" (cell-exact non-parity fast path — the voxel540dda config;
    VERDICT r3 #8). Defaults to BENCH_VOXEL_TRAVERSAL or "fixed".
    """
    import jax
    import jax.numpy as jnp

    from f_renderer_tpu.math import set_identity, set_look_at, set_perspective
    from f_renderer_tpu.voxel.octree import densify, gen_randomly
    from f_renderer_tpu.voxel.raycast import VoxelRenderConfig, render_voxel_frame

    rng = np.random.default_rng(0)
    root = gen_randomly(level, rng)
    grid_color, grid_hit = densify(root, level)
    grid_color = jnp.asarray(grid_color)
    grid_hit = jnp.asarray(grid_hit)
    length = 2.0
    traversal = traversal or os.environ.get("BENCH_VOXEL_TRAVERSAL", "fixed")
    cfg = VoxelRenderConfig(
        width=width, height=height, level=level, length=length,
        traversal=traversal,
    )
    proj = np.asarray(set_perspective(np.pi * 0.25, width / height, 0.1, 100.0))
    center = np.array([length / 2] * 3, np.float32)

    def args(i):
        ang = 0.3 + 0.08 * i
        eye = center + np.array(
            [3.0 * np.cos(ang), 1.2, 3.0 * np.sin(ang)], np.float32
        )
        view = np.asarray(set_look_at(eye, center, [0, 1, 0]))
        mvp = proj @ view @ np.asarray(set_identity())
        return eye, np.linalg.inv(mvp).astype(np.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, eyes, inv_mvps):
        def body(acc, a):
            eye, inv_mvp = a
            frame = render_voxel_frame(grid_color, grid_hit, eye, inv_mvp, cfg)
            return acc + jnp.sum(frame[::97, ::89, 0].astype(jnp.int32)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), (eyes, inv_mvps))
        return acc

    def pack_args(n):
        es, ms = zip(*(args(i) for i in range(n)))
        return jnp.asarray(np.stack(es)), jnp.asarray(np.stack(ms))

    # Device inputs are staged OUTSIDE the timed lambda: a host->device
    # transfer inside it adds 100s of ms of tunnel latency per call that
    # the two-point fit does not reliably cancel (measured ~90 ms/frame of
    # phantom time at voxel540).
    packs = {frames: pack_args(frames), 2 * frames: pack_args(2 * frames)}
    t0 = time.time()
    chk = int(run_n(frames, *packs[frames]))
    _log(f"[{name}] compile+first({frames} frames): {time.time() - t0:.1f}s "
         f"checksum={chk}")
    dt = _scan_timer(lambda n: int(run_n(n, *packs[n])), frames)
    mray = width * height / dt / 1e6
    _log(
        f"[{name}] {width}x{height} level={level} frame={dt * 1e3:.2f}ms "
        f"fps={1 / dt:.1f} Mrays/s={mray:.1f}"
    )
    return {
        "config": name,
        "width": width,
        "height": height,
        "frame_ms": dt * 1e3,
        "mpix_per_s": mray,
        "mtris_per_s": 0.0,
        "tris": 0,
    }


def _run_group(cmd, timeout: float, env=None):
    """Run ``cmd`` in its own process group; on timeout SIGKILL the whole
    group (a wedged tunnel helper survives subprocess.run's child-only
    kill and keeps the device locked for every retry).

    Returns (stdout, stderr, returncode) — returncode None on timeout.
    """
    import signal
    import subprocess

    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
        return out, err, proc.returncode
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        out, err = proc.communicate()
        return out, err, None


def _wait_for_device(max_s: float) -> None:
    """Retry backend init for up to ``max_s`` seconds.

    The TPU here is reached over a tunnel that can drop for minutes at a
    time (observed r3: multi-hour outage); a transient at bench time must
    not cost the round its benchmark artifact. Each attempt runs in a
    subprocess because a failed in-process init can leave jax pinned to a
    dead backend.
    """
    import subprocess
    import sys

    deadline = time.time() + max_s
    while True:
        # A wedged tunnel can make the probe HANG rather than fail fast
        # (BENCH_r03 died on an uncaught TimeoutExpired here). A hang is just
        # another "backend unavailable": kill the probe's whole process GROUP
        # (start_new_session makes the child a session leader, so killpg
        # reaps stuck tunnel-helper grandchildren too — subprocess.run's
        # own timeout kill only signals the direct child) and retry.
        ok = False
        try:
            _, _, rc = _run_group(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=max(60, min(240, deadline - time.time() + 240)),
            )
            ok = rc == 0
            if rc is None:
                _log("device probe hung (timeout); treating as unavailable")
        except OSError as e:
            _log(f"device probe failed to launch: {e}")
        if ok:
            # Settle before the PARENT initializes its own backend: a new
            # axon client connecting immediately as another (here: the probe
            # subprocess) disconnects can wedge forever in init — observed
            # twice today (futex-wait, 0 CPU, single thread). ~40% hit rate
            # on back-to-back connects; a short gap avoids the window.
            time.sleep(10)
            return
        if time.time() >= deadline:
            _log("device wait timed out; proceeding (bench may fail)")
            return
        _log("backend unavailable; retrying in 30 s")
        time.sleep(30)


def _bench_one(name: str, frames: int, backend: str):
    if name == "voxel540":
        return bench_voxel(frames)
    if name == "voxel540dda":
        return bench_voxel(frames, traversal="dda", name="voxel540dda")
    return bench_config(name, frames, backend)


def main():
    # Default to the FULL config list so the driver's BENCH_r*.json artifact
    # carries every headline number (VERDICT r1 #5), not just phong1080.
    config = os.environ.get("BENCH_CONFIG", "all")
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    backend = os.environ.get("BENCH_BACKEND", "")
    # Overall wall budget for the `all` artifact run (VERDICT r4 #2): the
    # driver kills bench.py at its own deadline (r3 rc=1, r4 rc=124 — two
    # rounds with parsed:null), so bench must (a) finish inside a budget and
    # (b) emit incrementally so even a kill keeps the completed configs.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.time()
    _wait_for_device(float(os.environ.get("BENCH_DEVICE_WAIT_S", "900")))

    if config == "all":
        # ONE process for the whole list. The r4 artifact run used a fresh
        # subprocess per config: each re-paid a 69-280 s cold remote compile
        # (the persistent cache does not hit across processes on axon) and
        # the run died at rc=124 after 8/8ths of the budget — while the r2
        # in-process artifact compiled at 43 s then 13-26 s per config
        # (session-warm lowering) and finished in ~6 min. Subprocess purity
        # is for optimization A/Bs, not the artifact run; best-of-3 fits in
        # _scan_timer handle transient contamination instead.
        #
        # Order: flagship first (phong1080 is the phong.rs headline), the
        # cheap configs next, stress4k LAST — its 1M-triangle programs leave
        # device/allocator state that measurably contaminates followers
        # (voxel540 17.4 ms right after stress4k vs 7.3 fresh, r4 probe),
        # so nothing may follow it.
        names = [
            "phong1080", "voxel540", "voxel540dda", "textured1080",
            "cube1080", "gouraud800", "cube512", "stress4k",
        ]
        # Conservative per-config cost ceilings (cold compile + measure, s)
        # for the budget gate — measured: triangle configs 65-110 s cold
        # compile in-process, voxel ~15-30 s, stress4k ~70 s compile +
        # ~25 s of 345 ms×30×2 frames.
        est = {"voxel540": 90, "voxel540dda": 90, "stress4k": 240}
        enable_compilation_cache()
        if not backend:
            import jax

            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        results = {}
        import gc

        for n in names:
            left = budget_s - (time.time() - t_start)
            if left < est.get(n, 180):
                _log(f"[{n}] SKIPPED: {left:.0f}s left of {budget_s:.0f}s "
                     "budget")
                continue
            try:
                results[n] = _bench_one(n, frames, backend)
            except Exception as e:
                _log(f"[{n}] FAILED: {type(e).__name__}: {e}")
                continue
            # Emit the cumulative artifact NOW (flushed): a later kill or
            # failure must not lose the configs already measured. The last
            # printed line is always the most complete.
            _emit(results)
            gc.collect()
        if not results:
            raise SystemExit("all bench configs failed")
        _emit(results)
        return

    enable_compilation_cache()
    if not backend:
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    results = {config: _bench_one(config, frames, backend)}
    _emit(results)


def _emit(results):
    headline = results.get("phong1080") or next(iter(results.values()))

    cpu = {}
    base_path = os.path.join(os.path.dirname(__file__), "baselines", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            cpu = json.load(f)

    def vs_cpu(r):
        # voxel540dda solves the same 960×540 SVO-raycast task as voxel540
        # with cell-exact (non-parity) traversal, so it reads against the
        # same single-core C++ baseline (the reference has no DDA mode).
        key = "voxel540" if r["config"] == "voxel540dda" else r["config"]
        cpu_mpix = cpu.get(key, {}).get("mpix_per_s")
        return round(r["mpix_per_s"] / cpu_mpix, 2) if cpu_mpix else 0.0

    print(
        json.dumps(
            {
                "metric": f"shaded_mpix_per_s_{headline['config']}",
                "value": round(headline["mpix_per_s"], 2),
                "unit": "Mpix/s",
                "vs_baseline": vs_cpu(headline),
                "configs": {
                    n: {
                        "frame_ms": round(r["frame_ms"], 2),
                        "mpix_per_s": round(r["mpix_per_s"], 2),
                        "vs_baseline": vs_cpu(r),
                    }
                    for n, r in results.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
