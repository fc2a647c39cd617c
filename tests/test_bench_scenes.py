"""Benchmark-scene honesty guards (the r1-r3 silent-drop bug class).

``clip_cap`` sizes fixed-shape arrays; faces past the cap are silently
DROPPED, so a benchmark scene whose cap is under its real clipped-face
count renders a different image than the CPU baseline and the speedup is
a lie (BASELINE.md r4: the old stress4k scene dropped up to 97%). These
tests pin the invariant for every cap-tuned bench scene: the measured
per-frame clipped-face count stays within the cap at representative bench
angles (and for the cube scenes, the cap exceeds the TOTAL face count, so
a drop is impossible at ANY pose).
"""

import jax.numpy as jnp
import pytest

import bench
from f_renderer_tpu.math import set_rotate
from f_renderer_tpu.pipeline.render import build_triangles

# Bench angles are 0.1 + 0.05*i; include the measured-worst stress angle
# family plus span ends.
ANGLES = (0.10, 0.55, 0.80, 1.05)


def _worst_clipped(scene):
    worst = 0
    for a in ANGLES:
        vs_u = dict(
            scene.vs_uniform, model=set_rotate(jnp.asarray([0.0, 1.0, 0.0]), a)
        )
        _, stats = build_triangles(
            list(scene.draws), scene.vertex_shader, vs_u, scene.config
        )
        worst = max(worst, int(stats["num_clipped"]))
    return worst


@pytest.mark.parametrize("name", ["cube512", "cube1080"])
def test_cube_caps_exceed_total_faces(name):
    scene = bench.build_scene(name, backend="jnp")
    total = sum(d["pos"].shape[0] for d in scene.draws)
    assert scene.config.clip_cap >= total  # drop impossible at ANY pose
    assert _worst_clipped(scene) <= total


@pytest.mark.parametrize("name", ["gouraud800", "phong1080"])
def test_scene_clip_counts_within_cap(name):
    scene = bench.build_scene(name, backend="jnp")
    worst = _worst_clipped(scene)
    # honest with margin: the scenes measured ZERO clipped faces over 20
    # angles (r5); require at most half the cap so a scene/camera edit
    # that starts clipping near the cap fails loudly here first.
    assert worst <= scene.config.clip_cap // 2, (worst, scene.config.clip_cap)
