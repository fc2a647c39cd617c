"""Scene serialization — the checkpoint/resume analogue (SURVEY.md §5).

The reference has no checkpointing; its closest concept is asset loading
(OBJ/TGA). Here a whole Scene (mesh draws, textures, uniforms, camera,
config) round-trips through one ``.npz`` file so renders are reproducible
and scenes are shareable without the source assets.
"""

from __future__ import annotations

import json

import numpy as np


def save_scene(path: str, scene) -> None:
    """Serialize a Scene (scene.py) to .npz.

    Only builtin shaders (flat/gouraud/textured/phong, identified by their
    ``fused_kind`` tag) serialize — a custom shader closure has no stable
    on-disk form; callers must re-attach those themselves.
    """
    from f_renderer_tpu.pipeline import RenderConfig

    kind = getattr(scene.pixel_shader, "fused_kind", None)
    if kind not in ("flat", "gouraud", "textured", "phong"):
        raise ValueError(
            "save_scene only serializes the builtin shader kinds "
            "(flat/gouraud/textured/phong); got pixel_shader without a "
            "builtin fused_kind tag — re-attach custom shaders on load "
            "instead"
        )
    shader_meta = {"kind": kind}
    for attr in ("light_pos", "light_color"):
        val = getattr(scene.pixel_shader, attr, None)
        if val is not None:
            # float() each element: the builtins accept array-typed light
            # params (jnp scalars are not JSON-serializable).
            shader_meta[attr] = [float(v) for v in val]

    arrays = {}
    meta = {
        "num_draws": len(scene.draws),
        "draw_keys": [sorted(d.keys()) for d in scene.draws],
        "shader": shader_meta,
        "config": {
            "width": scene.config.width,
            "height": scene.config.height,
            "background": list(scene.config.background),
            "clip_cap": scene.config.clip_cap,
            "tile": list(scene.config.tile),
            "backend": scene.config.backend,
            "replicate_ps_boundary_quirk": scene.config.replicate_ps_boundary_quirk,
        },
    }
    for i, d in enumerate(scene.draws):
        for k, v in d.items():
            arrays[f"draw{i}_{k}"] = np.asarray(v)
    for k, v in scene.vs_uniform.items():
        arrays[f"vs_{k}"] = np.asarray(v)
    tex = scene.ps_uniform.get("textures")
    if tex is not None:
        arrays["tex_data"] = np.asarray(tex.data)
        arrays["tex_dims"] = np.asarray(tex.dims)
    for k, v in scene.ps_uniform.items():
        if k == "textures":
            continue
        arrays[f"ps_{k}"] = np.asarray(v)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_scene(path: str):
    """Load a Scene saved by :func:`save_scene`.

    The builtin shader pair recorded at save time (kind + light parameters)
    is re-attached, so flat/gouraud/textured/phong scenes all round-trip
    faithfully. Files written before the shader tag existed load as Phong
    (the only kind save_scene emitted then).
    """
    import jax.numpy as jnp

    from f_renderer_tpu.pipeline import RenderConfig
    from f_renderer_tpu.scene import Scene
    from f_renderer_tpu.shaders import (
        FlatShader,
        TextureStack,
        make_gouraud_shaders,
        make_phong_shaders,
        make_textured_shaders,
    )

    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    draws = []
    for i, keys in enumerate(meta["draw_keys"]):
        draws.append({k: jnp.asarray(z[f"draw{i}_{k}"]) for k in keys})
    vs_uniform = {
        k[3:]: jnp.asarray(z[k]) for k in z.files if k.startswith("vs_")
    }
    ps_uniform = {
        k[3:]: jnp.asarray(z[k]) for k in z.files if k.startswith("ps_")
    }
    if "tex_data" in z.files:
        ps_uniform["textures"] = TextureStack.from_data(
            z["tex_data"], z["tex_dims"]
        )
    c = meta["config"]
    sh = meta.get("shader", {"kind": "phong"})
    kind = sh["kind"]
    light_kw = {
        k: tuple(sh[k]) for k in ("light_pos", "light_color") if k in sh
    }
    if kind == "flat":
        vs, ps = FlatShader.vertex, FlatShader.pixel
    elif kind == "textured":
        vs, ps = make_textured_shaders()
    elif kind == "gouraud":
        vs, ps = make_gouraud_shaders(**light_kw)
    else:
        vs, ps = make_phong_shaders(**light_kw)
    return Scene(
        draws=draws,
        vertex_shader=vs,
        pixel_shader=ps,
        vs_uniform=vs_uniform,
        ps_uniform=ps_uniform,
        config=RenderConfig(
            width=c["width"],
            height=c["height"],
            background=tuple(c["background"]),
            clip_cap=c["clip_cap"],
            tile=tuple(c["tile"]),
            backend=c["backend"],
            replicate_ps_boundary_quirk=c["replicate_ps_boundary_quirk"],
        ),
    )
