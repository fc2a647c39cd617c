"""f_renderer_tpu — a TPU-native software render engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the Rust CPU
software rasterizer ``vmskisme/f_renderer`` (see SURVEY.md): a programmable
vertex/pixel-shader triangle pipeline (homogeneous clipping, top-left-rule
rasterization, perspective-correct interpolation, reversed-z rhw depth
buffering, bilinear texture sampling) plus a sparse-voxel-octree raycaster.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- :mod:`f_renderer_tpu.math`      — L0 math utilities (matrix_util.rs / vector_util.rs)
- :mod:`f_renderer_tpu.camera`    — L1 camera (camera.rs) + orbit/pan/zoom controls
- :mod:`f_renderer_tpu.io`        — L1 assets: OBJ loader, TGA/PNG textures (obj_loader.rs,
  renderer.rs:427-471)
- :mod:`f_renderer_tpu.framebuffer` — L2 FrameBuffer/Texture ops (renderer.rs:411-589)
- :mod:`f_renderer_tpu.pipeline`  — L2 core pipeline: batched geometry stage and
  tile rasterizer (renderer.rs:96-384), jnp fallback + Pallas TPU kernels
- :mod:`f_renderer_tpu.shaders`   — programmable shader API + built-in shaders
  (the reference's closure-based shader capability, phong.rs:114-154)
- :mod:`f_renderer_tpu.scene`     — L4 scene/app layer: multi-mesh scenes, frame loop,
  image export (replaces the Vulkan/wgpu window presentation, vulkan_base.rs/wgpu_base.rs)
- :mod:`f_renderer_tpu.voxel`     — SVO raycaster workload (voxel.rs)
- :mod:`f_renderer_tpu.parallel`  — multi-device sharding (tile/triangle parallel)
- :mod:`f_renderer_tpu.golden`    — slow scalar NumPy oracle for golden tests
"""

__version__ = "0.1.0"
