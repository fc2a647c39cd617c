"""Asset IO: OBJ meshes, TGA/PNG textures, image export."""

from f_renderer_tpu.io.obj import Model, load_obj
from f_renderer_tpu.io.image import load_texture, save_png, save_npy

__all__ = ["Model", "load_obj", "load_texture", "save_png", "save_npy"]
