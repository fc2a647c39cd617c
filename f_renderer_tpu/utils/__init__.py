from f_renderer_tpu.utils.metrics import FrameStats, StageTimer  # noqa: F401
