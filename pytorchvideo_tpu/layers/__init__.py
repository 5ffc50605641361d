from pytorchvideo_tpu.layers.utils import round_repeats, round_width  # noqa: F401
