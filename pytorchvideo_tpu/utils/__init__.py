from pytorchvideo_tpu.utils.profiling import annotate, time_jitted, trace  # noqa: F401
