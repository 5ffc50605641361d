from pytorchvideo_tpu.ops.roi_align import RoIAlign, roi_align  # noqa: F401
