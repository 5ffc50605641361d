"""Named CSN architecture (reference models/hub/csn.py:20-52)."""

from pytorchvideo_tpu.models.csn import create_csn

checkpoint_names = {"csn_r101": "kinetics/CSN_32x2_R101.pyth"}


def csn_r101(**kwargs):
    """CSN R101 32x2 (K400 top-1 77.00)."""
    kwargs.setdefault("model_depth", 101)
    kwargs.setdefault("head_pool_kernel_size", (4, 7, 7))
    return create_csn(**kwargs)
