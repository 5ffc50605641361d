"""Named R(2+1)D architecture (reference models/hub/r2plus1d.py:20-55)."""

from pytorchvideo_tpu.models.r2plus1d import create_r2plus1d

checkpoint_names = {"r2plus1d_r50": "kinetics/R2PLUS1D_16x4_R50.pyth"}


def r2plus1d_r50(**kwargs):
    """R(2+1)D R50 16x4 (K400 top-1 76.01)."""
    kwargs.setdefault("dropout_rate", 0.5)
    return create_r2plus1d(**kwargs)
