"""Named SlowFast architectures (reference models/hub/slowfast.py:37-148)."""

from pytorchvideo_tpu.models.slowfast import create_slowfast

# The shipped default for the packed-channel fast pathway (layers/packed.py).
# The driver's multichip dryrun (__graft_entry__.py) reads this constant so the
# gate always exercises whatever the hub factories actually default to.
DEFAULT_PATHWAY_PACKS = (1, 2)

checkpoint_names = {
    "slowfast_r50": "kinetics/SLOWFAST_8x8_R50.pyth",
    "slowfast_r101": "kinetics/SLOWFAST_8x8_R101.pyth",
    "slowfast_16x8_r101_50_50": "kinetics/SLOWFAST_16x8_R101_50_50.pyth",
}


def slowfast_r50(**kwargs):
    """SlowFast R50 8x8 (K400 top-1 76.94).

    ``pathway_packs=(1, 2)`` runs the fast pathway in the exact
    space-to-depth packed layout (layers/packed.py) — same params, same
    outputs, measured +3% e2e on v5e (550 -> 566 clips/s B64 bf16,
    benchmarks/packed_micro.py; cap 4 and per-stage mixes measured WORSE
    whole-model). Adapts per conv and falls back to plain convs whenever
    spatial dims stop dividing the cap, so any input size stays correct;
    pass ``pathway_packs=None`` for the reference-plain build.
    """
    kwargs.setdefault("model_depth", 50)
    kwargs.setdefault("slowfast_fusion_conv_kernel_size", (7, 1, 1))
    kwargs.setdefault("pathway_packs", DEFAULT_PATHWAY_PACKS)
    return create_slowfast(**kwargs)


def slowfast_r101(**kwargs):
    """SlowFast R101 8x8 (K400 top-1 77.90). Packed fast pathway by
    default, see :func:`slowfast_r50`."""
    kwargs.setdefault("model_depth", 101)
    kwargs.setdefault("slowfast_fusion_conv_kernel_size", (5, 1, 1))
    kwargs.setdefault("pathway_packs", DEFAULT_PATHWAY_PACKS)
    return create_slowfast(**kwargs)


def slowfast_16x8_r101_50_50(**kwargs):
    """SlowFast R101_50_50 16x8 (K400 top-1 78.70): stage-4 has 6 temporal
    conv blocks then pointwise (reference hub/slowfast.py:101-148)."""
    stage_conv_a_kernel_sizes = (
        (
            (1, 1, 1),
            (1, 1, 1),
            ((3, 1, 1),) * 6 + ((1, 1, 1),) * (23 - 6),
            (3, 1, 1),
        ),
        (
            (3, 1, 1),
            (3, 1, 1),
            ((3, 1, 1),) * 6 + ((1, 1, 1),) * (23 - 6),
            (3, 1, 1),
        ),
    )
    kwargs.setdefault("model_depth", 101)
    kwargs.setdefault("slowfast_fusion_conv_kernel_size", (5, 1, 1))
    kwargs.setdefault("stage_conv_a_kernel_sizes", stage_conv_a_kernel_sizes)
    kwargs.setdefault("head_pool_kernel_sizes", ((16, 7, 7), (64, 7, 7)))
    kwargs.setdefault("pathway_packs", DEFAULT_PATHWAY_PACKS)
    return create_slowfast(**kwargs)


def slowfast_r50_detection(**kwargs):
    """SlowFast R50 8x8 AVA detection (mAP 24.67; reference
    hub/slowfast.py:150-176). Checkpoint: ava/SLOWFAST_8x8_R50_DETECTION.pyth."""
    from pytorchvideo_tpu.models.detection import create_slowfast_with_roi_head

    return create_slowfast_with_roi_head(**kwargs)
