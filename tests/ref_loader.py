"""Load individual reference modules by file path for parity testing.

The reference package (/root/reference) can't be imported wholesale here
(missing av/torchvision/fvcore deps), but most leaf modules only need torch +
numpy. This loader materializes a module from its file, registering stub
parent packages and any leaf dependencies first.
"""

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _load_file(module_name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        module_name, f"{REF_ROOT}/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_package(name: str):
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules[name] = pkg
    return sys.modules[name]


# Leaf modules and what they must have pre-loaded (dependency-ordered).
_KNOWN = {
    "pytorchvideo.layers.utils": "pytorchvideo/layers/utils.py",
    "pytorchvideo.layers.drop_path": "pytorchvideo/layers/drop_path.py",
    "pytorchvideo.layers.swish": "pytorchvideo/layers/swish.py",
    "pytorchvideo.layers.attention": "pytorchvideo/layers/attention.py",
    "pytorchvideo.layers.convolutions": "pytorchvideo/layers/convolutions.py",
    "pytorchvideo.layers.fusion": "pytorchvideo/layers/fusion.py",
    "pytorchvideo.layers.mlp": "pytorchvideo/layers/mlp.py",
    "pytorchvideo.layers.nonlocal_net": "pytorchvideo/layers/nonlocal_net.py",
    "pytorchvideo.layers.positional_encoding": "pytorchvideo/layers/positional_encoding.py",
    "pytorchvideo.layers.squeeze_excitation": "pytorchvideo/layers/squeeze_excitation.py",
    "pytorchvideo.transforms.functional": "pytorchvideo/transforms/functional.py",
    "pytorchvideo.data.clip_sampling": "pytorchvideo/data/clip_sampling.py",
    "pytorchvideo.losses.soft_target_cross_entropy": "pytorchvideo/losses/soft_target_cross_entropy.py",
    "pytorchvideo.models.weight_init": "pytorchvideo/models/weight_init.py",
    "pytorchvideo.models.net": "pytorchvideo/models/net.py",
    "pytorchvideo.models.head": "pytorchvideo/models/head.py",
    "pytorchvideo.models.stem": "pytorchvideo/models/stem.py",
    "pytorchvideo.models.resnet": "pytorchvideo/models/resnet.py",
    "pytorchvideo.models.csn": "pytorchvideo/models/csn.py",
    "pytorchvideo.models.r2plus1d": "pytorchvideo/models/r2plus1d.py",
    "pytorchvideo.models.x3d": "pytorchvideo/models/x3d.py",
    "pytorchvideo.models.slowfast": "pytorchvideo/models/slowfast.py",
    "pytorchvideo.models.vision_transformers": "pytorchvideo/models/vision_transformers.py",
    "pytorchvideo.models.audio_visual_slowfast": "pytorchvideo/models/audio_visual_slowfast.py",
}

# Dependencies between known leaf modules (load order).
_DEPS = {
    "pytorchvideo.losses.soft_target_cross_entropy": [
        "pytorchvideo.layers.utils",
        "pytorchvideo.transforms.functional",
    ],
    "pytorchvideo.models.head": ["pytorchvideo.layers.utils"],
    "pytorchvideo.models.stem": [
        "pytorchvideo.layers.convolutions",
        "pytorchvideo.layers.utils",
    ],
    "pytorchvideo.models.resnet": [
        "pytorchvideo.layers.convolutions",
        "pytorchvideo.layers.utils",
        "pytorchvideo.models.head",
        "pytorchvideo.models.net",
        "pytorchvideo.models.stem",
        "pytorchvideo.models.weight_init",
    ],
    "pytorchvideo.models.csn": ["pytorchvideo.models.resnet"],
    "pytorchvideo.models.r2plus1d": [
        "pytorchvideo.layers.convolutions",
        "pytorchvideo.models.resnet",
    ],
    "pytorchvideo.models.x3d": [
        "pytorchvideo.layers.convolutions",
        "pytorchvideo.layers.swish",
        "pytorchvideo.layers.utils",
        "pytorchvideo.models.head",
        "pytorchvideo.models.net",
        "pytorchvideo.models.resnet",
        "pytorchvideo.models.stem",
    ],
    "pytorchvideo.models.slowfast": [
        "pytorchvideo.layers.utils",
        "pytorchvideo.models.head",
        "pytorchvideo.models.net",
        "pytorchvideo.models.resnet",
        "pytorchvideo.models.stem",
    ],
    "pytorchvideo.models.vision_transformers": [
        "pytorchvideo.layers.attention",
        "pytorchvideo.layers.positional_encoding",
        "pytorchvideo.layers.utils",
        "pytorchvideo.models.head",
        "pytorchvideo.models.weight_init",
    ],
    "pytorchvideo.models.audio_visual_slowfast": [
        "pytorchvideo.models.head",
        "pytorchvideo.models.net",
        "pytorchvideo.models.resnet",
        "pytorchvideo.models.slowfast",
        "pytorchvideo.models.stem",
    ],
    "pytorchvideo.layers.attention": ["pytorchvideo.layers.drop_path"],
    "pytorchvideo.models.weight_init": ["pytorchvideo.layers.attention"],
}


def load_ref(module_name: str):
    """Load (and cache) a reference module plus its leaf dependencies."""
    if module_name in sys.modules:
        return sys.modules[module_name]
    for parent in ("pytorchvideo", *(
        f"pytorchvideo.{p}" for p in ("layers", "transforms", "data", "losses", "models")
    )):
        _stub_package(parent)
    for dep in _DEPS.get(module_name, []):
        load_ref(dep)
    return _load_file(module_name, _KNOWN[module_name])
