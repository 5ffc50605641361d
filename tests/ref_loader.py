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
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        sys.modules.pop(module_name, None)
        raise
    # Populate the stub parent package so `from pytorchvideo.layers import X`
    # style imports in other reference modules resolve.
    parent_name, _, leaf = module_name.rpartition(".")
    parent = sys.modules.get(parent_name)
    if parent is not None:
        setattr(parent, leaf, mod)
        for k in dir(mod):
            if not k.startswith("_") and not hasattr(parent, k):
                setattr(parent, k, getattr(mod, k))
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


def _stub_fvcore():
    """Reference models import fvcore (SqueezeExcitation, weight-init fills),
    which isn't installed here. Provide behavior-compatible stubs: fvcore's SE
    is global-mean -> conv-ReLU-conv-sigmoid -> scale (Sequential indices
    0/1/2/3), and the fills only affect random init (irrelevant for
    weight-synced parity tests)."""
    if "fvcore" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    fvcore = _stub_package("fvcore")
    fvcore_nn = _stub_package("fvcore.nn")

    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        tnn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if getattr(module, "bias", None) is not None:
            tnn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        tnn.init.kaiming_uniform_(module.weight, a=1)
        if getattr(module, "bias", None) is not None:
            tnn.init.constant_(module.bias, 0)

    wi.c2_msra_fill = c2_msra_fill
    wi.c2_xavier_fill = c2_xavier_fill
    sys.modules["fvcore.nn.weight_init"] = wi
    fvcore_nn.weight_init = wi

    se_mod = types.ModuleType("fvcore.nn.squeeze_excitation")

    class SqueezeExcitation(tnn.Module):
        def __init__(
            self,
            num_channels,
            num_channels_reduced=None,
            reduction_ratio=2.0,
            is_3d=False,
            activation=None,
        ):
            super().__init__()
            if num_channels_reduced is None:
                num_channels_reduced = int(num_channels // reduction_ratio)
            if activation is None:
                activation = tnn.ReLU()
            conv = tnn.Conv3d if is_3d else tnn.Conv2d
            self.is_3d = is_3d
            self.block = tnn.Sequential(
                conv(num_channels, num_channels_reduced, 1, bias=True),
                activation,
                conv(num_channels_reduced, num_channels, 1, bias=True),
                tnn.Sigmoid(),
            )

        def forward(self, x):
            dims = [2, 3, 4] if self.is_3d else [2, 3]
            mean = x.mean(dim=dims, keepdim=True)
            return x * self.block(mean)

    se_mod.SqueezeExcitation = SqueezeExcitation
    sys.modules["fvcore.nn.squeeze_excitation"] = se_mod
    fvcore_nn.squeeze_excitation = se_mod


def _stub_torchvision():
    """Reference models/head.py imports torchvision's RoIAlign (C++ op).
    Stub the class; RoI-head parity is tested against our own roi_align op
    separately."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    tv = _stub_package("torchvision")
    ops = types.ModuleType("torchvision.ops")

    class RoIAlign(tnn.Module):
        def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=-1, aligned=False):
            super().__init__()
            self.output_size = output_size
            self.spatial_scale = spatial_scale
            self.sampling_ratio = sampling_ratio
            self.aligned = aligned

        def forward(self, x, rois):
            raise NotImplementedError("torchvision RoIAlign stub")

    ops.RoIAlign = RoIAlign
    sys.modules["torchvision.ops"] = ops
    tv.ops = ops


def load_ref(module_name: str, _depth: int = 0):
    """Load (and cache) a reference module plus its leaf dependencies.

    Dependencies are resolved lazily and self-healingly: if executing a module
    raises ModuleNotFoundError/ImportError naming another known leaf, that
    leaf is loaded first and the original load retried.
    """
    assert _depth < 40, f"dependency cycle loading {module_name}"
    if module_name in sys.modules:
        return sys.modules[module_name]
    _stub_fvcore()
    _stub_torchvision()
    for parent in ("pytorchvideo", *(
        f"pytorchvideo.{p}" for p in ("layers", "transforms", "data", "losses", "models")
    )):
        _stub_package(parent)
    for dep in _DEPS.get(module_name, []):
        load_ref(dep, _depth + 1)
    while True:
        try:
            return _load_file(module_name, _KNOWN[module_name])
        except (ModuleNotFoundError, ImportError) as e:
            missing = getattr(e, "name", None)
            if missing in _KNOWN and missing not in sys.modules:
                load_ref(missing, _depth + 1)
                continue
            # `from pytorchvideo.X import Y` where Y lives in a known leaf:
            # load every known leaf under that package and retry once.
            if missing and missing.startswith("pytorchvideo"):
                candidates = [
                    k
                    for k in _KNOWN
                    if k.startswith(missing + ".") and k not in sys.modules
                ]
                if candidates:
                    for c in candidates:
                        load_ref(c, _depth + 1)
                    continue
            raise
