"""Hub utilities: named checkpoint registry + pretrained loading.

The reference loads ``{"model_state": state_dict}`` .pyth files from the
model-zoo URL root (reference models/hub/resnet.py:14-38). This environment
has no egress; ``load_pretrained_variables`` takes a local .pyth path (or an
already-loaded dict) and imports it through the generic torch importer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

MODEL_ZOO_ROOT_DIR = "https://dl.fbaipublicfiles.com/pytorchvideo/model_zoo"


def hub_model_builder(
    model_builder_func,
    pretrained: bool = False,
    checkpoint_path: str = "",
    default_config: Optional[dict] = None,
    example_input=None,
    rename_rules: Optional[Sequence[Tuple[str, str]]] = None,
    **kwargs,
):
    """Build a model from a builder func + default config, optionally loading
    a pretrained checkpoint (reference models/hub/utils.py:12-49).

    Returns the model, or ``(model, variables)`` when ``pretrained`` — linen
    modules carry no state, so the imported weights come back alongside.
    ``checkpoint_path`` is a local .pyth path (no egress in this
    environment); ``example_input`` is required when ``pretrained`` (drives
    model.init for the target pytree shapes).
    """
    if pretrained:
        assert len(kwargs) == 0, "Do not change kwargs for pretrained model."
    if default_config is not None:
        for argument, value in default_config.items():
            if kwargs.get(argument) is None:
                kwargs[argument] = value
    model = model_builder_func(**kwargs)
    if pretrained:
        if example_input is None:
            raise ValueError("example_input is required for pretrained=True")
        variables, _ = load_pretrained_variables(
            model, example_input, checkpoint_path, rename_rules=rename_rules
        )
        return model, variables
    return model


def load_pretrained_variables(
    model,
    example_input,
    checkpoint,
    rename_rules: Optional[Sequence[Tuple[str, str]]] = None,
    strict: bool = True,
):
    """Build target variables via model.init and fill from a torch checkpoint.

    ``checkpoint``: path to a .pyth file or a loaded state dict /
    {"model_state": ...} mapping. Returns (variables, report).
    """
    import jax

    from pytorchvideo_tpu.zoo.import_torch import import_torch_checkpoint

    if isinstance(checkpoint, (str, bytes)):
        import torch

        checkpoint = torch.load(checkpoint, map_location="cpu", weights_only=True)
    target = model.init(jax.random.PRNGKey(0), example_input, False)
    return import_torch_checkpoint(
        checkpoint, target, rename_rules=rename_rules, strict=strict
    )
