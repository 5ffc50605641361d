from pytorchvideo_tpu.data.epic_kitchen.epic_kitchen_dataset import (  # noqa: F401
    ActionData,
    EpicKitchenDataset,
)
