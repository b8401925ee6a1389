from climb_tpu.data.vision.datasets import (
    ImageNetDataset,
    Places365Dataset,
    Inat2019Dataset,
    CocoClsDataset,
    build_vision_dataset,
)

__all__ = [
    "ImageNetDataset",
    "Places365Dataset",
    "Inat2019Dataset",
    "CocoClsDataset",
    "build_vision_dataset",
]
