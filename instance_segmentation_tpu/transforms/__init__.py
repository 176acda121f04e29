from instance_segmentation_tpu.transforms.augment import (
    CommonTransforms, TransInfo, build_augmentations,
)

__all__ = ["CommonTransforms", "TransInfo", "build_augmentations"]
