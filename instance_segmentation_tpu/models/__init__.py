from instance_segmentation_tpu.models.efficientseg import EfficientSeg, EfficientSegConfig
from instance_segmentation_tpu.models.anchors import generate_anchors

__all__ = ["EfficientSeg", "EfficientSegConfig", "generate_anchors"]
