from instance_segmentation_tpu.training.trainer import Trainer

__all__ = ["Trainer"]
