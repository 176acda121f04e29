from instance_segmentation_tpu.losses.losses import (
    LossConfig, ae_loss, compose_loss, coordinate_grid, det_focal_loss,
    focal_heatmap_loss, kp_focal_loss, kp_focal_loss_from_points, tangent_loss,
)

__all__ = [
    "LossConfig", "ae_loss", "compose_loss", "coordinate_grid",
    "det_focal_loss", "focal_heatmap_loss", "kp_focal_loss",
    "kp_focal_loss_from_points", "tangent_loss",
]
