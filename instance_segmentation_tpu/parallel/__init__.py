from instance_segmentation_tpu.parallel.mesh import MeshSpec, make_mesh
from instance_segmentation_tpu.parallel.train_step import (
    TrainState, create_train_state, make_eval_step, make_train_step,
)

__all__ = [
    "MeshSpec", "make_mesh", "TrainState", "create_train_state",
    "make_train_step", "make_eval_step",
]
