"""Compiled train/eval steps over a device mesh.

One jit-compiled function does everything the reference's per-iteration Python
does (ref train.py:192-227: forward, host-side target generation inside the
loss, backward, optimizer step): target generation, forward, loss, gradients,
and the optimizer update all fuse into a single XLA program. Under a sharded
batch, gradient/BN reductions become ICI collectives automatically (GSPMD).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from instance_segmentation_tpu.losses import LossConfig, compose_loss
from instance_segmentation_tpu.models.anchors import generate_anchors
from instance_segmentation_tpu.models.efficientseg import (
    EfficientSeg, EfficientSegConfig,
)
from instance_segmentation_tpu.ops.targets import generate_targets


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats, opt_state=new_opt_state)


def make_optimizer(opt_type: str = "Adam", lr: float = 2e-5,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """Optimizer menu matching ref train.py:104-117 (SGD / Adam / Adadelta).

    The reference's torch Adam carries weight_decay=1e-4 (L2 added to the
    gradient before the Adam update), reproduced with add_decayed_weights
    *before* the adam transform.
    """
    if opt_type == "SGD":
        return optax.sgd(lr, momentum=momentum)
    if opt_type == "Adam":
        return optax.chain(optax.add_decayed_weights(1e-4),
                           optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    if opt_type == "Adadelta":
        return optax.adadelta(lr)
    raise ValueError(f"unknown optimizer type: {opt_type}")


def create_train_state(model: EfficientSeg, rng, input_shape: Tuple[int, int, int, int],
                       tx: optax.GradientTransformation) -> TrainState:
    variables = jax.jit(
        lambda r: model.init({"params": r}, jnp.zeros(input_shape, jnp.uint8), train=False)
    )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)


def make_train_step(model: EfficientSeg, h: int, w: int,
                    loss_cfg: LossConfig = LossConfig(),
                    max_points: int = 2048,
                    donate: bool = True,
                    device_aug: bool = False) -> Callable:
    """Returns train_step(state, images, polys, n_verts, cls_ids, rng).

    device_aug=True applies the random hflip + brightness augmentation inside
    the compiled step (ops/device_aug.py) — the host pipeline should then run
    only the deterministic resize.
    """
    cfg = model.cfg
    anchors = jnp.asarray(generate_anchors(
        h, w, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))

    def step(state: TrainState, images, polys, n_verts, cls_ids, rng):
        if device_aug:
            from instance_segmentation_tpu.ops.device_aug import random_hflip_brightness
            rng, aug_rng = jax.random.split(rng)
            images, polys = random_hflip_brightness(images, polys, aug_rng)
        targets = generate_targets(polys, n_verts, cls_ids, h, w,
                                   max_points=max_points, dense_kp=False)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            total, stats = compose_loss(outputs, targets, anchors, loss_cfg)
            return total, (stats, mutated["batch_stats"])

        (_, (stats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, stats

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: EfficientSeg) -> Callable:
    """Jitted inference forward: images -> (kp, ae, tan, regression, cls)."""

    def step(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)

    return jax.jit(step)
