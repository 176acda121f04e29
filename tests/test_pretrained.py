"""Pretrained warm start: reference torch checkpoint -> converted orbax
checkpoint -> Trainer(pretrained_path=...) -> one finite train step.

Covers the reference's `pretrained_path` branch (ref train.py:119-132: load
non-strict, do NOT resume) end to end: the converter output is what the
Trainer actually consumes.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

REF = "/root/reference"


@pytest.fixture(scope="module")
def converted_ckpt(tmp_path_factory):
    """Random-init reference torch model -> converted orbax checkpoint."""
    if not os.path.isdir(REF):
        pytest.skip("reference mount not available")
    import torch
    from test_torch_parity import _stub_torchvision

    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.efficient import EfficientSeg as TorchEfficientSeg

    torch.manual_seed(7)
    tmodel = TorchEfficientSeg(num_classes=8, compound_coef=0)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from convert_torch_weights import convert_state_dict
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig

    cfg = EfficientSegConfig(num_classes=8, compound_coef=0)
    model = EfficientSeg(cfg)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.zeros((1, 128, 256, 3), jnp.uint8), train=False)
    )(jax.random.PRNGKey(0))
    converted, n = convert_state_dict(sd, jax.device_get(variables), 0)
    assert n > 100, f"converter only matched {n} tensors"

    out = str(tmp_path_factory.mktemp("pre") / "flax_ckpt")
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    ckptr.save(out, args=ocp.args.StandardSave(converted))
    return out, converted


def test_load_pretrained_merges_matching_leaves(converted_ckpt):
    """load_pretrained takes every shape-matching leaf from the checkpoint."""
    import jax
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state
    from instance_segmentation_tpu.parallel.train_step import make_optimizer
    from instance_segmentation_tpu.utils.checkpoint import load_pretrained

    path, converted = converted_ckpt
    model = EfficientSeg(EfficientSegConfig(num_classes=8, compound_coef=0))
    state = create_train_state(model, jax.random.PRNGKey(1), (1, 128, 256, 3),
                               make_optimizer("Adam", 1e-4))
    state, n_match, n_total = load_pretrained(path, state)
    assert n_match == n_total and n_match > 100

    got = np.asarray(state.params["backbone"]["stem_conv"]["Conv_0"]["kernel"])
    want = np.asarray(converted["params"]["backbone"]["stem_conv"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(state.batch_stats["backbone"]["stem_bn"]["BatchNorm_0"]["mean"])
    want_bn = np.asarray(converted["batch_stats"]["backbone"]["stem_bn"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(got_bn, want_bn, rtol=1e-6)


def test_trainer_warm_start_one_step(converted_ckpt, tmp_path):
    """Trainer consumes pretrained_path; one train step from it is finite."""
    from make_synthetic_cityscapes import generate
    from instance_segmentation_tpu.configs import Config, Configer
    from instance_segmentation_tpu.training import Trainer
    from instance_segmentation_tpu.utils.logger import Logger

    path, converted = converted_ckpt
    synth = str(tmp_path / "synth")
    generate(synth, splits=(("train", 2),), h=256, w=512, seed=5,
             instances=(2, 4))

    save_dir = str(tmp_path / "ckpt")
    cfg = Config({
        "data": {"train_dir": synth, "save_dir": save_dir,
                 "dataset": "cityscapes", "batch_size": 2, "num_classes": -1},
        "optimizer": {"lr": 1e-4, "type": "Adam", "momentum": 0.9},
        "max_iter": 1, "num_epochs": 1, "save_span": 1000, "seed": 1,
        "compound_coef": 0,
        "anchors_scales": "[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]",
        "anchors_ratios": "[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]",
        "pretrained_path": path, "start_eval_epoch": 10**9,
        "tpu": {"compute_dtype": "float32", "input_size": [128, 256]},
        "static": {"max_instances": 8, "max_vertices": 16, "max_points": 128},
    })
    decode_cfg = Config({"cls_th": 0.3, "iou_th": 0.2, "kp_th": 2000,
                         "obj_pixel_th": 2, "wh_delta": 0.1, "alpha_ratio": 2,
                         "draw_flag": False})
    trans_cfg = Configer({
        "train_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]},
    })
    trainer = Trainer(cfg, decode_cfg, trans_cfg, Logger(save_dir))

    # warm start actually applied (not a fresh init) and resume skipped
    assert trainer.start_epoch == 0
    got = np.asarray(trainer.state.params["backbone"]["stem_conv"]["Conv_0"]["kernel"])
    want = np.asarray(converted["params"]["backbone"]["stem_conv"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    train_loader, _, _, _ = trainer.make_loaders()
    running, _ = trainer.train_epoch(train_loader, epoch=0)
    assert np.isfinite(running.avg)
    trainer.ckpt.wait()
