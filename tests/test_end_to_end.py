"""End-to-end slice: synthetic Cityscapes -> train steps -> checkpoint ->
eval (inference + on-device decode + native AP). The SURVEY.md §7.5 "minimum
end-to-end slice" as a regression test."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from make_synthetic_cityscapes import generate
    root = tmp_path_factory.mktemp("synth")
    generate(str(root), splits=(("train", 2), ("val", 2)), h=256, w=512, seed=3,
             instances=(2, 4))
    return str(root)


def _make_cfg(synth_root, save_dir):
    from instance_segmentation_tpu.configs import Config
    return Config({
        "data": {"train_dir": synth_root, "save_dir": save_dir,
                 "dataset": "cityscapes", "batch_size": 2, "num_classes": -1},
        "optimizer": {"lr": 1e-4, "type": "Adam", "momentum": 0.9},
        "max_iter": 1, "num_epochs": 1, "save_span": 1000, "seed": 1,
        "compound_coef": 0,
        "anchors_scales": "[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]",
        "anchors_ratios": "[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]",
        "pretrained_path": None, "start_eval_epoch": 10**9,
        "tpu": {"compute_dtype": "float32", "input_size": [128, 256]},
        "static": {"max_instances": 8, "max_vertices": 16, "max_points": 128},
    })


def test_train_checkpoint_resume_eval(synth_root, tmp_path):
    from instance_segmentation_tpu.configs import Config, Configer
    from instance_segmentation_tpu.training import Trainer
    from instance_segmentation_tpu.utils.logger import Logger

    save_dir = str(tmp_path / "ckpt")
    cfg = _make_cfg(synth_root, save_dir)
    decode_cfg = Config({"cls_th": 0.3, "iou_th": 0.2, "kp_th": 2000,
                         "obj_pixel_th": 2, "wh_delta": 0.1, "alpha_ratio": 2,
                         "draw_flag": False})
    trans_cfg = Configer({
        "train_trans": {"trans_seq": ["resize", "random_hflip"],
                        "random_hflip": {"ratio": 0.5, "swap_pair": []},
                        "resize": {"target_size": 2}},
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]},
    })
    logger = Logger(save_dir)

    trainer = Trainer(cfg, decode_cfg, trans_cfg, logger)
    train_loader, eval_loader, _, eval_tf = trainer.make_loaders()

    running, avg = trainer.train_epoch(train_loader, epoch=0)
    assert np.isfinite(running.avg) and running.avg > 0
    trainer.ckpt.save(trainer.state, 0, running.avg)
    trainer.ckpt.wait()

    # resume: a fresh trainer picks up epoch 1
    trainer2 = Trainer(cfg, decode_cfg, trans_cfg, logger)
    assert trainer2.start_epoch == 1
    assert float(trainer2.state.step) == float(trainer.state.step)

    # eval path: inference + on-device decode + native AP on the val split
    from instance_segmentation_tpu.evaluation import evaluate_model
    epoch, ap, results = evaluate_model(
        cfg.data, eval_loader, eval_tf, trainer.model, trainer.state, 0,
        "cityscapes", decode_cfg, logger, input_hw=(128, 256),
        orig_hw=(256, 512))
    assert 0.0 <= ap <= 1.0
    assert os.path.exists(os.path.join(save_dir, "0_dets.json"))
