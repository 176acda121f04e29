#!/usr/bin/env python
"""Evaluation entry point: python evaluate.py --cfg_path configs/eval_cfg.yaml

Capability parity with ref evaluate.py: score a single checkpoint
(weights_path) or sweep a directory of them (weights_dir, every 10th —
ref evaluate.py:112-129).
"""

import argparse
import os



def _platform_override():
    """Honour ISEG_PLATFORM=cpu|tpu (the axon plugin ignores JAX_PLATFORMS)."""
    import os
    plat = os.environ.get("ISEG_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def main():
    _platform_override()
    parser = argparse.ArgumentParser(description="evaluate")
    parser.add_argument("--cfg_path", dest="cfg_path", type=str, required=True)
    args = parser.parse_args()

    from instance_segmentation_tpu.configs import (
        Config, load_decode_config, load_trans_config, parse_anchor_expr,
        static_shapes_from,
    )
    cfg = Config(args.cfg_path)
    data_cfg = cfg.data
    decode_cfg = load_decode_config(cfg.get("decode_cfg_path"))
    trans_cfg = load_trans_config(cfg.get("trans_cfg_path"))
    os.makedirs(data_cfg.save_dir, exist_ok=True)

    from instance_segmentation_tpu import data as data_mod
    from instance_segmentation_tpu.utils.logger import Logger
    logger = Logger.init_logger(data_cfg.save_dir, run_config=cfg)

    num_classes = data_cfg.num_classes
    if num_classes == -1:
        num_classes = data_mod.get_cls_num(data_cfg.dataset)
        data_cfg.num_classes = num_classes

    import jax
    import jax.numpy as jnp
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state
    from instance_segmentation_tpu.parallel.train_step import make_optimizer
    from instance_segmentation_tpu.transforms import CommonTransforms
    from instance_segmentation_tpu.utils.checkpoint import CheckpointManager
    from instance_segmentation_tpu.evaluation import evaluate_model

    static = static_shapes_from(cfg)
    tpu_cfg = cfg.get("tpu")
    input_hw = tuple(tpu_cfg.input_size) if tpu_cfg else (512, 1024)

    model_cfg = EfficientSegConfig(
        num_classes=num_classes, compound_coef=cfg.compound_coef,
        compute_dtype=jnp.bfloat16,
        quant=(tpu_cfg.get("quant") or "none") if tpu_cfg else "none")
    model = EfficientSeg(model_cfg)
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed),
                               (1, *input_hw, 3), make_optimizer())

    ckpt_dir = cfg.get("weights_dir") or os.path.dirname(cfg.get("weights_path") or "")
    mgr = CheckpointManager(ckpt_dir or data_cfg.save_dir)

    eval_tf = CommonTransforms(trans_cfg, "val")
    eval_loader = data_mod.get_dataloader(
        data_cfg.batch_size, data_cfg.dataset,
        data_cfg.get("eval_dir") or data_cfg.get("train_dir"),
        phase=data_cfg.get("subset", "val"), transforms=eval_tf,
        max_instances=static.max_instances, max_verts=static.max_vertices)

    if cfg.get("weights_dir"):
        # sweep the checkpoint directory, every 10th (ref evaluate.py:112-129)
        names = mgr.list_checkpoints()[::10] or mgr.list_checkpoints()[-1:]
        for name in names:
            st, epoch, _ = mgr.restore_named(name, state)
            logger.write(f"evaluating checkpoint {name} (epoch {epoch - 1})")
            evaluate_model(data_cfg, eval_loader, eval_tf, model, st,
                           epoch - 1, data_cfg.dataset, decode_cfg, logger,
                           input_hw=input_hw)
    else:
        state, epoch, _ = mgr.restore_latest(state)
        evaluate_model(data_cfg, eval_loader, eval_tf, model, state,
                       epoch, data_cfg.dataset, decode_cfg, logger,
                       input_hw=input_hw)


if __name__ == "__main__":
    main()
