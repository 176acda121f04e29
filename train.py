#!/usr/bin/env python
"""Training entry point: python train.py --cfg_path configs/train_cfg.yaml

Same CLI surface as the reference (ref train.py:42-46); config keys carry
over (see instance_segmentation_tpu/configs/defaults/train_cfg.yaml).
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
    from instance_segmentation_tpu.parallel.multihost import maybe_initialize_multihost
    maybe_initialize_multihost()
    parser = argparse.ArgumentParser(description="training")
    parser.add_argument("--cfg_path", dest="cfg_path", type=str, default=None,
                        help="path to the train config yaml")
    args = parser.parse_args()

    from instance_segmentation_tpu.configs import (
        load_decode_config, load_train_config, load_trans_config,
    )
    cfg = load_train_config(args.cfg_path)
    decode_cfg = load_decode_config(cfg.get("decode_cfg_path"))
    trans_cfg = load_trans_config(cfg.get("trans_cfg_path"))

    data_cfg = cfg.data
    if not os.path.exists(data_cfg.train_dir):
        raise FileNotFoundError(f"the train dir cannot be found: {data_cfg.train_dir}")
    os.makedirs(data_cfg.save_dir, exist_ok=True)

    from instance_segmentation_tpu.utils.logger import Logger
    logger = Logger.init_logger(data_cfg.save_dir, run_config=cfg)
    logger.write("start to train...")

    from instance_segmentation_tpu.training import Trainer
    trainer = Trainer(cfg, decode_cfg, trans_cfg, logger)
    trainer.train()


if __name__ == "__main__":
    main()
