#!/usr/bin/env python
"""Evaluate a converted (torch->flax) checkpoint with OUR pipeline: forward
+ on-device decode over the synthetic val split, writing 0_dets/0_infos.json
(part B of tools/ab_compare.py). Run as a subprocess for clean jax state."""

from __future__ import annotations

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(conv_ckpt: str, root: str, out_dir: str, compound: int = 0):
    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from instance_segmentation_tpu.configs import Config, Configer
    from instance_segmentation_tpu.data import get_dataloader
    from instance_segmentation_tpu.evaluation.eval_loop import eval_outputs
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.transforms import CommonTransforms
    from instance_segmentation_tpu.utils.logger import Logger

    os.makedirs(out_dir, exist_ok=True)
    for f in ("0_dets.json", "0_infos.json"):
        p = os.path.join(out_dir, f)
        if os.path.exists(p):
            os.remove(p)

    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    loaded = ckptr.restore(os.path.abspath(conv_ckpt))

    # f32 compute: the torch reference runs f32, so parity is checked at f32
    model = EfficientSeg(EfficientSegConfig(
        num_classes=8, compound_coef=compound, compute_dtype=jnp.float32))
    state = types.SimpleNamespace(params=loaded["params"],
                                  batch_stats=loaded["batch_stats"])

    trans = Configer({
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]}})
    loader = get_dataloader(1, "cityscapes", root, "val",
                            transforms=CommonTransforms(trans, "val", seed=0),
                            max_instances=16, max_verts=64)
    decode_cfg = Config({"cls_th": 0.3, "iou_th": 0.2, "kp_th": 20000,
                         "obj_pixel_th": 2, "wh_delta": 0.1, "draw_flag": False})
    eval_outputs(out_dir, loader, model, state, 0, decode_cfg, Logger(out_dir),
                 input_hw=(256, 512), orig_hw=(512, 1024))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--compound", type=int, default=0)
    a = ap.parse_args()
    main(a.ckpt, a.root, a.out, a.compound)
