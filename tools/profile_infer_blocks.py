#!/usr/bin/env python
"""Per-block eval-forward timings: backbone | BiFPN | box heads | U-Net.

The composed forward dominates the inference bench (50 of 55 ms at B=8);
this splits it so the next optimization lands on the right block. Each
block is applied as its own jitted sub-module on materialized inputs, so
numbers exclude cross-block fusion (their sum slightly exceeds the fused
composed forward).

Usage: python tools/profile_infer_blocks.py [--batch 8] [--s2d] [--compound 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--s2d", action="store_true",
                    help="run backbone+U-Net in s2d layout at eval")
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.models.bifpn import BiFPN
    from instance_segmentation_tpu.models.efficientnet import (
        EfficientNetFeatures, feature_channels)
    from instance_segmentation_tpu.models.efficientseg import (
        BACKBONE_COEF, BOX_CLASS_REPEATS, FPN_FILTERS, FPN_REPEATS,
        PYRAMID_LEVELS)
    from instance_segmentation_tpu.models.heads import Classifier, Regressor
    from instance_segmentation_tpu.models.unet_decoder import UNetDecoder

    H, W = args.hw
    B = args.batch
    coef = args.compound
    s2d = True if args.s2d else False
    cfg = EfficientSegConfig(num_classes=8, compound_coef=coef,
                             compute_dtype=jnp.bfloat16,
                             backbone_s2d=s2d, unet_s2d=s2d)
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (B, H, W, 3), dtype=np.uint8))
    variables = jax.jit(lambda r: model.init({"params": r}, images,
                                             train=False))(rng)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    mean = jnp.asarray(cfg.mean, jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, jnp.float32) * 255.0
    x = ((images.astype(jnp.float32) - mean) / std).astype(jnp.bfloat16)

    def sub(name, mod_cls, **kw):
        mod = mod_cls(**kw)
        v = {"params": params[name], "batch_stats": bstats.get(name, {})}
        return mod, v

    backbone, bb_v = sub("backbone", EfficientNetFeatures,
                         variant=BACKBONE_COEF[coef], dtype=jnp.bfloat16,
                         s2d=s2d)
    bifpn, fpn_v = sub("bifpn", BiFPN, num_channels=FPN_FILTERS[coef],
                       conv_channels=feature_channels(BACKBONE_COEF[coef])[2:5],
                       repeats=FPN_REPEATS[coef], attention=coef < 6,
                       use_p8=coef > 7, dtype=jnp.bfloat16)
    reg, reg_v = sub("regressor", Regressor, channels=FPN_FILTERS[coef],
                     num_anchors=cfg.num_anchors,
                     num_layers=BOX_CLASS_REPEATS[coef],
                     pyramid_levels=PYRAMID_LEVELS[coef], dtype=jnp.bfloat16)
    cls, cls_v = sub("classifier", Classifier, channels=FPN_FILTERS[coef],
                     num_anchors=cfg.num_anchors, num_classes=8,
                     num_layers=BOX_CLASS_REPEATS[coef],
                     pyramid_levels=PYRAMID_LEVELS[coef], dtype=jnp.bfloat16)
    unet, unet_v = sub("kp_header", UNetDecoder, dtype=jnp.bfloat16, s2d=s2d)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    def timeit(fn, *a):
        f = jax.jit(fn)
        force(f(*a))
        t = time.time()
        r = None
        for _ in range(args.iters):
            r = f(*a)
        force(r)
        return (time.time() - t) / args.iters * 1e3, f(*a)

    t_bb, blocks = timeit(lambda xi: backbone.apply(bb_v, xi, False), x)
    blocks = jax.block_until_ready(blocks)
    t_fpn, feats = timeit(lambda bs: bifpn.apply(fpn_v, list(bs), train=False),
                          tuple(blocks[2:5]))
    feats = jax.block_until_ready(feats)
    t_reg, _ = timeit(lambda fs: reg.apply(reg_v, list(fs), train=False),
                      tuple(feats))
    t_cls, _ = timeit(lambda fs: cls.apply(cls_v, list(fs), train=False),
                      tuple(feats))
    t_unet, _ = timeit(
        lambda xi, bs: unet.apply(unet_v, xi, list(bs), False), x,
        tuple(blocks))

    total = t_bb + t_fpn + t_reg + t_cls + t_unet
    print(f"B={B} s2d={s2d}  backbone {t_bb:6.2f}  bifpn {t_fpn:6.2f}  "
          f"regressor {t_reg:6.2f}  classifier {t_cls:6.2f}  "
          f"unet {t_unet:6.2f}  | sum {total:6.2f} ms")


if __name__ == "__main__":
    main()
