#!/usr/bin/env python
"""Per-submodel fwd+bwd timing: backbone | BiFPN | box/class heads | U-Net.

Isolates where the train-step model cost sits (the composed fwd+bwd hides
the split). Each block is jitted standalone with random inputs of the real
intermediate shapes and timed with a trivial sum-loss grad.

Usage: python tools/profile_blocks.py [--batch 4] [--compound 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-s2d", action="store_true")
    ap.add_argument("--backbone-s2d", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list: backbone,bifpn,regressor,classifier,unet")
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

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
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def timed(name, module, *xs, method=None):
        var = jax.jit(lambda k: module.init(
            {"params": k, "dropout": k}, *xs, True))(key)

        def f(p, *inp):
            outs, _ = module.apply(
                {"params": p, **{c: var[c] for c in var if c != "params"}},
                *inp, True, mutable=["batch_stats"], rngs={"dropout": key})
            leaves = jax.tree_util.tree_leaves(outs)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)

        g = jax.jit(jax.grad(f))
        t0 = time.perf_counter()
        r = g(var["params"], *xs)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = g(var["params"], *xs)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:28s} {dt:9.2f} ms   [compile {compile_s:.1f}s]",
              flush=True)
        return var

    only = args.only.split(",") if args.only else None

    def want(name):
        return only is None or name in only

    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32), dtype)
    if want("backbone"):
        backbone = EfficientNetFeatures(variant=BACKBONE_COEF[coef],
                                        dtype=dtype, s2d=args.backbone_s2d)
        timed("backbone", backbone, x)

    chans = feature_channels(BACKBONE_COEF[coef])
    if only is not None and not any(want(n) for n in ("bifpn","regressor","classifier","unet")):
        return
    blocks = [jnp.asarray(rng.normal(size=(B, H // (2 ** (i + 1)),
                                           W // (2 ** (i + 1)), c)),
                          dtype) for i, c in enumerate(chans)]
    fpn_ch = FPN_FILTERS[coef]
    if want("bifpn"):
        bifpn = BiFPN(num_channels=fpn_ch, conv_channels=chans[2:5],
                      repeats=FPN_REPEATS[coef], attention=coef < 6,
                      use_p8=coef > 7, dtype=dtype)
        timed("bifpn", bifpn, blocks[2:5])

    feats = [jnp.asarray(rng.normal(size=(B, H // (2 ** l), W // (2 ** l),
                                          fpn_ch)), dtype)
             for l in range(3, 3 + PYRAMID_LEVELS[coef])]
    if want("regressor"):
        reg = Regressor(channels=fpn_ch, num_anchors=9,
                        num_layers=BOX_CLASS_REPEATS[coef],
                        pyramid_levels=PYRAMID_LEVELS[coef], dtype=dtype)
        timed("regressor", reg, feats)
    if want("classifier"):
        cls = Classifier(channels=fpn_ch, num_anchors=9, num_classes=8,
                         num_layers=BOX_CLASS_REPEATS[coef],
                         pyramid_levels=PYRAMID_LEVELS[coef], dtype=dtype)
        timed("classifier", cls, feats)

    if want("unet"):
        img = jnp.asarray(rng.normal(size=(B, H, W, 3)), dtype)
        unet = UNetDecoder(dtype=dtype, s2d=not args.no_s2d)
        timed("unet decoder", unet, img, blocks)


if __name__ == "__main__":
    main()
