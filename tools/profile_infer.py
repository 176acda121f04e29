#!/usr/bin/env python
"""Inference-path split: eval forward | decode | composed, at B=1 and B=8.

The bench headline times forward+decode composed; this isolates where the
per-image cost sits so optimization effort lands on the right block.

Usage: python tools/profile_infer.py [--batches 1 8] [--compound 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--quant", default="none")
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.ops.decode import DecodeConfig, decode_output

    H, W = args.hw
    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16, quant=args.quant)
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig()

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    def timeit(fn, *a):
        force(fn(*a))
        t = time.time()
        r = None
        for _ in range(args.iters):
            r = fn(*a)
        force(r)
        return (time.time() - t) / args.iters * 1e3

    for B in args.batches:
        images = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (B, H, W, 3), dtype=np.uint8))
        if B == args.batches[0]:
            variables = jax.jit(
                lambda r: model.init({"params": r}, images, train=False))(rng)
            params = variables["params"]
            bstats = variables.get("batch_stats", {})

        fwd = jax.jit(lambda p, s, im: model.apply(
            {"params": p, "batch_stats": s}, im, train=False))
        dec = jax.jit(lambda outs: decode_output(outs, anchors, 1024, 2048,
                                                 2.0, dcfg))
        both = jax.jit(lambda p, s, im: decode_output(
            fwd(p, s, im), anchors, 1024, 2048, 2.0, dcfg))

        t_f = timeit(fwd, params, bstats, images)
        outs = jax.block_until_ready(fwd(params, bstats, images))
        t_d = timeit(dec, outs)
        t_c = timeit(both, params, bstats, images)
        print(f"B={B}  forward {t_f:7.2f} ms  decode {t_d:7.2f} ms  "
              f"composed {t_c:7.2f} ms  ({B / t_c * 1e3:.1f} img/s)")


if __name__ == "__main__":
    main()
