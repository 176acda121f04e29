#!/usr/bin/env python
"""Serving-invocation A/B: params-as-arguments vs params-closed-over jit.

The b1 composed inference measures ~7.9 ms device (tools/trace_infer
--batch 1) but ~9.1 ms wall on a quiet host — a ~1.2 ms/call host gap. One
candidate component is argument marshaling over the axon tunnel: the
params/batch_stats pytree is ~300 device-array handles serialized per call.
A serving deployment holds weights fixed (the AOT export bakes them in),
so a weights-closed jit is the honest serving shape; this measures both.

Usage: python tools/microbench_serving.py [--batches 1 8]
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
    ap.add_argument("--iters", type=int, default=50)
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
    from instance_segmentation_tpu.ops.decode import (
        DecodeConfig, forward_and_decode)

    H, W = args.hw
    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16)
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    imgs8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (max(args.batches), H, W, 3), dtype=np.uint8))
    variables = jax.jit(lambda r: model.init({"params": r}, imgs8,
                                             train=False))(rng)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig()
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def infer_args(p, bs, images):
        return forward_and_decode(model, {"params": p, "batch_stats": bs},
                                  images, anchors, 2 * H, 2 * W, 2.0, dcfg)

    var_fixed = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def infer_closed(images):
        return forward_and_decode(model, var_fixed, images,
                                  anchors, 2 * H, 2 * W, 2.0, dcfg)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    for B in args.batches:
        images = imgs8[:B]
        for name, call in (("args", lambda: infer_args(params, batch_stats,
                                                       images)),
                           ("closed", lambda: infer_closed(images))):
            t0 = time.time()
            force(call())
            print(f"B={B} {name:7s} warm/compile {time.time() - t0:.1f}s",
                  flush=True)
            t = time.time()
            r = None
            for _ in range(args.iters):
                r = call()
            force(r)
            dt = (time.time() - t) / args.iters
            print(f"B={B} {name:7s} {dt * 1e3:8.2f} ms/call "
                  f"({B / dt:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
