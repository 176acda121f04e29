#!/usr/bin/env python
"""Capture a jax.profiler device trace of the PACKED inference path
(forward_and_decode — the bench.py headline) so tools/parse_trace.py can
aggregate where the time actually goes.

Usage: python tools/trace_infer.py [--batch 8] [--out /tmp/iseg_trace_infer]
       python tools/parse_trace.py /tmp/iseg_trace_infer --top 40

Warm up (compile) BEFORE the trace context: compiles started while a
profiler trace is open miss the persistent cache (CLAUDE.md trap).
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/iseg_trace_infer")
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
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (args.batch, H, W, 3), dtype=np.uint8))
    variables = jax.jit(lambda r: model.init({"params": r}, images,
                                             train=False))(rng)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig()

    @jax.jit
    def infer(params, batch_stats, images):
        return forward_and_decode(
            model, {"params": params, "batch_stats": batch_stats}, images,
            anchors, 2 * H, 2 * W, 2.0, dcfg)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    force(infer(params, batch_stats, images))      # compile outside the trace
    t = time.time()
    for _ in range(args.iters):
        r = infer(params, batch_stats, images)
    force(r)
    wall = (time.time() - t) / args.iters
    print(f"warm composed: {wall * 1e3:.2f} ms/iter "
          f"({args.batch / wall:.1f} img/s)")

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        r = infer(params, batch_stats, images)
    force(r)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} ({args.iters} iters)")


if __name__ == "__main__":
    main()
