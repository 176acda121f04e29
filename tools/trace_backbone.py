#!/usr/bin/env python
"""Device-trace the backbone fwd+bwd (training layout) for per-source
aggregation with tools/parse_trace.py — the train step's dominant block.

Usage: python tools/trace_backbone.py [--batch 4] [--out /tmp/iseg_trace_bb]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-s2d", action="store_true")
    ap.add_argument("--out", default="/tmp/iseg_trace_bb")
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.models.efficientnet import EfficientNetFeatures

    H, W = args.hw
    bb = EfficientNetFeatures(variant=args.compound, dtype=jnp.bfloat16,
                              s2d=not args.no_s2d)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, H, W, 3)).astype(np.float32))
    variables = jax.jit(lambda r: bb.init(
        {"params": r, "dropout": r}, x, train=True))(rng)

    def loss(params, batch_stats, x):
        feats, _ = bb.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    step = jax.jit(jax.grad(loss))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    force(step(params, bstats, x))
    t = time.time()
    for _ in range(args.iters):
        r = step(params, bstats, x)
    force(r)
    print(f"warm fwd+bwd: {(time.time() - t) / args.iters * 1e3:.2f} ms/iter")

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        r = step(params, bstats, x)
    force(r)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
