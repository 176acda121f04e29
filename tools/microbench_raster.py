#!/usr/bin/env python
"""Time the Pallas rasterizer (cnt + r2 + union) against the XLA pipeline it
replaces (ae_sample_count scatter + _shift_min_r2 + any-union) at bench
shapes, and assert exact equality on-device.

Usage: python tools/microbench_raster.py [--batch 8]
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
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--p", type=int, default=1024)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.losses.losses import (
        _shift_min_r2, ae_sample_count)
    from instance_segmentation_tpu.losses.rasterize_pallas import (
        rasterize_cnt_r2)
    from instance_segmentation_tpu.ops.targets import Targets

    B, M, P = args.batch, args.m, args.p
    H, W = args.hw
    rng = np.random.default_rng(0)
    pts = np.zeros((B, M, P, 2), np.int32)
    val = np.zeros((B, M, P), bool)
    for b in range(B):
        for m in range(16):
            n = 400
            cy, cx = rng.uniform(64, H - 64), rng.uniform(64, W - 64)
            pts[b, m, :n, 0] = np.clip(cy + rng.normal(0, 40, n), -4, H + 4)
            pts[b, m, :n, 1] = np.clip(cx + rng.normal(0, 60, n), -4, W + 4)
            val[b, m, :n] = True
    pts, val = jnp.asarray(pts), jnp.asarray(val)
    tg = Targets(det_ann=jnp.zeros((B, M, 5)), centers=jnp.zeros((B, M, 2)),
                 inst_valid=jnp.any(val, 2), points=pts,
                 normals=jnp.zeros((B, M, P, 2)), pt_valid=val, kp_tgt=None)

    def xla_pipeline(tg):
        cnt = ae_sample_count(tg, H, W)
        r2 = _shift_min_r2(cnt > 0)
        uni = jnp.any(cnt > 0, axis=1).astype(jnp.uint8)
        return cnt, r2, uni

    jobs = [
        ("xla scatter+minr2+union", jax.jit(xla_pipeline), (tg,)),
        ("pallas rasterize", jax.jit(
            lambda p, v: rasterize_cnt_r2(p, v, H, W)), (pts, val)),
    ]

    def force(r):
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])

    outs = []
    for name, f, xs in jobs:
        t0 = time.perf_counter()
        force(f(*xs))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
        force(r)
        dt = (time.perf_counter() - t0) / args.iters
        outs.append(jax.device_get(r))
        print(f"{name:28s} {dt * 1e3:8.2f} ms   [compile {comp:.1f}s]",
              flush=True)

    for a, b, nm in zip(outs[0], outs[1], ("cnt", "r2", "union")):
        same = np.array_equal(np.asarray(a), np.asarray(b))
        print(f"{nm}: {'EXACT' if same else 'DIFF!'}", flush=True)


if __name__ == "__main__":
    main()
