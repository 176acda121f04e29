#!/usr/bin/env python
"""Full-resolution (1024x2048) single-chip train-step feasibility demo.

The reference's embedding coordinate frame is natively 1024x2048
(ref utils/utils.py:453-458 builds the y/x linspace grid at that size and
slices), i.e. the intended full-res Cityscapes training shape. This proves
one full-res EfficientSeg train step (on-device targets + all four losses +
grads + Adam) compiles and runs on ONE chip, and records peak HBM and step
time. Rematerialisation (`--remat`, flax nn.remat over the backbone blocks)
trades FLOPs for memory if the plain step does not fit.

Usage:  python tools/fullres_demo.py [--batch 1] [--compound 3] [--remat]
        [--ae-window 256 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--max-instances", type=int, default=96)
    ap.add_argument("--max-points", type=int, default=1024)
    ap.add_argument("--n-real", type=int, default=16)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ae-window", type=int, nargs=2, default=None)
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.losses import LossConfig
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    H, W = args.hw
    B, M = args.batch, args.max_instances
    lcfg = LossConfig(
        ae_window=tuple(args.ae_window) if args.ae_window else None)

    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16, remat=args.remat)
    model = EfficientSeg(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3),
                               make_optimizer("Adam", 2e-5))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    polys = np.zeros((B, M, 8, 2), np.float32)
    n_verts = np.zeros((B, M), np.int32)
    cls_ids = np.full((B, M), -1, np.int32)
    for b in range(B):
        for m in range(args.n_real):
            cy, cx = rng.uniform(160, H - 160), rng.uniform(240, W - 240)
            rh, rw = rng.uniform(40, 140), rng.uniform(60, 200)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang),
                                    cx + rw * np.cos(ang)], -1)
            n_verts[b, m] = 8
            cls_ids[b, m] = rng.integers(0, 8)
        polys[b, args.n_real:] = polys[b, 0, 0]
    polys, n_verts, cls_ids = map(jnp.asarray, (polys, n_verts, cls_ids))

    step = make_train_step(model, H, W, lcfg, max_points=args.max_points,
                           donate=False)
    srng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state2, stats = step(state, images, polys, n_verts, cls_ids, srng)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(state2.params)[0])[:1])
    compile_s = time.perf_counter() - t0
    total = float(stats["total_loss"])
    assert np.isfinite(total), f"non-finite full-res loss: {stats}"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state2, stats = step(state, images, polys, n_verts, cls_ids, srng)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(state2.params)[0])[:1])
    step_ms = (time.perf_counter() - t0) / args.iters * 1e3

    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        mem = {k: ms[k] for k in
               ("bytes_in_use", "peak_bytes_in_use", "bytes_limit") if k in ms}
    except Exception:
        pass
    print(json.dumps({
        "hw": [H, W], "batch": B, "compound": args.compound,
        "remat": args.remat, "ae_window": args.ae_window,
        "total_loss": total, "step_ms": round(step_ms, 1),
        "img_per_s": round(B / (step_ms / 1e3), 2),
        "compile_s": round(compile_s, 1),
        "peak_hbm_gb": round(mem.get("peak_bytes_in_use", 0) / 2**30, 2),
        "hbm_limit_gb": round(mem.get("bytes_limit", 0) / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
