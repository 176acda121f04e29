#!/usr/bin/env python
"""Per-instruction HBM/MXU roofline of the compiled train step.

The axon TPU plugin compiles across the tunnel, so --xla_dump_to never
writes locally; instead this fetches the SCHEDULED optimized HLO through
`jitted.lower(...).compile().as_text()`, traces N executions of ONLY the
train step (single module -> unambiguous name join), and hands both to
tools/parse_trace.py --roofline for the achieved-GB/s / achieved-TFLOP/s
table vs chip peaks (819 GB/s HBM, 197 bf16 TFLOP/s on v5e).

Usage:  python tools/roofline_train.py [--batch 4] [--out /tmp/roofline]
        python tools/parse_trace.py /tmp/roofline/trace --roofline /tmp/roofline --top 50
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
    ap.add_argument("--max-instances", type=int, default=96)
    ap.add_argument("--max-points", type=int, default=1024)
    ap.add_argument("--n-real", type=int, default=16)
    ap.add_argument("--out", default="/tmp/roofline")
    ap.add_argument("--eval", action="store_true",
                    help="roofline the inference forward+decode instead")
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
    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    H, W = args.hw
    B, M, P = args.batch, args.max_instances, args.max_points
    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16)
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
            cy, cx = rng.uniform(80, H - 80), rng.uniform(120, W - 120)
            rh, rw = rng.uniform(20, 70), rng.uniform(30, 100)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang),
                                    cx + rw * np.cos(ang)], -1)
            n_verts[b, m] = 8
            cls_ids[b, m] = rng.integers(0, 8)
        polys[b, args.n_real:] = polys[b, 0, 0]
    polys, n_verts, cls_ids = map(jnp.asarray, (polys, n_verts, cls_ids))
    srng = jax.random.PRNGKey(1)

    if args.eval:
        from instance_segmentation_tpu.ops.decode import (
            DecodeConfig, forward_and_decode)
        anchors = jnp.asarray(generate_anchors(
            H, W, pyramid_levels=cfg.pyramid_levels,
            anchor_scale=cfg.anchor_scale, scales=cfg.scales,
            ratios=cfg.ratios))

        def fn(params, batch_stats, imgs):
            return forward_and_decode(
                model, {"params": params, "batch_stats": batch_stats}, imgs,
                anchors, 2 * H, 2 * W, 2.0, DecodeConfig())
        jfn = jax.jit(fn)
        fn_args = (state.params, state.batch_stats, images)
    else:
        jfn = make_train_step(model, H, W, LossConfig(), max_points=P,
                              donate=False)
        fn_args = (state, images, polys, n_verts, cls_ids, srng)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    compiled = jfn.lower(*fn_args).compile()
    print(f"compile/load {time.time() - t0:.1f}s", flush=True)
    hlo_path = os.path.join(args.out, "step.after_optimization.txt")
    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {hlo_path}", flush=True)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    force(jfn(*fn_args))                       # warm (outside the trace)
    trace_dir = os.path.join(args.out, "trace")
    with jax.profiler.trace(trace_dir):
        r = None
        for _ in range(args.iters):
            r = jfn(*fn_args)
        force(r)
    print(f"trace in {trace_dir}; now run:\n"
          f"  python tools/parse_trace.py {trace_dir} "
          f"--roofline {args.out} --top 50", flush=True)


if __name__ == "__main__":
    main()
