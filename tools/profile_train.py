#!/usr/bin/env python
"""Train-step cost breakdown on the live backend (TPU by default).

Decomposes one compiled train step (ref train.py:192-227 equivalent) into:
    targets | model fwd+bwd (trivial loss) | per-loss value_and_grad taken
    w.r.t. the model OUTPUTS (so the loss blocks compile in seconds and the
    numbers include each block's backward) | FULL step

Usage:  python tools/profile_train.py [--batch 4] [--compound 3]
        [--ae-window 256 512] [--hw 512 1024]
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
    ap.add_argument("--ae-window", type=int, nargs=2, default=None)
    ap.add_argument("--n-real", type=int, default=16,
                    help="valid instances per image in the synthetic labels")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-step compile (loss blocks only)")
    ap.add_argument("--skip-losses", action="store_true",
                    help="skip the per-loss blocks (model fwd/bwd only)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-s2d", action="store_true",
                    help="disable the U-Net space-to-depth execution path")
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
    from instance_segmentation_tpu.losses.losses import (
        ae_loss, compose_loss, coordinate_grid, det_focal_loss,
        kp_focal_loss_from_points, tangent_loss)
    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.ops.targets import generate_targets
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    H, W = args.hw
    B, M, P = args.batch, args.max_instances, args.max_points
    lcfg = LossConfig(ae_window=tuple(args.ae_window) if args.ae_window else None)

    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16, remat=args.remat,
                             unet_s2d=not args.no_s2d)
    model = EfficientSeg(cfg)
    tx = make_optimizer("Adam", 2e-5)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3), tx)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))

    # synthetic labels: n_real valid boxes/polygons per image
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
            pts = np.stack([cy + rh * np.sin(ang), cx + rw * np.cos(ang)], -1)
            polys[b, m, :, :] = pts
            n_verts[b, m] = 8
            cls_ids[b, m] = rng.integers(0, 8)
        # replication-pad invalid slots with the first vertex
        polys[b, args.n_real:] = polys[b, 0, 0]
    polys, n_verts, cls_ids = map(jnp.asarray, (polys, n_verts, cls_ids))

    tgt_fn = jax.jit(lambda p, n, c: generate_targets(
        p, n, c, H, W, max_points=P, dense_kp=False))
    targets = jax.block_until_ready(tgt_fn(polys, n_verts, cls_ids))

    fwd = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))
    outs = jax.block_until_ready(fwd(state.params, state.batch_stats, images))
    kp, ae, tan, regression, classification = [o.astype(jnp.float32) for o in outs]
    xym = coordinate_grid(H, W)

    # model-only fwd+bwd: grads of a trivial sum-of-outputs loss w.r.t. params
    # (train=True so BN batch stats + mutable state match the real step)
    drng = jax.random.PRNGKey(2)

    def _triv(p, s, x):
        outs, new_vars = model.apply(
            {"params": p, "batch_stats": s}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": drng})
        # tree-leaves: train-mode outputs may be PLANAR (tuples of planes)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree_util.tree_leaves(outs)), new_vars
    triv_g = jax.jit(jax.grad(_triv, has_aux=True))
    fwd_train = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": drng}))

    # per-loss value_and_grad w.r.t. the relevant OUTPUT tensor
    det_g = jax.jit(jax.value_and_grad(
        lambda cr: jnp.sum(jnp.stack(det_focal_loss(
            cr[0], cr[1], anchors, targets.det_ann, lcfg)))))
    kp_g = jax.jit(jax.value_and_grad(
        lambda k: kp_focal_loss_from_points(k, targets)))
    ae_g = jax.jit(jax.value_and_grad(lambda a: ae_loss(a, targets, xym, lcfg)))
    tan_g = jax.jit(jax.value_and_grad(lambda t: tangent_loss(t, targets, lcfg)))
    all_g = jax.jit(jax.value_and_grad(
        lambda o: compose_loss(o, targets, anchors, lcfg)[0]))

    def _force(r):
        # device_get of a leaf slice: the single device stream guarantees all
        # queued work finished (block_until_ready can return early over the
        # axon tunnel for large multi-output executables)
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    jobs = [
        ("model fwd (eval)", fwd, (state.params, state.batch_stats, images)),
        ("model fwd (train)", fwd_train, (state.params, state.batch_stats, images)),
        ("model fwd+bwd (trivial)", triv_g, (state.params, state.batch_stats, images)),
    ]
    kp_pl = kp[..., 0]
    ae_pl = tuple(ae[..., c] for c in range(4))
    tan_pl = tuple(tan[..., c] for c in range(2))
    if not args.skip_losses:
        jobs += [
            ("targets", tgt_fn, (polys, n_verts, cls_ids)),
            ("det loss (g wrt out)", det_g, ((classification, regression),)),
            ("kp loss (g wrt out)", kp_g, (kp,)),
            ("ae loss (g wrt out)", ae_g, (ae,)),
            ("tan loss (g wrt out)", tan_g, (tan,)),
            ("ALL losses (g wrt out)", all_g,
             ((kp, ae, tan, regression, classification),)),
            ("kp loss PLANAR", kp_g, (kp_pl,)),
            ("ae loss PLANAR", ae_g, (ae_pl,)),
            ("tan loss PLANAR", tan_g, (tan_pl,)),
            ("ALL losses PLANAR", all_g,
             ((kp_pl, ae_pl, tan_pl, regression, classification),)),
        ]
    t_full = None
    if not args.skip_full:
        step = make_train_step(model, H, W, lcfg, max_points=P, donate=False)
        srng = jax.random.PRNGKey(1)
        jobs.append(("FULL train step", step,
                     (state, images, polys, n_verts, cls_ids, srng)))

    # compile/warm everything OUTSIDE the trace context: compiles under an
    # active profiler miss the persistent cache (observed: identical programs
    # recompiled from scratch when jax.profiler.trace was open)
    compile_s = {}
    for name, f, xs in jobs:
        t0 = time.perf_counter()
        _force(f(*xs))
        compile_s[name] = time.perf_counter() - t0

    import contextlib
    ctx = jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        for name, f, xs in jobs:
            t = time.perf_counter()
            for _ in range(args.iters):
                r = f(*xs)
            _force(r)
            dt = (time.perf_counter() - t) / args.iters
            print(f"{name:26s} {dt*1e3:9.2f} ms  ({dt*1e3/B:7.2f} ms/img)"
                  f"   [compile {compile_s[name]:.1f}s]", flush=True)
            if name == "FULL train step":
                t_full = dt
    if t_full is not None:
        print(f"train throughput at batch {B}: {B/t_full:.2f} img/s/chip")


if __name__ == "__main__":
    main()
