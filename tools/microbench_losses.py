#!/usr/bin/env python
"""Per-piece timing of the training-loss internals at bench shapes.

Decomposes the ~30 ms (b4) loss block (round-3 verdict item 3) into its
actual pieces — the ae_sample_count scatter, the separable min-distance
pass, the Pallas AE fwd/bwd, the kp-from-cnt focal, the tangent scatter —
each timed standalone (fwd, and fwd+bwd where it carries gradients).

Usage: python tools/microbench_losses.py [--batch 4] [--hw 512 1024]
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
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--max-instances", type=int, default=96)
    ap.add_argument("--max-points", type=int, default=1024)
    ap.add_argument("--n-real", type=int, default=16)
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

    from instance_segmentation_tpu.losses import LossConfig
    from instance_segmentation_tpu.losses import ae_pallas
    from instance_segmentation_tpu.losses.losses import (
        _NEG4_TABLE, _ae_instance_focal_dense, _ae_pull_term, _shift_min_r2,
        ae_loss, ae_sample_count, coordinate_grid, det_focal_loss,
        kp_focal_loss_from_cnt, tangent_loss)
    from instance_segmentation_tpu.ops.targets import generate_targets

    H, W = args.hw
    B, M, P = args.batch, args.max_instances, args.max_points
    lcfg = LossConfig()
    xym = coordinate_grid(H, W)

    rng = np.random.default_rng(0)
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
    targets = jax.block_until_ready(jax.jit(lambda p, n, c: generate_targets(
        p, n, c, H, W, max_points=P, dense_kp=False))(polys, n_verts, cls_ids))

    kp = jnp.asarray(rng.normal(-2, 1, (B, H, W, 1)), jnp.float32)
    ae = jnp.asarray(rng.normal(0, 0.5, (B, H, W, 4)), jnp.float32)

    cnt_fn = jax.jit(lambda t: ae_sample_count(t, H, W))
    cnt = jax.block_until_ready(cnt_fn(targets))
    r2_fn = jax.jit(lambda c: _shift_min_r2(c > 0))
    anyp_fn = jax.jit(ae_pallas._any_points)

    ae_fwd = jax.jit(lambda a, c: ae_loss(a, targets, xym, lcfg, c))
    ae_g = jax.jit(jax.value_and_grad(
        lambda a, c: ae_loss(a, targets, xym, lcfg, c)))
    ae_dense_g = jax.jit(jax.value_and_grad(
        lambda a, c: _ae_instance_focal_dense(a, targets, xym, "dense", c)[0]
        .sum()))
    pull_g = jax.jit(jax.value_and_grad(
        lambda a: _ae_pull_term(a, targets, xym).sum()))
    kp_g = jax.jit(jax.value_and_grad(
        lambda k, c: kp_focal_loss_from_cnt(k, c)))
    tan_g = jax.jit(jax.value_and_grad(
        lambda t: tangent_loss(t, targets, lcfg)))

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    jobs = [
        ("ae_sample_count (scatter)", cnt_fn, (targets,)),
        ("shift_min_r2 (u8 min pass)", r2_fn, (cnt,)),
        ("any_points tables", anyp_fn, (cnt,)),
        ("ae_loss fwd (pallas path)", ae_fwd, (ae, cnt)),
        ("ae_loss fwd+bwd (pallas)", ae_g, (ae, cnt)),
        ("ae focal fwd+bwd (XLA dense)", ae_dense_g, (ae, cnt)),
        ("ae pull fwd+bwd (XLA)", pull_g, (ae,)),
        ("kp_from_cnt fwd+bwd", kp_g, (kp, cnt)),
        ("tangent fwd+bwd", tan_g, (ae[..., :2],)),
    ]
    for name, f, xs in jobs:
        t0 = time.perf_counter()
        force(f(*xs))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
        force(r)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:30s} {dt * 1e3:8.2f} ms   [compile {comp:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
