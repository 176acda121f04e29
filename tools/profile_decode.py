#!/usr/bin/env python
"""Stage-by-stage decode timing on the live backend (TPU by default).

Times each decode stage as its own jitted function (block_until_ready
between) so the per-stage costs of ops/decode.py are visible:
    forward | boxes+NMS | peak top-k | affinity group | assembly | full

Usage:  python tools/profile_decode.py [--batch 8] [--compound 3]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
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
    from instance_segmentation_tpu.losses.losses import coordinate_grid
    from instance_segmentation_tpu.ops import decode as D

    H, W = args.hw
    B = args.batch
    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.bfloat16)
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (B, H, W, 3), dtype=np.uint8))
    variables = jax.jit(lambda r: model.init({"params": r}, images,
                                             train=False))(rng)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = D.DecodeConfig()

    fwd = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False))
    outs = jax.block_until_ready(fwd(params, batch_stats, images))
    kp, ae, tan, regression, classification = outs

    boxes_fn = jax.jit(lambda c, r: D.decode_boxes(c, r, anchors, H, W, dcfg))
    boxes, scores, classes, det_valid = jax.block_until_ready(
        boxes_fn(classification, regression))

    peaks_fn = jax.jit(lambda k: D.select_peaks_batch(k[..., 0], dcfg.kp_th,
                                                      exact=dcfg.exact_topk))
    flat_idx, kp_ok = jax.block_until_ready(peaks_fn(kp))

    def group(kp_rc_args):
        kp_, ae_, flat_idx_, boxes_, det_valid_ = kp_rc_args
        xym = coordinate_grid(H, W)
        rr = (flat_idx_ // W).astype(jnp.float32)
        cc = (flat_idx_ % W).astype(jnp.float32)
        kp_rc = jnp.stack([rr, cc], axis=-1)
        ae_flat = jnp.take_along_axis(ae_.reshape(B, -1, 4),
                                      flat_idx_[..., None], axis=1)
        xym_flat = jnp.take_along_axis(
            jnp.broadcast_to(xym.reshape(1, -1, 2), (B, H * W, 2)),
            flat_idx_[..., None], axis=1)
        emb = jnp.tanh(ae_flat[..., 0:2]) + xym_flat
        sig = jnp.exp(ae_flat[..., 2:4])
        ci = jnp.clip(((boxes_[..., 1] + boxes_[..., 3]) / 2).astype(jnp.int32), 0, H - 1)
        cj = jnp.clip(((boxes_[..., 0] + boxes_[..., 2]) / 2).astype(jnp.int32), 0, W - 1)
        c_emb = xym[ci, cj]
        contained = ((kp_rc[..., 0:1] >= boxes_[..., None, :, 1]) &
                     (kp_rc[..., 0:1] <= boxes_[..., None, :, 3]) &
                     (kp_rc[..., 1:2] >= boxes_[..., None, :, 0]) &
                     (kp_rc[..., 1:2] <= boxes_[..., None, :, 2]))
        contained = contained & det_valid_[:, None, :]
        dists = jnp.exp(-jnp.sum(
            (emb[:, :, None, :] - c_emb[:, None, :, :]) ** 2 * sig[:, :, None, :],
            axis=-1))
        scored = dists * contained.astype(jnp.float32)
        return jnp.argmax(scored, axis=-1), kp_rc

    group_fn = jax.jit(group)
    assign, kp_rc = jax.block_until_ready(
        group_fn((kp, ae, flat_idx, boxes, det_valid)))

    asm_fn = jax.jit(lambda a: D.assemble_objects(
        a[0], a[1], a[2], a[3], a[4], H, W, 2 * H, 2 * W, 2.0, dcfg))
    _ = jax.block_until_ready(asm_fn((kp_rc, kp_ok, assign, boxes, det_valid)))

    full_fn = jax.jit(lambda o: D.decode_output(o, anchors, 2 * H, 2 * W, 2.0, dcfg))
    _ = jax.block_until_ready(full_fn(outs))

    def bench(name, f, *xs):
        f(*xs)
        jax.block_until_ready(f(*xs))
        t = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t) / args.iters
        print(f"{name:18s} {dt*1e3:8.2f} ms  ({dt*1e3/B:6.2f} ms/img)")
        return dt

    import contextlib
    ctx = contextlib.nullcontext()
    if args.trace:
        ctx = jax.profiler.trace(args.trace)
    with ctx:
        bench("forward", fwd, params, batch_stats, images)
        bench("boxes+nms", boxes_fn, classification, regression)
        bench("peak_topk", peaks_fn, kp)
        bench("group", group_fn, (kp, ae, flat_idx, boxes, det_valid))
        bench("assembly", asm_fn, (kp_rc, kp_ok, assign, boxes, det_valid))
        t_full = bench("FULL fwd+decode", full_fn, outs)
    print(f"throughput at batch {B}: {B/t_full:.1f} img/s (decode only)")


if __name__ == "__main__":
    main()
