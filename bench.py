#!/usr/bin/env python
"""Benchmark: Cityscapes-frame inference + fully on-device decode, img/s/chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N,
     "batch1_value": N, "train_value": N, "train_batch": 8}
(train_value = full compiled training-step img/s at ISEG_BENCH_TRAIN_BATCH,
default 8; skip with ISEG_BENCH_SKIP_TRAIN=1.)

`ISEG_BENCH_TRAIN=1` (or --train) benchmarks the FULL compiled training
step instead (on-device targets + 4 losses + grads + Adam, B3 512x1024,
batch ISEG_BENCH_TRAIN_BATCH=4, M=96 instances, P=1024 boundary points) —
still one JSON line, metric name `..._train_imgs_per_sec_per_chip`.
Its vs_baseline compares against the measured torch-CPU reference train
step (tools/bench_reference_train.py -> BENCH_BASELINE.json
reference_train_imgs_per_sec), null if that entry is absent.

Workload (the reference's shipped config): EfficientSeg-B3 at 512x1024
(each processed frame is a 1024x2048 Cityscapes image resized x1/2,
ref configs/trans_cfg.json), bf16 compute, batch 1, followed by the FULL
decode — box decode + class-aware NMS + top-20k boundary peaks + Gaussian
affinity grouping + polygon assembly — all on device (ops/decode.py). The
timed unit is "original frame in -> packed instance polygons on device".

vs_baseline compares against the measured PyTorch reference full-path
(forward + its decode) throughput in BENCH_BASELINE.json
(tools/bench_reference_decode.py, run on this host's CPU since no CUDA
device exists here) — apples-to-apples with the timed unit above. When only
the forward-only baseline entry exists it falls back to that.
"""

from __future__ import annotations

import json
import os
import time


def _force_factory(jax, jnp):
    def force(r):
        # device_get of a leaf slice: the single device stream guarantees all
        # queued work actually finished (block_until_ready has been observed
        # returning early over the axon tunnel for multi-output executables)
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])
    return force


def _measure_train(B: int) -> float:
    """img/s of the FULL compiled training step at batch B (B3 512x1024,
    on-device targets + 4 losses + grads + Adam). Returns img/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.losses import LossConfig
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    force = _force_factory(jax, jnp)
    H, W, M, P = 512, 1024, 96, 1024
    model = EfficientSeg(EfficientSegConfig(
        num_classes=8, compound_coef=3, compute_dtype=jnp.bfloat16))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3),
                               make_optimizer("Adam", 2e-5))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    polys = np.zeros((B, M, 8, 2), np.float32)
    n_verts = np.zeros((B, M), np.int32)
    cls_ids = np.full((B, M), -1, np.int32)
    for b in range(B):
        for m in range(16):
            cy, cx = rng.uniform(80, H - 80), rng.uniform(120, W - 120)
            rh, rw = rng.uniform(20, 70), rng.uniform(30, 100)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang), cx + rw * np.cos(ang)], -1)
            n_verts[b, m] = 8
            cls_ids[b, m] = rng.integers(0, 8)
        polys[b, 16:] = polys[b, 0, 0]
    polys, n_verts, cls_ids = map(jnp.asarray, (polys, n_verts, cls_ids))

    step = make_train_step(model, H, W, LossConfig(), max_points=P, donate=False)
    srng = jax.random.PRNGKey(1)
    force(step(state, images, polys, n_verts, cls_ids, srng))
    iters = 20
    t = time.time()
    r = None
    for _ in range(iters):
        r = step(state, images, polys, n_verts, cls_ids, srng)
    force(r)
    dt = (time.time() - t) / (iters * B)
    return 1.0 / dt


def bench_train():
    """ISEG_BENCH_TRAIN=1 path: one JSON line with the train metric only."""
    B = int(os.environ.get("ISEG_BENCH_TRAIN_BATCH", "4"))
    ips = _measure_train(B)
    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        entry = base.get("reference_train_imgs_per_sec")
        if entry and entry.get("value"):
            vs_baseline = round(ips / float(entry["value"]), 3)
    print(json.dumps({
        "metric": "cityscapes_b3_512x1024_train_imgs_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "img/s",
        "batch": B,
        "vs_baseline": vs_baseline,
    }))


def main():
    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import sys
    if os.environ.get("ISEG_BENCH_TRAIN") or "--train" in sys.argv[1:]:
        return bench_train()
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors,
    )
    from instance_segmentation_tpu.ops.decode import (
        DecodeConfig, forward_and_decode)

    H, W = 512, 1024
    ORIG_H, ORIG_W = 1024, 2048
    # throughput batch: per-image fixed costs (peak selection, NMS scan,
    # assembly) amortize across the batch. The reference's shipped config is
    # batch 1, so both batch 1 (latency) and batch 8 (throughput) are
    # measured and reported in the one JSON line (headline = batch 8).
    BATCH = int(os.environ.get("ISEG_BENCH_BATCH", "8"))
    COMPOUND = 3

    cfg = EfficientSegConfig(num_classes=8, compound_coef=COMPOUND,
                             compute_dtype=jnp.bfloat16,
                             quant=os.environ.get("ISEG_BENCH_QUANT", "none"))
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, H, W, 3), dtype=np.uint8))
    variables = jax.jit(lambda r: model.init({"params": r}, images, train=False))(rng)

    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig()  # shipped decode_cfg.yaml values
    if os.environ.get("ISEG_BENCH_TOPK") == "approx":
        import dataclasses
        dcfg = dataclasses.replace(dcfg, exact_topk=False)

    @jax.jit
    def infer(params, batch_stats, images):
        return forward_and_decode(
            model, {"params": params, "batch_stats": batch_stats}, images,
            anchors, ORIG_H, ORIG_W, 2.0, dcfg)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    force = _force_factory(jax, jnp)

    def measure(batch_images, iters):
        force(infer(params, batch_stats, batch_images))   # warmup / compile
        t = time.time()
        for _ in range(iters):
            dets = infer(params, batch_stats, batch_images)
        force(dets)
        return (iters * batch_images.shape[0]) / (time.time() - t)

    imgs_per_sec = measure(images, 30)
    batch1_ips = None
    if BATCH > 1 and not os.environ.get("ISEG_BENCH_SKIP_B1"):
        batch1_ips = measure(images[:1], 30)

    # serving-shape invocation: weights CLOSED OVER the jit (what the AOT
    # export ships — and what the torch baseline does, its weights being
    # module attributes). Removes the ~300-handle params-tree marshaling
    # per call over the axon tunnel: measured b1 8.51 -> 7.29 ms/call,
    # b8 210.9 -> 224.9 img/s (tools/microbench_serving.py, round 5).
    serving_ips = serving_b1 = None
    if not os.environ.get("ISEG_BENCH_SKIP_SERVING"):
        var_fixed = {"params": params, "batch_stats": batch_stats}

        @jax.jit
        def infer_closed(imgs):
            return forward_and_decode(model, var_fixed, imgs, anchors,
                                      ORIG_H, ORIG_W, 2.0, dcfg)

        def measure_closed(batch_images, iters):
            force(infer_closed(batch_images))
            t = time.time()
            for _ in range(iters):
                dets = infer_closed(batch_images)
            force(dets)
            return (iters * batch_images.shape[0]) / (time.time() - t)

        serving_ips = measure_closed(images, 30)
        if BATCH > 1:
            serving_b1 = measure_closed(images[:1], 30)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if "metric" in base:                     # old single-entry format
            base = {base["metric"]: base}
        entry = (base.get("reference_infer_decode_imgs_per_sec")
                 or base.get("reference_forward_imgs_per_sec"))
        if entry and entry.get("value"):
            vs_baseline = imgs_per_sec / float(entry["value"])

    out = {
        "metric": "cityscapes_1024x2048_infer_decode_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }
    if batch1_ips is not None:
        out["batch1_value"] = round(batch1_ips, 3)
        out["batch"] = BATCH
    if serving_ips is not None:
        out["serving_value"] = round(serving_ips, 3)
    if serving_b1 is not None:
        out["serving_batch1"] = round(serving_b1, 3)
    # train throughput in the SAME line so BENCH_r*.json tracks it per round
    # (round-4 verdict item 5d). ISEG_BENCH_SKIP_TRAIN=1 opts out (e.g. when
    # the compile cache is cold and the b8 train compile would time out).
    if not os.environ.get("ISEG_BENCH_SKIP_TRAIN"):
        tb = int(os.environ.get("ISEG_BENCH_TRAIN_BATCH", "8"))
        out["train_value"] = round(_measure_train(tb), 3)
        out["train_batch"] = tb
    print(json.dumps(out))


if __name__ == "__main__":
    main()
