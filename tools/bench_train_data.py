#!/usr/bin/env python
"""END-TO-END from-disk training throughput (round-2 verdict item 3).

The headline training number (bench.py --train) feeds device-resident
synthetic batches; this tool measures the honest from-disk path: a packed
synthetic Cityscapes set on disk -> BatchLoader (+ optional .npy image
cache) -> device_prefetch double buffering -> the full compiled train step,
reporting img/s INCLUDING data loading on this 1-core host.

Modes (ref train.py:185-196 data-time meters are the comparison point):
  --mode packed   packed labels + cached pre-resized .npy images (the
                  documented offline train path, tools/preprocess_cityscapes)
  --mode json     raw PNGs + gtFine json parsed/packed per step on the host
                  (the reference-style online path)

Prints one JSON line {"from_disk_imgs_per_sec": ..., "data_stall_frac": ...}.

Usage: python tools/bench_train_data.py [--mode packed] [--images 32]
       [--steps 30] [--batch 4] [--compound 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(mode: str, images: int, steps: int, batch: int, compound: int,
         out: str, data_only: bool = False):
    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from make_synthetic_cityscapes import generate
    from instance_segmentation_tpu.configs import Configer
    from instance_segmentation_tpu.data import get_dataloader
    from instance_segmentation_tpu.data.registry import device_prefetch
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer
    from instance_segmentation_tpu.transforms import CommonTransforms

    root = os.path.join(out, "data")
    if not os.path.isdir(root):
        # full-res Cityscapes frames (1024x2048) so host decode cost is real
        generate(root, splits=(("train", images),), h=1024, w=2048, seed=7,
                 instances=(8, 16))
    packed_dir = os.path.join(root, "packed", "train")
    if mode == "packed" and not os.path.isdir(packed_dir):
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "preprocess_cityscapes.py"),
                        "--root", root, "--subset", "train", "--out", packed_dir,
                        "--target_size", "2", "--max_instances", "96",
                        "--max_verts", "256", "--cache_images"], check=True)

    H, W, M, P = 512, 1024, 96, 1024
    trans = Configer({
        "train_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]}})

    if mode == "packed":
        loader = get_dataloader(batch, "cityscapes_packed", root, "train",
                                max_instances=M, max_verts=256, seed=0)
    else:
        loader = get_dataloader(batch, "cityscapes", root, "train",
                                transforms=CommonTransforms(trans, "train", seed=0),
                                max_instances=M, max_verts=256, seed=0)

    if data_only:
        # host-side loader rate in isolation (no device work): measures the
        # decode/augment/pack ceiling of this host — the data-side bound on
        # any from-disk train throughput
        n, t0 = 0, time.time()
        rounds = 0
        while n < steps * batch:
            for images_b, packed_b, _ in loader:
                n += images_b.shape[0]
                if n >= steps * batch:
                    break
            rounds += 1
            if rounds > 100:
                break
        dt = time.time() - t0
        print(json.dumps({
            "mode": mode, "data_only": True,
            "host_loader_imgs_per_sec": round(n / dt, 3),
            "batch": batch, "images_seen": n,
        }))
        return

    model = EfficientSeg(EfficientSegConfig(
        num_classes=8, compound_coef=compound, compute_dtype=jnp.bfloat16))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3),
                               make_optimizer("Adam", 2e-5))
    step = make_train_step(model, H, W, max_points=P)
    rng = jax.random.PRNGKey(1)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    # warmup/compile on the first batch
    it = iter(loader)
    images0, packed0, _ = next(it)
    rng, k = jax.random.split(rng)
    s2, stats = step(state, jnp.asarray(images0), jnp.asarray(packed0.polys),
                     jnp.asarray(packed0.n_verts), jnp.asarray(packed0.cls_ids), k)
    force(stats)

    done, t0 = 0, time.time()
    stats = None
    while done < steps:
        for images_b, packed_b, _ in device_prefetch(loader):
            rng, k = jax.random.split(rng)
            state, stats = step(state, images_b, packed_b.polys,
                                packed_b.n_verts, packed_b.cls_ids, k)
            done += 1
            if done >= steps:
                break
        if done == 0:
            raise RuntimeError("empty loader")
    force(stats)
    dt = time.time() - t0
    ips = done * batch / dt

    # device-only comparison: same step on resident copies of the last batch
    imgs_r = jax.device_put(np.asarray(images_b))
    p_r = jax.tree.map(jax.device_put, packed_b)
    force(step(state, imgs_r, p_r.polys, p_r.n_verts, p_r.cls_ids, k))
    t1 = time.time()
    for _ in range(10):
        _, stats = step(state, imgs_r, p_r.polys, p_r.n_verts, p_r.cls_ids, k)
    force(stats)
    ips_resident = 10 * batch / (time.time() - t1)

    print(json.dumps({
        "mode": mode,
        "from_disk_imgs_per_sec": round(ips, 3),
        "device_resident_imgs_per_sec": round(ips_resident, 3),
        "data_stall_frac": round(max(0.0, 1.0 - ips / ips_resident), 3),
        "batch": batch, "steps": done,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("packed", "json"), default="packed")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--out", default="/tmp/iseg_dbench")
    ap.add_argument("--data_only", action="store_true",
                    help="measure the host loader rate only (no device work)")
    a = ap.parse_args()
    main(a.mode, a.images, a.steps, a.batch, a.compound, a.out, a.data_only)
