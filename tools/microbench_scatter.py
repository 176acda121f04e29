#!/usr/bin/env python
"""Cost model for the remaining loss-block scatters (round-4 verdict item 3).

Separates the two candidate costs of the ae_sample_count scatter — dense
buffer size vs scattered-element count — and prices the building blocks a
binned-points Pallas replacement would need (sorts, gathers, compare-sum
ranking). Shapes mirror bench.py's B3 512x1024 batch-4 training step.

Usage: python tools/microbench_scatter.py [--batch 4]
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

    B, M, P = args.batch, 96, 1024
    H, W = 512, 1024
    HW = H * W
    S = M * P                      # 98304 padded slots
    K = 16384                      # compaction budget

    rng = np.random.default_rng(0)
    # ~16 real instances x ~400 valid points, clustered like boundaries
    val = np.zeros((B, S), bool)
    idx_px = np.zeros((B, S), np.int64)
    for b in range(B):
        for m in range(16):
            n = 400
            cy, cx = rng.uniform(64, H - 64), rng.uniform(64, W - 64)
            ys = np.clip(cy + rng.normal(0, 40, n), 0, H - 1).astype(np.int64)
            xs = np.clip(cx + rng.normal(0, 60, n), 0, W - 1).astype(np.int64)
            sl = slice(m * P, m * P + n)
            val[b, sl] = True
            idx_px[b, sl] = ys * W + xs
    mslab = (np.arange(S) // P).astype(np.int64)
    big_idx = np.where(val, idx_px + mslab[None, :] * HW
                       + np.arange(B)[:, None] * (M * HW), B * M * HW)
    small_idx = np.where(val, idx_px + np.arange(B)[:, None] * HW, B * HW)
    big_idx = jnp.asarray(big_idx.reshape(-1), jnp.int32)
    small_idx = jnp.asarray(small_idx.reshape(-1), jnp.int32)
    valj = jnp.asarray(val)
    vals2 = jnp.asarray(rng.normal(size=(B * S, 2)), jnp.float32)

    from instance_segmentation_tpu.ops.compaction import extract_k_indices
    sel = jax.jit(lambda v: extract_k_indices(v, K))(valj)       # [B, K]
    small_idx_bk = jnp.take_along_axis(
        jnp.asarray(np.where(val, idx_px, HW), jnp.int32), sel, axis=1)
    small_idx_k = (small_idx_bk
                   + jnp.arange(B, dtype=jnp.int32)[:, None] * HW).reshape(-1)
    sort_keys = jnp.asarray(rng.integers(0, 512, (B, 4 * K)), jnp.int32)
    field = jnp.asarray(rng.normal(size=(B, HW, 2)), jnp.float32)

    u16 = jnp.uint16
    jobs = [
        ("scatter 393k -> [B*M*HW] u16 (current)",
         lambda i: jnp.zeros((B * M * HW,), u16).at[i].add(u16(1), mode="drop"),
         (big_idx,)),
        ("scatter 393k -> [B*HW] u16 (96x smaller buf)",
         lambda i: jnp.zeros((B * HW,), u16).at[i].add(u16(1), mode="drop"),
         (small_idx,)),
        ("scatter 65k(compacted) -> [B*HW] u16",
         lambda i: jnp.zeros((B * HW,), u16).at[i].add(u16(1), mode="drop"),
         (small_idx_k,)),
        ("scatter 65k(compacted) -> [B*HW] f32x2",
         lambda i: jnp.zeros((B * HW, 2), jnp.float32)
         .at[i].add(vals2[:B * 16384], mode="drop"),
         (small_idx_k,)),
        ("sort [B,16k] i32", lambda x: jnp.sort(x, axis=-1),
         (sort_keys[:, :K],)),
        ("sort [B,64k] i32", lambda x: jnp.sort(x, axis=-1), (sort_keys,)),
        ("argsort [B,16k] i32", lambda x: jnp.argsort(x, axis=-1),
         (sort_keys[:, :K],)),
        ("take_along_axis [B,HW,2] @ [B,16k] rows",
         lambda i: jnp.take_along_axis(field, i[..., None] % HW, axis=1),
         (sel,)),
        ("rank via [B,S=16k,NT=32] compare-cumsum",
         lambda t: _rank(t, 32), (sort_keys[:, :K],)),
    ]

    def _rank(tid, nt):
        # per-point rank among same-tile points: blocked cumsum of the
        # one-hot tile indicator, gathered back at each point's own tile
        oh = (tid[..., None] == jnp.arange(nt, dtype=jnp.int32))    # [B,S,nt]
        from instance_segmentation_tpu.ops.compaction import blocked_cumsum
        c = blocked_cumsum(
            oh.swapaxes(1, 2).reshape(B * nt, -1).astype(jnp.float32))
        c = c.reshape(B, nt, -1)
        return jnp.take_along_axis(c, tid[:, None, :], axis=1)[:, 0, :]

    def force(r):
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])

    for name, f, xs in jobs:
        fj = jax.jit(f)
        t0 = time.perf_counter()
        force(fj(*xs))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fj(*xs)
        force(r)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:46s} {dt * 1e3:8.2f} ms   [compile {comp:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
