#!/usr/bin/env python
"""Round-5 scatter-variant pricing: the two remaining loss-block scatters
measured on the b8 roofline (tools/roofline_train.py) are

  * tangent nmap: compacted [B,16k] f32x2 scatter-add -> [B*HW, 2]
    (cond.5 + fusion.6: ~14 ms/iter at batch 8)
  * ae cnt: full [B, M*P] u16 unit scatter -> [B*M*HW]
    (fusion.7: 8.9 ms/iter at batch 8, ~90 GB/s -> buffer-pass-bound)

Variants priced here, at batch-8 shapes:
  nmap: (a) current f32x2, (b) two separate f32x1 scatters,
        (c) one f32x1 scatter with channel folded into the index,
        (d) sort-by-pixel + segment-sum + unique-index scatter
  cnt:  (e) current u16 big-buffer, (f) compacted u16 big-buffer,
        (g) u8 buffer (overflow-unsafe; pricing only)

Usage: python tools/microbench_scatter2.py [--batch 8]
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
    S = M * P
    K = 16384

    rng = np.random.default_rng(0)
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
    big_idx = jnp.asarray(big_idx.reshape(-1), jnp.int32)
    valj = jnp.asarray(val)

    from instance_segmentation_tpu.ops.compaction import extract_k_indices
    sel = jax.jit(lambda v: extract_k_indices(v, K))(valj)          # [B, K]
    live = np.asarray(
        jnp.arange(K)[None, :] < jnp.sum(valj, 1, dtype=jnp.int32)[:, None])
    idx_k = np.take_along_axis(np.where(val, idx_px, HW), np.asarray(sel), 1)
    idx_k = np.where(live, idx_k + np.arange(B)[:, None] * HW, B * HW)
    idx_k = jnp.asarray(idx_k.reshape(-1), jnp.int32)               # [B*K]
    big_idx_k = np.take_along_axis(
        np.where(val, idx_px + mslab[None, :] * HW, M * HW), np.asarray(sel), 1)
    big_idx_k = np.where(live, big_idx_k + np.arange(B)[:, None] * (M * HW),
                         B * M * HW)
    big_idx_k = jnp.asarray(big_idx_k.reshape(-1), jnp.int32)
    nrm = jnp.asarray(rng.normal(size=(B * K, 2)), jnp.float32)

    u16, u8 = jnp.uint16, jnp.uint8
    jobs = [
        ("nmap f32x2 (current compact branch)",
         lambda i, v: jnp.zeros((B * HW, 2), jnp.float32)
         .at[i].add(v, mode="drop"), (idx_k, nrm)),
        ("nmap 2x f32x1",
         lambda i, v: (jnp.zeros((B * HW,), jnp.float32)
                       .at[i].add(v[:, 0], mode="drop"),
                       jnp.zeros((B * HW,), jnp.float32)
                       .at[i].add(v[:, 1], mode="drop")), (idx_k, nrm)),
        ("nmap f32x1 channel-in-index",
         lambda i, v: jnp.zeros((B * HW * 2,), jnp.float32)
         .at[jnp.concatenate([i * 2, i * 2 + 1])]
         .add(jnp.concatenate([v[:, 0], v[:, 1]]), mode="drop"),
         (idx_k, nrm)),
        ("nmap sort+segsum+scatter-unique",
         None, (idx_k, nrm)),
        ("cnt u16 full 786k -> [B*M*HW] (current)",
         lambda i: jnp.zeros((B * M * HW,), u16).at[i].add(u16(1), mode="drop"),
         (big_idx,)),
        ("cnt u16 compact 131k -> [B*M*HW]",
         lambda i: jnp.zeros((B * M * HW,), u16).at[i].add(u16(1), mode="drop"),
         (big_idx_k,)),
        ("cnt u8 compact 131k -> [B*M*HW]",
         lambda i: jnp.zeros((B * M * HW,), u8).at[i].add(u8(1), mode="drop"),
         (big_idx_k,)),
    ]

    def sort_segsum(i, v):
        # sort samples by pixel, prefix-sum values, emit per-unique-pixel
        # totals at the segment ends, scatter those (still duplicates-free)
        order = jnp.argsort(i)
        si = i[order]
        sv = v[order]
        cs = jnp.cumsum(sv, axis=0)
        is_end = jnp.concatenate([si[1:] != si[:-1], jnp.array([True])])
        start = jnp.concatenate(
            [jnp.zeros((1, 2), v.dtype),
             jnp.where(is_end[:-1, None], cs[:-1], 0.0)])
        # total per segment = cs[end] - cs[start-1]; do it with a second pass
        seg_tot = cs - jnp.cumsum(start, axis=0) * 0  # placeholder; see note
        out = jnp.zeros((B * HW, 2), jnp.float32)
        return out.at[jnp.where(is_end, si, B * HW)].add(
            jnp.where(is_end[:, None], seg_tot, 0.0), mode="drop")

    jobs[3] = ("nmap sort+segsum+scatter-unique", sort_segsum, (idx_k, nrm))

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

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
