#!/usr/bin/env python
"""Microbench: exact_topk_indices variants on the live backend.

Compares the shipped implementation (18-step u32 bisect) against
lax.top_k and a 3-pass 256-way partition variant, at bench-relevant
shapes (B x 512*1024, k=20000).

Measured on TPU v5e (2026-08-18):
    B=1 current(bisect)   1.7 ms   partition256   6.8 ms   lax.top_k  5.5 ms
    B=8 current(bisect)   5.5 ms   partition256  29.5 ms   lax.top_k  5.4 ms

The partition form shipped briefly in round 3 on the theory that 18 small
serial kernels were latency-bound at batch 1; in fact the VPU compare-
reduce WORK dominates at both batch sizes (N*T*3 vs N*18 comparisons),
so the bisect wins everywhere and is kept.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
import jax

if os.environ.get("ISEG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from instance_segmentation_tpu.ops.compaction import (
    blocked_cumsum, extract_k_indices)
from instance_segmentation_tpu.ops.decode import (
    _monotonic_u32, exact_topk_indices)


def partition_topk(flat, k):
    """3 unrolled 256-way partition passes (the rejected round-3 variant)."""
    B, N = flat.shape
    k = min(k, N)
    u = _monotonic_u32(flat)
    T = 256
    lo = jnp.zeros((B,), jnp.uint32)
    hi = jnp.full((B,), jnp.uint32(0xFFFFFFFF))
    j = jnp.arange(1, T, dtype=jnp.uint32)
    for _ in range(3):
        step = (hi - lo) // T
        mids = lo[:, None] + j[None, :] * step[:, None]
        cnt = jnp.sum((u[:, :, None] > mids[:, None, :]).astype(jnp.int32),
                      axis=1)
        ngt = jnp.sum((cnt > k).astype(jnp.uint32), axis=1)
        new_lo = lo + ngt * step
        new_hi = jnp.where(ngt == T - 1, hi, lo + (ngt + 1) * step)
        lo, hi = new_lo, new_hi
    gt = u > hi[:, None]
    band = (u > lo[:, None]) & ~gt
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    tie_rank = blocked_cumsum(band.astype(jnp.float32))
    mask = gt | (band & (tie_rank <= (k - n_gt)))
    idx = extract_k_indices(mask, k)
    vals = jnp.take_along_axis(flat, idx, axis=1)
    return vals, idx


def main():
    k = 20000
    rng = np.random.default_rng(0)
    for B in (1, 8):
        x = jnp.asarray(rng.normal(size=(B, 512 * 1024)).astype(np.float32))
        fns = {
            "current": jax.jit(lambda a: exact_topk_indices(a, k)),
            "partition256": jax.jit(lambda a: partition_topk(a, k)),
            "lax.top_k": jax.jit(lambda a: jax.lax.top_k(a, k)),
            "approx_max_k": jax.jit(
                lambda a: jax.lax.approx_max_k(a, k, recall_target=0.95)),
            "approx_r80": jax.jit(
                lambda a: jax.lax.approx_max_k(a, k, recall_target=0.80)),
        }
        for name, fn in fns.items():
            r = fn(x)
            jax.device_get(jnp.ravel(r[0])[:1])
            iters = 30
            t = time.time()
            for _ in range(iters):
                r = fn(x)
            jax.device_get(jnp.ravel(r[0])[:1])
            dt = (time.time() - t) / iters * 1e3
            print(f"B={B} {name:12s} {dt:8.3f} ms")


if __name__ == "__main__":
    main()
