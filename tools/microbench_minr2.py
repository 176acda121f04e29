#!/usr/bin/env python
"""Lowering variants of losses._shift_min_r2 (the separable u8 min-distance
pass) timed at bench shapes — the current pad+stack+reduce form measured
7.2 ms at [4,96,512,1024] (~7x off the HBM roofline for its ~1 GB traffic).

Usage: python tools/microbench_minr2.py [--batch 4]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--m", type=int, default=96)
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

    from instance_segmentation_tpu.losses.losses import _R2_BIG, _shift_min_r2

    H, W = args.hw
    B, M = args.batch, args.m
    rng = np.random.default_rng(0)
    cnt = jnp.asarray(
        (rng.random((B, M, H, W)) < 0.001).astype(np.uint16))

    radius = 3
    k = 2 * radius + 1

    def v_tree(imp):
        """Balanced pairwise-minimum tree over the k shifted slices."""
        r2 = jnp.where(imp, jnp.uint8(0), jnp.uint8(_R2_BIG))
        *lead, HH, WW = r2.shape

        def axis_pass(x, axis_len, pad_axis):
            pads = [(0, 0)] * x.ndim
            pads[pad_axis] = (radius, radius)
            p = jnp.pad(x, pads, constant_values=_R2_BIG)
            sl = []
            for i in range(k):
                idx = [slice(None)] * x.ndim
                idx[pad_axis] = slice(i, i + axis_len)
                sl.append(p[tuple(idx)] + jnp.uint8((i - radius) ** 2))
            while len(sl) > 1:
                nxt = [jnp.minimum(sl[j], sl[j + 1])
                       for j in range(0, len(sl) - 1, 2)]
                if len(sl) % 2:
                    nxt.append(sl[-1])
                sl = nxt
            return sl[0]

        col = axis_pass(r2, WW, r2.ndim - 1)
        return axis_pass(col, HH, r2.ndim - 2)

    def v_i32(imp):
        """Same separable pass computed in int32 lanes (u8 vector min may
        lower poorly), cast back to u8 at the end."""
        r2 = jnp.where(imp, jnp.int32(0), jnp.int32(_R2_BIG))
        *lead, HH, WW = r2.shape
        p = jnp.pad(r2, [(0, 0)] * len(lead) + [(0, 0), (radius, radius)],
                    constant_values=_R2_BIG)
        col = functools.reduce(jnp.minimum, [
            p[..., :, i:i + WW] + (i - radius) ** 2 for i in range(k)])
        p = jnp.pad(col, [(0, 0)] * len(lead) + [(radius, radius), (0, 0)],
                    constant_values=_R2_BIG)
        out = functools.reduce(jnp.minimum, [
            p[..., i:i + HH, :] + (i - radius) ** 2 for i in range(k)])
        return out.astype(jnp.uint8)

    def v_rows_first(imp):
        """Row (sublane) pass first, then the lane pass on the half-dense
        intermediate."""
        r2 = jnp.where(imp, jnp.uint8(0), jnp.uint8(_R2_BIG))
        *lead, HH, WW = r2.shape
        p = jnp.pad(r2, [(0, 0)] * len(lead) + [(radius, radius), (0, 0)],
                    constant_values=_R2_BIG)
        row = jnp.min(jnp.stack(
            [p[..., i:i + HH, :] + jnp.uint8((i - radius) ** 2)
             for i in range(k)], axis=0), axis=0)
        p = jnp.pad(row, [(0, 0)] * len(lead) + [(0, 0), (radius, radius)],
                    constant_values=_R2_BIG)
        return jnp.min(jnp.stack(
            [p[..., :, i:i + WW] + jnp.uint8((i - radius) ** 2)
             for i in range(k)], axis=0), axis=0)

    from instance_segmentation_tpu.losses.minr2_pallas import minr2_from_cnt

    has_all = jnp.ones((B, M), jnp.float32)
    # realistic skip pattern: only the first 16 instance slots hold points
    has_16 = jnp.asarray(
        (np.arange(M) < 16)[None, :].repeat(B, 0).astype(np.float32))
    cnt16 = jnp.asarray(np.where((np.arange(M) < 16)[None, :, None, None],
                                 np.asarray(cnt), 0).astype(np.uint16))

    variants = [
        ("current (stack u8)", jax.jit(lambda c: _shift_min_r2(c > 0)), cnt),
        ("tree u8", jax.jit(lambda c: v_tree(c > 0)), cnt),
        ("i32 lanes", jax.jit(lambda c: v_i32(c > 0)), cnt),
        ("rows-first u8", jax.jit(lambda c: v_rows_first(c > 0)), cnt),
        ("pallas slab (all live)",
         jax.jit(lambda c: minr2_from_cnt(c, has_all)), cnt),
        ("xla on 16-live", jax.jit(lambda c: _shift_min_r2(c > 0)), cnt16),
        ("pallas slab (16 live, skip)",
         jax.jit(lambda c: minr2_from_cnt(c, has_16)), cnt16),
    ]

    ref = None
    for name, f, inp in variants:
        t0 = time.perf_counter()
        out = f(inp)
        jax.device_get(jnp.ravel(out)[:1])
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(inp)
        jax.device_get(jnp.ravel(out)[:1])
        dt = (time.perf_counter() - t0) / args.iters
        out_np = np.asarray(jax.device_get(out))
        if ref is None:
            ref = out_np
            ok = "ref"
        elif inp is not cnt:
            ok = "-"        # different input; equality vs ref not meaningful
        else:
            ok = "EXACT" if np.array_equal(
                np.minimum(out_np, 200), np.minimum(ref, 200)) else "DIFF!"
        print(f"{name:22s} {dt * 1e3:8.2f} ms  [{ok}] [compile {comp:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
