"""Pallas TPU kernel for the separable min-squared-distance pass.

Computes ``losses._shift_min_r2(cnt > 0)`` — the uint8 map of min
dy^2 + dx^2 to a boundary-sample pixel within the radius-3 max-norm window
(the reference gaussian stamp support, ref target_generator.py:274-278 /
loss.py:288-295 semantics) — directly from the u16 per-instance sample-count
map, one [H, W] slab per grid step.

Why: every XLA lowering of the shifted-min measured ~7 ms at B3 batch-4
shapes (tools/microbench_minr2.py: stacked-u8 7.41, pairwise-tree 7.09,
rows-first 6.98, i32 20.8) — 5-7x off the HBM roofline for its ~1 GB of
logical traffic, because the 7-slice stacked min materializes intermediate
copies. Here each (image, instance) slab streams through VMEM once:
read u16 [H, W], two in-register roll/min passes, write u8 [H, W] — and
slabs of instances with NO valid boundary points (the ~85% padding slots of
the [B, M] instance axis) skip the compute entirely and just store the BIG
sentinel.

Exactness: integer min/add in f32 (values <= 218 << 2^24) — bit-identical
to the XLA path's u8 arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False   # tests set True to run the kernel on CPU

_BIG = 200.0        # matches losses._R2_BIG


def _roll(x, shift, axis):
    if INTERPRET:
        # pltpu.roll has no CPU-interpret lowering; jnp.roll matches it
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift % x.shape[axis], axis)   # pltpu needs shift >= 0


def _axis_min(x, axis, size, radius):
    """min over o in [-radius, radius] of (x shifted by o along axis) + o^2,
    with out-of-range neighbours penalized by +BIG (the reference stamp clips
    at borders; a penalized term is >= BIG + o^2 > 200 so it can never win
    against the always-valid o=0 term, which is <= 200 — exactly the XLA
    oracle's BIG-padding semantics). Arithmetic masks, no i1 vectors: Mosaic
    miscompiles/rejects large boolean relayouts inside pl.when regions."""
    idxf = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis).astype(
        jnp.float32)
    r = x
    for o in range(1, radius + 1):
        # pen_hi = BIG where idx >= size - o (wrapped lanes of the -o roll)
        pen_hi = jnp.clip(idxf - float(size - 1 - o), 0.0, 1.0) * _BIG
        # pen_lo = BIG where idx < o (wrapped lanes of the +o roll)
        pen_lo = jnp.clip(float(o) - idxf, 0.0, 1.0) * _BIG
        plus = _roll(x, -o, axis) + pen_hi                           # x[j+o]
        minus = _roll(x, o, axis) + pen_lo                           # x[j-o]
        r = jnp.minimum(r, jnp.minimum(plus, minus) + float(o * o))
    return r


def _make_kernel(h, w, radius):
    def kernel(has_ref, cnt_ref, out_ref):
        b = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(has_ref[b, m] > 0.0)
        def _():
            # x = 0 at point pixels, BIG elsewhere — arithmetic, no i1 mask
            # (u16 -> f32 has no direct Mosaic cast; hop through i32)
            cf = cnt_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
            x = jnp.clip(1.0 - cf, 0.0, 1.0) * _BIG              # f32 [H, W]
            col = _axis_min(x, 1, w, radius)                     # lanes
            out = _axis_min(col, 0, h, radius)                   # sublanes
            # Mosaic has no f32 -> u8 cast; chain through i32 (exact ints)
            out_ref[0, 0] = out.astype(jnp.int32).astype(jnp.uint8)

        @pl.when(has_ref[b, m] <= 0.0)
        def _():
            out_ref[0, 0] = jnp.full((h, w), int(_BIG), jnp.uint8)

    return kernel


def supported(h, w):
    return h % 8 == 0 and w % 128 == 0


def minr2_from_cnt(cnt: jnp.ndarray, has_pts: jnp.ndarray,
                   radius: int = 3) -> jnp.ndarray:
    """cnt [B, M, H, W] u16; has_pts [B, M] f32 (1.0 where the instance has
    any valid boundary point — slabs with 0 skip compute). Returns the u8
    min-r2 map, bit-identical to ``_shift_min_r2(cnt > 0)``."""
    B, M, H, W = cnt.shape
    return pl.pallas_call(
        _make_kernel(H, W, radius),
        grid=(B, M),
        in_specs=[
            # whole [B, M] table in SMEM (a (1, M) window would violate the
            # "last two block dims divisible by (8, 128) or equal to the
            # array dims" Mosaic rule); indexed by program ids in-kernel
            pl.BlockSpec((B, M), lambda b, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, H, W), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, m: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, H, W), jnp.uint8),
        interpret=INTERPRET,
    )(has_pts, cnt)
