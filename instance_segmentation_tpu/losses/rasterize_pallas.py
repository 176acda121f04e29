"""Pallas TPU rasterizer: per-instance sample-count map + min-r2 + union
directly from the packed boundary point list.

Replaces, on the TPU training path:
  * ``losses.ae_sample_count`` — an XLA scatter-add of ~786k u16 units into
    an 805 MB [B*M*HW] buffer. Measured 9.7 ms/iter at batch 8 and
    buffer-PASS-bound (~90 GB/s): compaction, u8, and smaller payloads all
    failed to move it (tools/microbench_scatter{,2}.py).
  * the scatter output's [B, M*HW] -> [B, M, H, W] reshape (2.5 ms/iter —
    a real relayout copy, not metadata).
  * ``_shift_min_r2`` / minr2_pallas — the separable min-squared-distance
    pass (9.2 ms XLA, ~2.5 ms as its own slab kernel).
  * the kp-loss union reduce ``any(cnt > 0, axis=1)`` (1.6 ms/iter over the
    805 MB map).

How: one grid step per (image, instance) slab. The slab's count map is an
exact one-hot matmul on the MXU — cnt[h, w] = sum_p 1[y_p = h] * 1[x_p = w]
(A [H, P] @ B [P, W], bf16 one-hots, f32 accumulation: integer counts
<= P = 1024 are exact) — ~1 GFLOP per LIVE slab; the ~85% padding-slot slabs
skip straight to a memset. r2 follows with the in-register separable
roll/min pass (minr2_pallas semantics, bit-exact vs the XLA oracle), and the
union accumulates across the m-inner grid dimension in VMEM scratch, flushed
once per image.

Encoding: invalid points are pre-encoded OUT OF RANGE (y = H, x = W) so
their one-hot columns are all-zero — no mask input, and exactly
ae_sample_count's drop semantics (valid points are pre-clipped into bounds
exactly like its scatter, ref loss.py:255-265 sample semantics).

Everything is arithmetic (no i1 vectors): Mosaic rejects large boolean
relayouts inside pl.when regions ("Invalid relayout ... replicated in
destination", seen on the first minr2 kernel attempt).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instance_segmentation_tpu.losses.minr2_pallas import _axis_min

INTERPRET = False   # tests set True to run the kernel on CPU

_BIG = 200.0        # matches losses._R2_BIG


def _make_kernel(h, w, m_total, radius):
    def kernel(has_ref, y_ref, x_ref, cnt_ref, r2_ref, uni_ref, uni_acc):
        b = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            uni_acc[:] = jnp.zeros(uni_acc.shape, jnp.float32)

        @pl.when(has_ref[b, m] > 0.0)
        def _():
            y = y_ref[0, m]                                   # [P] i32
            x = x_ref[0, m]
            p = y.shape[0]
            ioh = jax.lax.broadcasted_iota(jnp.int32, (h, p), 0)
            # exact one-hots, arithmetic (|i - y| >= 1 -> 0, == 0 -> 1);
            # one-hot values are exact in either dtype. The matmul dtype is
            # shape-gated: bf16 at production shapes (f32 operands push the
            # kernel ~250 KB over the 16 MB scoped-VMEM limit at
            # 512x1024xP1024), f32 at small shapes (Mosaic rejects the bf16
            # matmul there — "Bad lhs type" for vector<128x128xbf16> — and
            # VMEM is ample). The W axis is split to cap the [P, W] one-hot.
            mm = jnp.bfloat16 if (p >= 256 and h >= 256) else jnp.float32
            am = jnp.clip(1 - jnp.abs(ioh - y[None, :]), 0, 1).astype(
                jnp.float32).astype(mm)                       # [H, P]
            wc = w if w <= 512 else 512
            parts = []
            for j in range(w // wc):
                iow = (jax.lax.broadcasted_iota(jnp.int32, (p, wc), 1)
                       + j * wc)
                bx = jnp.clip(1 - jnp.abs(iow - x[:, None]), 0, 1)
                parts.append(jnp.dot(am, bx.astype(jnp.float32).astype(mm),
                                     preferred_element_type=jnp.float32))
            cnt_f = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
            cnt_ref[0, 0] = cnt_f.astype(jnp.int32).astype(jnp.uint16)
            x0 = jnp.clip(1.0 - cnt_f, 0.0, 1.0) * _BIG       # 0 at points
            col = _axis_min(x0, 1, w, radius)
            r2 = _axis_min(col, 0, h, radius)
            r2_ref[0, 0] = r2.astype(jnp.int32).astype(jnp.uint8)
            uni_acc[:] = jnp.maximum(uni_acc[:], jnp.minimum(cnt_f, 1.0))

        @pl.when(has_ref[b, m] <= 0.0)
        def _():
            cnt_ref[0, 0] = jnp.zeros((h, w), jnp.uint16)
            r2_ref[0, 0] = jnp.full((h, w), int(_BIG), jnp.uint8)

        @pl.when(m == m_total - 1)
        def _():
            uni_ref[0] = uni_acc[:].astype(jnp.int32).astype(jnp.uint8)

    return kernel


def _make_nmap_kernel(h, w, m_total):
    def kernel(has_ref, y_ref, x_ref, n0_ref, n1_ref, out0_ref, out1_ref):
        m = pl.program_id(1)

        # the out blocks are m-invariant (index map drops m), so they stay
        # resident across the m grid: accumulate into them directly — a
        # separate [H, W] f32 scratch pair pushed the kernel 3.2 MB over the
        # 16 MB scoped-VMEM limit at 512x1024.
        @pl.when(m == 0)
        def _():
            out0_ref[0] = jnp.zeros((h, w), jnp.float32)
            out1_ref[0] = jnp.zeros((h, w), jnp.float32)

        b = pl.program_id(0)

        @pl.when(has_ref[b, m] > 0.0)
        def _():
            y = y_ref[0, m]                                   # [P] i32
            x = x_ref[0, m]
            p = y.shape[0]
            ioh = jax.lax.broadcasted_iota(jnp.int32, (h, p), 0)
            # same dtype gate as the cnt kernel: bf16 at production shapes,
            # f32 at small (test) shapes where Mosaic rejects the bf16 dot.
            # The 3-way split below keeps the math exact in either dtype.
            mm = jnp.bfloat16 if (p >= 256 and h >= 256) else jnp.float32
            am = jnp.clip(1 - jnp.abs(ioh - y[None, :]), 0, 1).astype(
                jnp.float32).astype(mm)                       # [H, P] exact
            wc = w
            if w > 256 and w % 256 == 0:
                wc = 256    # cap the [P, wc] one-hot + [H, wc] part
            for c, n_ref, out in ((0, n0_ref, out0_ref), (1, n1_ref, out1_ref)):
                n = n_ref[0, m]                               # [P] f32
                # 3-way bf16 split: n == s0+s1+s2 EXACTLY for normal-range
                # f32 (24 mantissa bits across three 8-bit-mantissa terms —
                # the same decomposition XLA's own HIGHEST-precision f32
                # matmul emulation uses). Each product with the exact 0/1
                # one-hot is exact; accumulation is f32 — so the result
                # equals a f32 scatter-add up to summation ORDER only.
                # Splits kept f32 (Mosaic can't minor-dim-broadcast bf16
                # vectors); every value is bf16-representable, so the
                # f32-multiply + cast of the weighted one-hot stays exact.
                s0 = n.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = n - s0
                s1 = r1.astype(jnp.bfloat16).astype(jnp.float32)
                s2 = (r1 - s1).astype(jnp.bfloat16).astype(jnp.float32)
                for j in range(w // wc):
                    iow = (jax.lax.broadcasted_iota(jnp.int32, (p, wc), 1)
                           + j * wc)
                    bx = jnp.clip(1 - jnp.abs(iow - x[:, None]), 0, 1).astype(
                        jnp.float32)                          # [P, wc] exact
                    part = jnp.zeros((h, wc), jnp.float32)
                    for s in (s0, s1, s2):
                        part = part + jnp.dot(
                            am, (s[:, None] * bx).astype(mm),
                            preferred_element_type=jnp.float32)
                    out[0, :, j * wc:(j + 1) * wc] += part

    return kernel


def rasterize_nmap(points: jnp.ndarray, pt_valid: jnp.ndarray,
                   normals: jnp.ndarray, h: int, w: int):
    """Summed-normal map from the packed point list, on the MXU.

    points [B, M, P, 2] i32 (row, col); pt_valid [B, M, P]; normals
    [B, M, P, 2] f32. Returns (nmap0, nmap1) f32 [B, H, W] equal to
    scatter-adding each valid sample's normal at its (clipped) pixel —
    the tangent-loss target field (ref loss.py:320-351 sample semantics) —
    up to f32 summation order. Replaces the compacted [B*HW] scatter
    pipeline (extract + gathers + 2 scatter-adds under a lax.cond), which
    measured ~12.8 ms/iter at batch 8 on v5e (cond.7 at 0.8% HBM peak);
    the weighted one-hot matmuls are ~0.8 TFLOP of bf16 MXU work.
    """
    B, M, P, _ = points.shape
    y = jnp.where(pt_valid, jnp.clip(points[..., 0], 0, h - 1), h)
    x = jnp.where(pt_valid, jnp.clip(points[..., 1], 0, w - 1), w)
    has = jnp.any(pt_valid, axis=2).astype(jnp.float32)          # [B, M]
    n0 = jnp.where(pt_valid, normals[..., 0], 0.0).astype(jnp.float32)
    n1 = jnp.where(pt_valid, normals[..., 1], 0.0).astype(jnp.float32)
    nmap0, nmap1 = pl.pallas_call(
        _make_nmap_kernel(h, w, M),
        grid=(B, M),
        in_specs=[
            pl.BlockSpec((B, M), lambda b, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, w), jnp.float32),
            jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        ],
        interpret=INTERPRET,
    )(has, y.astype(jnp.int32), x.astype(jnp.int32), n0, n1)
    return nmap0, nmap1


def supported(h, w, p):
    # h*w bound: the kernel holds whole-[H, W] f32 intermediates in VMEM
    # (one-hot matmul output + the two minr2 passes + the union scratch);
    # 512x1024 measures 16.0/16 MB scoped VMEM — larger slabs (e.g. the
    # 1024x2048 full-res frame) must fall back to the XLA scatter pipeline
    return (h % 8 == 0 and w % 128 == 0 and p % 8 == 0
            and (w <= 512 or w % 512 == 0)    # see the W-split in the kernel
            and h * w <= 512 * 1024)


def rasterize_cnt_r2(points: jnp.ndarray, pt_valid: jnp.ndarray,
                     h: int, w: int, radius: int = 3):
    """points [B, M, P, 2] i32 (row, col); pt_valid [B, M, P] bool.

    Returns (cnt u16 [B,M,H,W], r2 u8 [B,M,H,W], union u8 [B,H,W]) with
    cnt == ae_sample_count(...), r2 == _shift_min_r2(cnt > 0) and
    union == any(cnt > 0, axis=1) — bit-exact.
    """
    B, M, P, _ = points.shape
    y = jnp.where(pt_valid, jnp.clip(points[..., 0], 0, h - 1), h)
    x = jnp.where(pt_valid, jnp.clip(points[..., 1], 0, w - 1), w)
    has = jnp.any(pt_valid, axis=2).astype(jnp.float32)          # [B, M]
    cnt, r2, uni = pl.pallas_call(
        _make_kernel(h, w, M, radius),
        grid=(B, M),
        in_specs=[
            pl.BlockSpec((B, M), lambda b, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, P), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, w), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, h, w), jnp.uint16),
            jax.ShapeDtypeStruct((B, M, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((B, h, w), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        interpret=INTERPRET,
    )(has, y.astype(jnp.int32), x.astype(jnp.int32))
    return cnt, r2, uni
