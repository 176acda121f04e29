"""Pallas TPU kernels for the AE loss (focal + pull terms).

Computes the same per-element math as the XLA dense formulations in
``losses`` (ref AELoss models/loss.py:248-317 semantics), but tiles the
embedding fields through VMEM ONCE and loops instances on-chip, skipping
(tile, instance) pairs whose focal window misses the tile. The XLA paths
broadcast-read the [B,H,W,2] embed/sigma fields M times from HBM and push
the pull term through serializing per-sample gathers/scatter-adds; here one
fused pair of kernels does focal fwd / focal+pull bwd in a few HBM passes.

The pull term (ref :307-311) is evaluated densely by pixel: samples of an
instance at the same pixel share their affinity value, so
``sum_s |d_own - d_max|`` == ``sum_p cnt[m,p] * |d(p,m) - max_m' d(p,m')|``
with ``cnt`` the exact per-pixel sample count (scatter-added u16, <= P).
max ties resolve to the first max (measure-zero difference vs the XLA
equal-split subgradient).

Inputs per image: the u8 min-distance map r2 (losses._shift_min_r2), the
u16 count map, a [8, MPAD] per-instance scalar table (SMEM), and a per-tile
any-points flag that gates the pull machinery (d_max competes across ALL
valid centers, so it cannot window-skip — but it is only needed at pixels
that hold boundary samples).

Forward returns (pos, neg, npos, pull) per [B, M]; the hand-written VJP
runs the backward kernel producing d(ey, ex, sy, sx). npos is a count
(piecewise constant), so its cotangent is dropped — exactly like autodiff
over the dense formulation's bool sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-4
INTERPRET = False   # tests set True to run the kernels on CPU
_TH = 32        # tile rows (sublanes); r2+cnt blocks (M,TH,TW) must fit VMEM
_TW = 512       # tile cols (lanes)
_MPAD = 128     # instance axis padded to the lane tile for the [B, M] outputs

# rows of the per-instance scalar table
_CY, _CX, _LT0, _LT1, _RB0, _RB1, _VALID = range(7)
_TROWS = 8


def _neg_w4_of(r2i, table):
    """(1 - gaussian_target)^4 from the u8 squared distance, matching the
    f32-rounded lookup in losses._NEG4_TABLE."""
    w = jnp.float32(1.0)
    for r2v, t4 in table:
        w = jnp.where(r2i == r2v, jnp.float32(t4), w)
    return w


def _window_hit(tab_ref, m, i, j):
    return ((tab_ref[0, _LT0, m] < (i + 1) * _TH) &
            (tab_ref[0, _RB0, m] > i * _TH) &
            (tab_ref[0, _LT1, m] < (j + 1) * _TW) &
            (tab_ref[0, _RB1, m] > j * _TW) &
            (tab_ref[0, _VALID, m] > 0.0))


def _tile_hit(tab_ref, cntp_ref, nw, m, i, j):
    """Process (tile, instance) if the focal window overlaps the tile OR the
    instance has boundary samples in it. The second clause matters for
    border-clipped instances whose bbox-midpoint window misses some of their
    in-bounds samples: the pull term sums over ALL sample pixels (ref AELoss
    var term loss.py:307-311 is unwindowed), while the focal terms mask by
    the window internally, so the extra tiles contribute 0 to them.

    cntp is [B, M, nh*nw] (tile axis flattened): an SMEM window keeps its
    LAST dim padded to 128 lanes, so a [1, M, nh, nw] block would cost
    M*nh*128 f32 x2 buffers — over the 1 MiB SMEM budget at 512x1024/M=96.
    Flat, the padded block is M*max(nh*nw,128) f32: ~98 KiB."""
    return _window_hit(tab_ref, m, i, j) | (cntp_ref[0, m, i * nw + j] > 0.0)


def _make_fwd_kernel(m_real, table, nw):
    def kernel(tab_ref, anyp_ref, cntp_ref, ey_ref, ex_ref, sy_ref, sx_ref,
               r2_ref, cnt_ref, out_ref, acc_ref, dmax_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)
        last = ((i == pl.num_programs(1) - 1) & (j == pl.num_programs(2) - 1))

        @pl.when((i == 0) & (j == 0))
        def _():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        ey = ey_ref[0]                               # [TH, TW] f32
        ex = ex_ref[0]
        sy = sy_ref[0]
        sx = sx_ref[0]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
                + i * _TH).astype(jnp.float32)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
                + j * _TW).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _MPAD), 1)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, _MPAD), 0)
        any_pts = anyp_ref[0, i, j] > 0

        # pass A: d_max over ALL valid centers (no window — any center may
        # win at a sample pixel); only needed where the tile holds samples
        dmax_ref[:] = jnp.zeros(dmax_ref.shape, jnp.float32)

        @pl.when(any_pts)
        def _():
            def amax_body(m, _):
                @pl.when(tab_ref[0, _VALID, m] > 0.0)
                def _():
                    dy = ey - tab_ref[0, _CY, m]
                    dx = ex - tab_ref[0, _CX, m]
                    d = jnp.exp(-(dy * dy * sy + dx * dx * sx))
                    dmax_ref[:] = jnp.maximum(dmax_ref[:], d)
                return 0
            jax.lax.fori_loop(0, m_real, amax_body, 0)

        def body(m, _):
            @pl.when(_tile_hit(tab_ref, cntp_ref, nw, m, i, j))
            def _():
                r2 = r2_ref[0, m].astype(jnp.int32)      # [TH, TW]
                cnt = cnt_ref[0, m].astype(jnp.int32).astype(jnp.float32)
                win = ((rows >= tab_ref[0, _LT0, m]) & (rows < tab_ref[0, _RB0, m]) &
                       (cols >= tab_ref[0, _LT1, m]) & (cols < tab_ref[0, _RB1, m]))
                dy = ey - tab_ref[0, _CY, m]
                dx = ex - tab_ref[0, _CX, m]
                d = jnp.exp(-(dy * dy * sy + dx * dx * sx))
                pred = jnp.clip(d, _EPS, 1.0 - _EPS)
                wf = win.astype(jnp.float32)
                posm = (cnt > 0) & win
                neg_w4 = _neg_w4_of(r2, table)
                neg = jnp.sum(jnp.log(1.0 - pred) * pred * pred * neg_w4 * wf)
                pos = jnp.sum(jnp.where(posm, jnp.log(pred) * (1.0 - pred) ** 2, 0.0))
                npos = jnp.sum(posm.astype(jnp.float32))
                pull = jnp.sum(cnt * jnp.abs(d - dmax_ref[:]))
                # scalar stores to VMEM are unsupported; place the per-m sums
                # into lane m of rows 0..3 via a one-hot vector update
                oh = (lane == m)
                upd = (jnp.where(oh & (row8 == 0), pos, 0.0)
                       + jnp.where(oh & (row8 == 1), neg, 0.0)
                       + jnp.where(oh & (row8 == 2), npos, 0.0)
                       + jnp.where(oh & (row8 == 3), pull, 0.0))
                acc_ref[:] += upd
            return 0

        jax.lax.fori_loop(0, m_real, body, 0)

        @pl.when(last)
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


def _make_bwd_kernel(m_real, table, nw):
    def kernel(tab_ref, anyp_ref, cntp_ref, g_ref, ey_ref, ex_ref, sy_ref,
               sx_ref, r2_ref, cnt_ref, dey_ref, dex_ref, dsy_ref, dsx_ref,
               acc_ey, acc_ex, acc_sy, acc_sx, dmax_ref, amax_ref, gmax_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        ey = ey_ref[0]
        ex = ex_ref[0]
        sy = sy_ref[0]
        sx = sx_ref[0]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
                + i * _TH).astype(jnp.float32)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
                + j * _TW).astype(jnp.float32)
        any_pts = anyp_ref[0, i, j] > 0

        acc_ey[:] = jnp.zeros(acc_ey.shape, jnp.float32)
        acc_ex[:] = jnp.zeros(acc_ex.shape, jnp.float32)
        acc_sy[:] = jnp.zeros(acc_sy.shape, jnp.float32)
        acc_sx[:] = jnp.zeros(acc_sx.shape, jnp.float32)
        dmax_ref[:] = jnp.zeros(dmax_ref.shape, jnp.float32)
        amax_ref[:] = jnp.full(amax_ref.shape, -1.0, jnp.float32)
        gmax_ref[:] = jnp.zeros(gmax_ref.shape, jnp.float32)

        # pass A: d_max and (first-max) argmax over all valid centers
        @pl.when(any_pts)
        def _():
            def amax_body(m, _):
                @pl.when(tab_ref[0, _VALID, m] > 0.0)
                def _():
                    dy = ey - tab_ref[0, _CY, m]
                    dx = ex - tab_ref[0, _CX, m]
                    d = jnp.exp(-(dy * dy * sy + dx * dx * sx))
                    better = d > dmax_ref[:]
                    dmax_ref[:] = jnp.where(better, d, dmax_ref[:])
                    amax_ref[:] = jnp.where(better, jnp.float32(m), amax_ref[:])
                return 0
            jax.lax.fori_loop(0, m_real, amax_body, 0)

        # pass B: focal backward (window-skipped) + pull own-term; also
        # accumulate the -g·cnt·sign cotangent routed to the argmax center
        def body(m, _):
            @pl.when(_tile_hit(tab_ref, cntp_ref, nw, m, i, j))
            def _():
                r2 = r2_ref[0, m].astype(jnp.int32)
                cnt = cnt_ref[0, m].astype(jnp.int32).astype(jnp.float32)
                win = ((rows >= tab_ref[0, _LT0, m]) & (rows < tab_ref[0, _RB0, m]) &
                       (cols >= tab_ref[0, _LT1, m]) & (cols < tab_ref[0, _RB1, m]))
                dy = ey - tab_ref[0, _CY, m]
                dx = ex - tab_ref[0, _CX, m]
                t = jnp.exp(-(dy * dy * sy + dx * dx * sx))
                tc = jnp.clip(t, _EPS, 1.0 - _EPS)
                pass_g = ((t >= _EPS) & (t <= 1.0 - _EPS)).astype(jnp.float32)
                wf = win.astype(jnp.float32)
                posm = ((cnt > 0) & win).astype(jnp.float32)
                neg_w4 = _neg_w4_of(r2, table)

                dneg_dt = neg_w4 * wf * (2.0 * tc * jnp.log(1.0 - tc)
                                         - tc * tc / (1.0 - tc))
                dpos_dt = posm * ((1.0 - tc) ** 2 / tc
                                  - 2.0 * (1.0 - tc) * jnp.log(tc))
                gt = (g_ref[0, 1, m] * dneg_dt + g_ref[0, 0, m] * dpos_dt) * pass_g

                # pull own-term: d/dd [ cnt·|d - dmax| ] = cnt·sign(d - dmax)
                sgn = jnp.sign(t - dmax_ref[:])
                gpull_own = g_ref[0, 3, m] * cnt * sgn
                gt += gpull_own
                gmax_ref[:] += -gpull_own      # routed to the argmax center

                gexpo = gt * (-t)              # t = exp(-expo)
                acc_ey[:] += gexpo * 2.0 * dy * sy
                acc_ex[:] += gexpo * 2.0 * dx * sx
                acc_sy[:] += gexpo * dy * dy
                acc_sx[:] += gexpo * dx * dx
            return 0

        jax.lax.fori_loop(0, m_real, body, 0)

        # pass C: deliver the accumulated d_max cotangent to each pixel's
        # argmax center (no window — any valid center can be the argmax)
        @pl.when(any_pts)
        def _():
            def cbody(m, _):
                @pl.when(tab_ref[0, _VALID, m] > 0.0)
                def _():
                    dy = ey - tab_ref[0, _CY, m]
                    dx = ex - tab_ref[0, _CX, m]
                    d = jnp.exp(-(dy * dy * sy + dx * dx * sx))
                    gd = jnp.where(amax_ref[:] == m, gmax_ref[:], 0.0)
                    gexpo = gd * (-d)
                    acc_ey[:] += gexpo * 2.0 * dy * sy
                    acc_ex[:] += gexpo * 2.0 * dx * sx
                    acc_sy[:] += gexpo * dy * dy
                    acc_sx[:] += gexpo * dx * dx
                return 0
            jax.lax.fori_loop(0, m_real, cbody, 0)

        dey_ref[0] = acc_ey[:]
        dex_ref[0] = acc_ex[:]
        dsy_ref[0] = acc_sy[:]
        dsx_ref[0] = acc_sx[:]

    return kernel


def _pack_table(c_emb, lt, rb, valid):
    """[B, 8, MPAD] f32 per-instance scalar table."""
    B, M = valid.shape
    tab = jnp.zeros((B, _TROWS, _MPAD), jnp.float32)
    tab = tab.at[:, _CY, :M].set(c_emb[..., 0])
    tab = tab.at[:, _CX, :M].set(c_emb[..., 1])
    tab = tab.at[:, _LT0, :M].set(lt[..., 0].astype(jnp.float32))
    tab = tab.at[:, _LT1, :M].set(lt[..., 1].astype(jnp.float32))
    tab = tab.at[:, _RB0, :M].set(rb[..., 0].astype(jnp.float32))
    tab = tab.at[:, _RB1, :M].set(rb[..., 1].astype(jnp.float32))
    tab = tab.at[:, _VALID, :M].set(valid.astype(jnp.float32))
    return tab


def _any_points(cnt):
    """(anyp [B, nh, nw], cntp [B, M, nh*nw]) f32 presence tables:
    anyp is 1.0 where the (TH, TW) tile holds any boundary sample of any
    instance (gates the unwindowed d_max passes); cntp is the per-instance
    version (extends the per-(tile, instance) skip test so the pull term
    covers samples outside the focal window — see _tile_hit). cntp's tile
    axis is flattened so its SMEM window stays small (see _tile_hit).

    NB: prefer _any_points_from_points on the hot path — this dense-map form
    lowers to a strided [B,M,nh,TH,nw,TW] reduction that measured 9.8 ms at
    B3 batch-4 shapes (~41 GB/s, 20x off the HBM roofline); kept for tests
    and as the semantics oracle."""
    B, M, H, W = cnt.shape
    nh, nw = H // _TH, W // _TW
    t = (cnt.astype(jnp.int32)
         .reshape(B, M, nh, _TH, nw, _TW).sum(axis=(3, 5)))        # [B,M,nh,nw]
    cntp = (t > 0).astype(jnp.float32).reshape(B, M, nh * nw)
    anyp = (t.sum(axis=1) > 0).astype(jnp.float32)
    return anyp, cntp


def _any_points_from_points(points, pt_valid, h, w):
    """Same (anyp, cntp) tables computed from the COMPACT boundary point list
    [B, M, P, 2] instead of the dense [B, M, H, W] count map: one fused
    [B, M, P, n_tiles] compare-sum (n_tiles = 32 at 512x1024) instead of a
    400 MB strided reduction. Identical values: a tile holds a sample of
    instance m iff some valid point (clipped exactly like ae_sample_count's
    scatter) lands in it."""
    B, M, P, _ = points.shape
    nh, nw = h // _TH, w // _TW
    nt = nh * nw
    tr = jnp.clip(points[..., 0], 0, h - 1) // _TH
    tc = jnp.clip(points[..., 1], 0, w - 1) // _TW
    tid = (tr * nw + tc).astype(jnp.int32)                        # [B,M,P]
    hit = ((tid[..., None] == jnp.arange(nt, dtype=jnp.int32))
           & pt_valid[..., None])                                 # [B,M,P,nt]
    cnt_t = jnp.sum(hit, axis=2, dtype=jnp.int32)                 # [B,M,nt]
    cntp = (cnt_t > 0).astype(jnp.float32)
    anyp = (jnp.sum(cnt_t, axis=1) > 0).astype(jnp.float32).reshape(B, nh, nw)
    return anyp, cntp


def supported(h, w, m):
    return h % _TH == 0 and w % _TW == 0 and m <= _MPAD


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ae_terms(ey, ex, sy, sx, r2, cnt, table, tab, anyp, cntp):
    """ey/ex/sy/sx [B,H,W] f32; r2 [B,M,H,W] u8; cnt [B,M,H,W] u16;
    tab [B,8,MPAD] f32 (_pack_table); anyp [B,nh,nw] + cntp [B,M,nh,nw] f32
    (_any_points). Returns (pos, neg, npos, pull) each [B, M]."""
    out, _ = _fwd_impl(ey, ex, sy, sx, r2, cnt, table, tab, anyp, cntp)
    return out


def _fwd_impl(ey, ex, sy, sx, r2, cnt, table, tab, anyp, cntp):
    B, H, W = ey.shape
    M = r2.shape[1]
    nh, nw = H // _TH, W // _TW
    grid = (B, nh, nw)
    spat = pl.BlockSpec((1, _TH, _TW), lambda b, i, j: (b, i, j),
                        memory_space=pltpu.VMEM)
    mspat = pl.BlockSpec((1, M, _TH, _TW), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        _make_fwd_kernel(M, table, nw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TROWS, _MPAD), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nh, nw), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, nh * nw), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            spat, spat, spat, spat, mspat, mspat,
        ],
        out_specs=pl.BlockSpec((1, 8, _MPAD), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, _MPAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, _MPAD), jnp.float32),
                        pltpu.VMEM((_TH, _TW), jnp.float32)],
        interpret=INTERPRET,
    )(tab, anyp, cntp, ey, ex, sy, sx, r2, cnt)
    out = (packed[:, 0, :M], packed[:, 1, :M], packed[:, 2, :M],
           packed[:, 3, :M])
    return out, (ey, ex, sy, sx, r2, cnt, tab, anyp, cntp)


def _bwd_impl(table, res, cts):
    ey, ex, sy, sx, r2, cnt, tab, anyp, cntp = res
    g_pos, g_neg, _g_npos, g_pull = cts    # npos: count, zero true gradient
    B, H, W = ey.shape
    M = r2.shape[1]
    nh, nw = H // _TH, W // _TW
    g = jnp.zeros((B, 8, _MPAD), jnp.float32)
    g = g.at[:, 0, :M].set(g_pos)
    g = g.at[:, 1, :M].set(g_neg)
    g = g.at[:, 3, :M].set(g_pull)
    grid = (B, nh, nw)
    spat = pl.BlockSpec((1, _TH, _TW), lambda b, i, j: (b, i, j),
                        memory_space=pltpu.VMEM)
    mspat = pl.BlockSpec((1, M, _TH, _TW), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM)
    dey, dex, dsy, dsx = pl.pallas_call(
        _make_bwd_kernel(M, table, nw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TROWS, _MPAD), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nh, nw), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, nh * nw), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, _MPAD), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            spat, spat, spat, spat, mspat, mspat,
        ],
        out_specs=[spat] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, H, W), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((_TH, _TW), jnp.float32)] * 7,
        interpret=INTERPRET,
    )(tab, anyp, cntp, g, ey, ex, sy, sx, r2, cnt)
    return dey, dex, dsy, dsx, None, None, None, None, None


ae_terms.defvjp(lambda ey, ex, sy, sx, r2, cnt, table, tab, anyp, cntp:
                _fwd_impl(ey, ex, sy, sx, r2, cnt, table, tab, anyp, cntp),
                _bwd_impl)
