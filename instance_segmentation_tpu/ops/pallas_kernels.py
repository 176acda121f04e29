"""Pallas TPU kernels for the decode hot path.

`affinity_assign` fuses the keypoint->center grouping stage of the decode
(ref utils/decode.py group_kp :319-328: box-containment mask x Gaussian
embedding affinity -> per-keypoint argmax center): the XLA formulation
materializes three [K, D] arrays in HBM (containment, affinity, masked
scores); the kernel streams keypoint tiles through VMEM, broadcasts the small
center table, and emits only the per-keypoint (assignment, score) pair —
one HBM pass over the keypoint data.

Layout: keypoints ride the LANE axis (tiles of _TK lanes), centers ride the
SUBLANE axis (padded to _DPAD) — reductions over centers are sublane
reductions, and the [1, TK] outputs keep the native (8,128) tiling happy.

Exactness: same exp/sum expression as the XLA path; argmax tie-breaking
follows the first-maximum convention like jnp.argmax.

Measured on TPU v5e (K=20000, D=96): 0.033 ms vs 0.021 ms for the XLA
formulation — identical outputs, but XLA's fusion already wins at this op
size, so decode keeps the XLA path by default and this kernel stands as
validated Pallas infrastructure (layout recipe: data along lanes, the small
table along sublanes, sublane reductions for the argmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 2048      # keypoints per tile (lanes); [DPAD, TK] f32 = 1 MB in VMEM
_DPAD = 128     # centers padded to the sublane tile


def _affinity_kernel(kp_ref, emb_ref, sig_ref, ctr_ref, assign_ref, best_ref):
    """One keypoint tile vs all centers.

    kp_ref/emb_ref/sig_ref [2, TK]  (row;col) x keypoints
    ctr_ref [8, DPAD] packed per-center table (features x centers):
        rows 0:2 center embedding (y, x); rows 2:6 box (y1, x1, y2, x2);
        row 6 det_valid; row 7 real-center flag
    assign_ref [1, TK] int32, best_ref [1, TK] f32
    """
    kp = kp_ref[:]                                      # [2, TK]
    emb = emb_ref[:]
    sig = sig_ref[:]
    ctr = ctr_ref[:]                                    # [8, DPAD]

    # [DPAD, TK]: centers along sublanes, keypoints along lanes
    dy = ctr[0, :][:, None] - emb[0, :][None, :]
    dx = ctr[1, :][:, None] - emb[1, :][None, :]
    expo = dy * dy * sig[0, :][None, :] + dx * dx * sig[1, :][None, :]
    dist = jnp.exp(-expo)

    contained = ((kp[0, :][None, :] >= ctr[2, :][:, None]) &
                 (kp[0, :][None, :] <= ctr[4, :][:, None]) &
                 (kp[1, :][None, :] >= ctr[3, :][:, None]) &
                 (kp[1, :][None, :] <= ctr[5, :][:, None]) &
                 (ctr[6, :][:, None] > 0) & (ctr[7, :][:, None] > 0))

    scored = jnp.where(contained, dist, 0.0)
    # a pad center must never win ties at 0 against real slot 0
    scored = jnp.where(ctr[7, :][:, None] > 0, scored, -1.0)
    best = jnp.max(scored, axis=0, keepdims=True)       # [1, TK]
    # first-max argmax via a sublane min over matching indices
    ids = jax.lax.broadcasted_iota(jnp.int32, scored.shape, 0).astype(jnp.float32)
    sel = jnp.where(scored == best, ids, float(_DPAD))
    idx = jnp.min(sel, axis=0, keepdims=True)           # [1, TK]
    assign_ref[:] = idx.astype(jnp.int32)
    best_ref[:] = best


@functools.partial(jax.jit, static_argnames=())
def affinity_assign(kp_rc: jnp.ndarray, emb: jnp.ndarray, sig: jnp.ndarray,
                    c_emb: jnp.ndarray, boxes: jnp.ndarray,
                    det_valid: jnp.ndarray):
    """Per-image grouping. kp_rc/emb/sig [K,2]; c_emb [D,2]; boxes [D,4]
    (x1,y1,x2,y2); det_valid [D]. Returns (assign [K] int32, best [K] f32)."""
    K = kp_rc.shape[0]
    D = c_emb.shape[0]
    if D > _DPAD:
        raise ValueError(f"affinity_assign supports up to {_DPAD} centers, got {D}")

    kpad = (-K) % _TK
    tpose = lambda a: jnp.pad(a.T, ((0, 0), (0, kpad)))       # [2, K+pad]
    kp_t, emb_t, sig_t = tpose(kp_rc), tpose(emb), tpose(sig)

    ctr = jnp.zeros((8, _DPAD), jnp.float32)
    ctr = ctr.at[0:2, :D].set(c_emb.T)
    # boxes are (x1,y1,x2,y2); rows 2..5 want y1,x1,y2,x2
    ctr = ctr.at[2, :D].set(boxes[:, 1])
    ctr = ctr.at[3, :D].set(boxes[:, 0])
    ctr = ctr.at[4, :D].set(boxes[:, 3])
    ctr = ctr.at[5, :D].set(boxes[:, 2])
    ctr = ctr.at[6, :D].set(det_valid.astype(jnp.float32))
    ctr = ctr.at[7, :D].set(1.0)

    n_tiles = (K + kpad) // _TK
    assign, best = pl.pallas_call(
        _affinity_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, _TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _DPAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, K + kpad), jnp.int32),
            jax.ShapeDtypeStruct((1, K + kpad), jnp.float32),
        ],
    )(kp_t, emb_t, sig_t, ctr)
    return assign[0, :K], best[0, :K]
