"""Sort-free stream compaction primitives (MXU matmul-scan).

XLA on TPU lowers long cumsums to log-depth while loops and vmapped
searchsorted/top_k to scalar-rate loops (trace notes in CLAUDE.md); these
helpers do prefix counting with lower-triangular matmuls instead, which the
MXU eats. Shared by the decode peak selection (ops/decode.py) and the
training-loss scatter compaction (losses/losses.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def blocked_cumsum(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive cumsum of small nonneg ints along the last axis, on the MXU.

    Per-block inclusive prefix = block @ lower-triangular ones (MXU), plus a
    tiny cross-block offset cumsum. Exact for counts (bf16 0/1 inputs,
    f32 accumulation, block totals <= block < 2^24). Returns f32 [B, N].
    """
    B, N = x.shape
    pad = (-N) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    nb = (N + pad) // block
    xb = x.reshape(B, nb, block).astype(jnp.bfloat16)
    tri = jnp.tril(jnp.ones((block, block), jnp.bfloat16))       # [t, s] s<=t
    within = jax.lax.dot_general(
        xb, tri, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [B, nb, block]
    totals = within[..., -1]                                     # [B, nb]
    off = jnp.cumsum(totals, axis=1) - totals                    # small scan
    out = (within + off[..., None]).reshape(B, nb * block)
    return out[:, :N]


def extract_k_indices(mask: jnp.ndarray, k: int,
                      block: int = 256) -> jnp.ndarray:
    """Ascending positions of the first k true elements of mask [B, N].

    Two-level compaction without searchsorted/scatter (both lower to
    scalar-rate loops on TPU): per-block prefix counts via the matmul scan,
    block location + within-block rank via broadcast compare-sums, and one
    contiguous row-gather of the chosen blocks' prefix rows. Positions past
    the last true element are clamped garbage — mask them with a separate
    `arange(k) < n_true` test.
    """
    B, N = mask.shape
    pad = (-N) % block
    m = mask.astype(jnp.bfloat16)
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    nb = (N + pad) // block
    mb = m.reshape(B, nb, block)
    tri = jnp.tril(jnp.ones((block, block), jnp.bfloat16))
    within = jax.lax.dot_general(
        mb, tri, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [B, nb, block]
    totals = within[..., -1]
    inc = jnp.cumsum(totals, axis=1)                             # [B, nb]
    off = inc - totals
    t = jnp.arange(1, k + 1, dtype=jnp.float32)                  # targets
    # block of the t-th true = # blocks whose inclusive count < t
    b_idx = jnp.sum((inc[:, None, :] < t[None, :, None]).astype(jnp.int32),
                    axis=-1)                                     # [B, k]
    b_idx = jnp.minimum(b_idx, nb - 1)
    r = t[None, :] - jnp.take_along_axis(off, b_idx, axis=1)     # rank in block
    w_rows = jnp.take_along_axis(within, b_idx[..., None], axis=1)  # [B,k,block]
    s_idx = jnp.sum((w_rows < r[..., None]).astype(jnp.int32), axis=-1)
    idx = b_idx * block + jnp.minimum(s_idx, block - 1)
    return jnp.minimum(idx, N - 1).astype(jnp.int32)
