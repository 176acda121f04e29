"""Pallas affinity kernel vs the XLA reference formulation.

Runs in interpreter mode on the CPU test backend (pallas TPU kernels
interpret correctly there); on-device the same kernel compiles via Mosaic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _xla_reference(kp_rc, emb, sig, c_emb, boxes, det_valid):
    contained = ((kp_rc[:, 0:1] >= boxes[None, :, 1]) &
                 (kp_rc[:, 0:1] <= boxes[None, :, 3]) &
                 (kp_rc[:, 1:2] >= boxes[None, :, 0]) &
                 (kp_rc[:, 1:2] <= boxes[None, :, 2]) &
                 det_valid[None, :])
    dists = jnp.exp(-jnp.sum((emb[:, None, :] - c_emb[None, :, :]) ** 2
                             * sig[:, None, :], axis=-1))
    scored = dists * contained.astype(jnp.float32)
    return jnp.argmax(scored, axis=1), jnp.max(scored, axis=1)


def test_affinity_kernel_matches_xla():
    from instance_segmentation_tpu.ops import pallas_kernels as pk
    import jax.experimental.pallas as pl  # noqa: F401

    rng = np.random.default_rng(0)
    K, D = 3000, 24
    kp_rc = rng.uniform(0, 128, (K, 2)).astype(np.float32)
    emb = rng.normal(0.5, 0.2, (K, 2)).astype(np.float32)
    sig = np.exp(rng.normal(0, 0.5, (K, 2))).astype(np.float32)
    c_emb = rng.normal(0.5, 0.2, (D, 2)).astype(np.float32)
    xy = rng.uniform(0, 100, (D, 2)).astype(np.float32)
    wh = rng.uniform(10, 60, (D, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    det_valid = rng.uniform(size=D) > 0.2

    want_a, want_b = jax.jit(_xla_reference)(
        *(jnp.asarray(a) for a in (kp_rc, emb, sig, c_emb, boxes, det_valid)))

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got_a, got_b = pk.affinity_assign(
            *(jnp.asarray(a) for a in (kp_rc, emb, sig, c_emb, boxes, det_valid)))

    got_a, got_b = np.asarray(got_a), np.asarray(got_b)
    want_a, want_b = np.asarray(want_a), np.asarray(want_b)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-6)
    # argmax must agree wherever the max is unique / nonzero
    nonzero = want_b > 0
    np.testing.assert_array_equal(got_a[nonzero], want_a[nonzero])
