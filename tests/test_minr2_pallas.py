"""minr2_pallas.minr2_from_cnt vs losses._shift_min_r2 (the XLA oracle).

Interpreter mode on CPU; integer min/add so the match is bit-exact. Covers
clustered points, empty slabs (the skip path), border clipping, and odd
radii.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import instance_segmentation_tpu.losses.minr2_pallas as m2p
from instance_segmentation_tpu.losses.losses import _shift_min_r2


@pytest.fixture(autouse=True)
def _interpret():
    old = m2p.INTERPRET
    m2p.INTERPRET = True
    yield
    m2p.INTERPRET = old


def _cnt_fixture(B=2, M=6, H=64, W=128, n_real=3, seed=0):
    rng = np.random.default_rng(seed)
    cnt = np.zeros((B, M, H, W), np.uint16)
    for b in range(B):
        for m in range(n_real):
            n = 40
            cy, cx = rng.uniform(4, H - 4), rng.uniform(4, W - 4)
            ys = np.clip(cy + rng.normal(0, 8, n), 0, H - 1).astype(int)
            xs = np.clip(cx + rng.normal(0, 12, n), 0, W - 1).astype(int)
            np.add.at(cnt[b, m], (ys, xs), 1)
    # border pixels exercise the clip semantics
    cnt[0, 0, 0, 0] += 1
    cnt[0, 0, H - 1, W - 1] += 1
    has = (cnt.reshape(B, M, -1).sum(-1) > 0).astype(np.float32)
    return jnp.asarray(cnt), jnp.asarray(has)


def test_minr2_matches_xla_oracle():
    cnt, has = _cnt_fixture()
    ours = np.asarray(m2p.minr2_from_cnt(cnt, has))
    ref = np.asarray(_shift_min_r2(cnt > 0))
    np.testing.assert_array_equal(ours, ref)


def test_minr2_empty_slabs_are_big():
    cnt, has = _cnt_fixture()
    out = np.asarray(m2p.minr2_from_cnt(cnt, has))
    assert (out[:, 3:] == 200).all()          # padding slots skip to BIG
    ref = np.asarray(_shift_min_r2(cnt > 0))
    np.testing.assert_array_equal(out, ref)


def test_minr2_all_empty_image():
    B, M, H, W = 1, 4, 32, 128
    cnt = jnp.zeros((B, M, H, W), jnp.uint16)
    has = jnp.zeros((B, M), jnp.float32)
    out = np.asarray(m2p.minr2_from_cnt(cnt, has))
    assert (out == 200).all()
