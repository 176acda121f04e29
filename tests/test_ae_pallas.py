"""Pallas AE kernel (losses/ae_pallas.py) vs the XLA dense formulation.

Runs the kernels in interpreter mode on CPU: same per-element math, so the
loss and its gradients must agree to float-sum-order tolerance. Covers both
terms the kernel computes (instance focal + pull) and the empty-image edge
case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import instance_segmentation_tpu.losses.ae_pallas as aep
from instance_segmentation_tpu.losses.losses import (
    LossConfig, ae_loss, coordinate_grid)
from instance_segmentation_tpu.ops.targets import generate_targets


@pytest.fixture(autouse=True)
def _interpret():
    old = aep.INTERPRET
    aep.INTERPRET = True
    yield
    aep.INTERPRET = old


def _fixture(n_real=5, seed=1):
    B, H, W, M, P = 2, 256, 512, 8, 64
    rng = np.random.default_rng(seed)
    ae = jnp.asarray(rng.normal(0, 1, (B, H, W, 4)).astype(np.float32))
    polys = np.zeros((B, M, 8, 2), np.float32)
    nv = np.zeros((B, M), np.int32)
    ci = np.full((B, M), -1, np.int32)
    for b in range(B):
        for m in range(n_real):
            cy, cx = rng.uniform(40, H - 40), rng.uniform(60, W - 60)
            rh, rw = rng.uniform(10, 30), rng.uniform(15, 45)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang),
                                    cx + rw * np.cos(ang)], -1)
            nv[b, m] = 8
            ci[b, m] = rng.integers(0, 8)
        polys[b, n_real:] = polys[b, 0, 0]
    tg = generate_targets(jnp.asarray(polys), jnp.asarray(nv),
                          jnp.asarray(ci), H, W, max_points=P, dense_kp=False)
    return ae, tg, coordinate_grid(H, W)


def test_ae_pallas_matches_dense():
    ae, tg, xym = _fixture()
    d = ae_loss(ae, tg, xym, LossConfig(ae_impl="dense"))
    p = ae_loss(ae, tg, xym, LossConfig(ae_impl="pallas"))
    np.testing.assert_allclose(float(p), float(d), rtol=1e-5)


def test_ae_pallas_grad_matches_dense():
    ae, tg, xym = _fixture()
    gd = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="dense")))(ae)
    gp = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="pallas")))(ae)
    rel = float(jnp.max(jnp.abs(gd - gp)) / (jnp.max(jnp.abs(gd)) + 1e-9))
    assert rel < 1e-4, rel


def test_ae_pallas_border_clipped_instance():
    """Instance mostly off-image: its bbox-midpoint center sits off-screen,
    so the focal window (center +/- mask_size/2, clipped) misses some or all
    of the in-bounds sample pixels. The pull term is unwindowed in the dense
    path — the Pallas path must cover those tiles too (ADVICE r2 medium)."""
    B, H, W, M, P = 1, 256, 512, 8, 64
    rng = np.random.default_rng(3)
    ae = jnp.asarray(rng.normal(0, 1, (B, H, W, 4)).astype(np.float32))
    polys = np.zeros((B, M, 8, 2), np.float32)
    nv = np.zeros((B, M), np.int32)
    ci = np.full((B, M), -1, np.int32)
    # rectangle spanning cols [-500, 60]: center col = -220, window cols clip
    # to an empty range while samples live on the col-60 edge (first edge so
    # the P=64 sample budget reaches it)
    polys[0, 0] = np.array([[80, 60], [160, 60], [160, -500], [80, -500],
                            [80, 60], [160, 60], [160, -500], [80, -500]],
                           np.float32)
    nv[0, 0] = 4
    ci[0, 0] = 2
    # plus one ordinary interior instance so d_max competition is nontrivial
    polys[0, 1] = np.array([[100, 100], [100, 180], [170, 180], [170, 100],
                            [100, 100], [100, 180], [170, 180], [170, 100]],
                           np.float32)
    nv[0, 1] = 4
    ci[0, 1] = 5
    polys[0, 2:] = polys[0, 1, 0]
    tg = generate_targets(jnp.asarray(polys), jnp.asarray(nv),
                          jnp.asarray(ci), H, W, max_points=P, dense_kp=False)
    # sanity: some sample pixels of instance 0 must fall outside its window
    assert int(jnp.sum(tg.pt_valid[0, 0])) > 0
    xym = coordinate_grid(H, W)
    d = ae_loss(ae, tg, xym, LossConfig(ae_impl="dense"))
    p = ae_loss(ae, tg, xym, LossConfig(ae_impl="pallas"))
    np.testing.assert_allclose(float(p), float(d), rtol=1e-5)
    gd = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="dense")))(ae)
    gp = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="pallas")))(ae)
    rel = float(jnp.max(jnp.abs(gd - gp)) / (jnp.max(jnp.abs(gd)) + 1e-9))
    assert rel < 1e-4, rel


def test_any_points_from_points_matches_dense():
    """The point-list presence tables equal the dense count-map reduction
    (the hot path swaps the 400 MB strided reduce for one compare-sum)."""
    from instance_segmentation_tpu.losses.losses import ae_sample_count
    _, tg, _ = _fixture()
    H, W = 256, 512
    cnt = ae_sample_count(tg, H, W)
    anyp_d, cntp_d = aep._any_points(cnt)
    anyp_p, cntp_p = aep._any_points_from_points(tg.points, tg.pt_valid, H, W)
    np.testing.assert_array_equal(np.asarray(anyp_d), np.asarray(anyp_p))
    np.testing.assert_array_equal(np.asarray(cntp_d), np.asarray(cntp_p))


def test_ae_pallas_empty_labels():
    ae, tg, xym = _fixture(n_real=0)
    p = ae_loss(ae, tg, xym, LossConfig(ae_impl="pallas"))
    g = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="pallas")))(ae)
    assert bool(jnp.isfinite(p)) and bool(jnp.all(jnp.isfinite(g)))
    d = ae_loss(ae, tg, xym, LossConfig(ae_impl="dense"))
    np.testing.assert_allclose(float(p), float(d), rtol=1e-5)
