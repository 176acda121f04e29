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


def test_ae_pallas_empty_labels():
    ae, tg, xym = _fixture(n_real=0)
    p = ae_loss(ae, tg, xym, LossConfig(ae_impl="pallas"))
    g = jax.grad(lambda a: ae_loss(a, tg, xym, LossConfig(ae_impl="pallas")))(ae)
    assert bool(jnp.isfinite(p)) and bool(jnp.all(jnp.isfinite(g)))
    d = ae_loss(ae, tg, xym, LossConfig(ae_impl="dense"))
    np.testing.assert_allclose(float(p), float(d), rtol=1e-5)
