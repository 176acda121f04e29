"""rasterize_pallas.rasterize_cnt_r2 vs the XLA oracles
(ae_sample_count / _shift_min_r2 / any-union) — interpret mode, bit-exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import instance_segmentation_tpu.losses.rasterize_pallas as rp
from instance_segmentation_tpu.losses.losses import (
    _shift_min_r2, ae_sample_count)
from instance_segmentation_tpu.ops.targets import Targets


@pytest.fixture(autouse=True)
def _interpret():
    old = rp.INTERPRET
    rp.INTERPRET = True
    yield
    rp.INTERPRET = old


def _fixture(B=2, M=6, P=64, H=64, W=128, n_real=3, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((B, M, P, 2), np.int32)
    val = np.zeros((B, M, P), bool)
    for b in range(B):
        for m in range(n_real):
            n = 40
            cy, cx = rng.uniform(4, H - 4), rng.uniform(4, W - 4)
            # out-of-range coords exercise the clip parity vs the scatter
            pts[b, m, :n, 0] = (cy + rng.normal(0, 20, n)).astype(np.int32)
            pts[b, m, :n, 1] = (cx + rng.normal(0, 30, n)).astype(np.int32)
            val[b, m, :n] = True
            # duplicated pixels exercise counts > 1
            pts[b, m, 1] = pts[b, m, 0]
    return jnp.asarray(pts), jnp.asarray(val), H, W


def _targets_stub(points, pt_valid):
    B, M, P, _ = points.shape
    return Targets(
        points=points, pt_valid=pt_valid,
        normals=jnp.zeros((B, M, P, 2), jnp.float32),
        centers=jnp.zeros((B, M, 2), jnp.float32),
        inst_valid=jnp.any(pt_valid, axis=2),
        det_ann=jnp.zeros((B, M, 5), jnp.float32),
        kp_tgt=None)


def test_rasterize_matches_oracles():
    pts, val, H, W = _fixture()
    cnt, r2, uni = rp.rasterize_cnt_r2(pts, val, H, W)
    tg = _targets_stub(pts, val)
    cnt_ref = np.asarray(ae_sample_count(tg, H, W))
    np.testing.assert_array_equal(np.asarray(cnt), cnt_ref)
    np.testing.assert_array_equal(
        np.asarray(r2), np.asarray(_shift_min_r2(jnp.asarray(cnt_ref) > 0)))
    np.testing.assert_array_equal(
        np.asarray(uni), (cnt_ref > 0).any(axis=1).astype(np.uint8))


def test_rasterize_nmap_matches_scatter():
    pts, val, H, W = _fixture()
    B, M, P, _ = pts.shape
    rng = np.random.default_rng(7)
    ang = rng.uniform(0, 2 * np.pi, (B, M, P))
    normals = jnp.asarray(
        np.stack([np.sin(ang), np.cos(ang)], -1).astype(np.float32))
    n0, n1 = rp.rasterize_nmap(pts, val, normals, H, W)
    # oracle: the f32 scatter-add the kernel replaces (same clip/drop rules)
    flat = np.full((B * H * W, 2), 0.0, np.float64)
    p_np, v_np, nr = np.asarray(pts), np.asarray(val), np.asarray(normals)
    for b in range(B):
        for m in range(M):
            for p in range(P):
                if v_np[b, m, p]:
                    y = min(max(int(p_np[b, m, p, 0]), 0), H - 1)
                    x = min(max(int(p_np[b, m, p, 1]), 0), W - 1)
                    flat[b * H * W + y * W + x] += nr[b, m, p]
    ref = flat.reshape(B, H, W, 2)
    # 3-way bf16 split is exact per term; only f32 summation ORDER differs
    np.testing.assert_allclose(np.asarray(n0), ref[..., 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), ref[..., 1], atol=1e-5)


def test_tangent_loss_nmap_path_matches_scatter(monkeypatch):
    from instance_segmentation_tpu.losses.losses import (
        LossConfig, tangent_loss)
    pts, val, H, W = _fixture()
    B, M, P, _ = pts.shape
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, 2 * np.pi, (B, M, P))
    normals = jnp.asarray(
        np.stack([np.sin(ang), np.cos(ang)], -1).astype(np.float32))
    tg = _targets_stub(pts, val)._replace(normals=normals)
    tan = jnp.asarray(rng.standard_normal((B, H, W, 2)).astype(np.float32))
    l_pallas = float(tangent_loss(tan, tg, LossConfig()))
    monkeypatch.setenv("ISEG_RASTER_XLA", "1")
    l_scatter = float(tangent_loss(tan, tg, LossConfig()))
    np.testing.assert_allclose(l_pallas, l_scatter, rtol=1e-5)


def test_rasterize_empty_image():
    B, M, P, H, W = 1, 4, 32, 32, 128
    pts = jnp.zeros((B, M, P, 2), jnp.int32)
    val = jnp.zeros((B, M, P), bool)
    cnt, r2, uni = rp.rasterize_cnt_r2(pts, val, H, W)
    assert int(jnp.sum(cnt)) == 0
    assert (np.asarray(r2) == 200).all()
    assert int(jnp.sum(uni)) == 0
