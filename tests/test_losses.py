"""Loss functions vs. numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_segmentation_tpu.data.packing import pack_batch
from instance_segmentation_tpu.losses import (
    LossConfig, ae_loss, compose_loss, coordinate_grid, det_focal_loss,
    kp_focal_loss, tangent_loss,
)
from instance_segmentation_tpu.models.anchors import generate_anchors
from instance_segmentation_tpu.ops.targets import generate_targets

from oracles import (
    ae_loss_np, annotations_np, det_focal_np, focal_np, tangent_loss_np,
)
from test_targets import H, W, make_label


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    cls_ids, polys = make_label()
    packed = pack_batch([(cls_ids, polys)], max_instances=8, max_verts=16)
    tg = jax.jit(lambda p, n, c: generate_targets(p, n, c, H, W, max_points=256))(
        packed.polys, packed.n_verts, packed.cls_ids)
    return rng, cls_ids, polys, packed, tg


def test_coordinate_grid_matches_reference_frame():
    g = np.asarray(coordinate_grid(8, 16))
    assert np.isclose(g[5, 0, 0], 5 / 1023.0)
    assert np.isclose(g[0, 7, 1], 2 * 7 / 2047.0)


def test_det_focal_loss(setup):
    rng, cls_ids, polys, packed, tg = setup
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    C = 8
    cls_prob = 1 / (1 + np.exp(-rng.normal(size=(1, A, C)).astype(np.float32)))
    reg = rng.normal(scale=0.2, size=(1, A, 4)).astype(np.float32)

    det_np, _, _, _, _ = annotations_np(cls_ids, polys, H, W)
    want_cls, want_reg = det_focal_np(cls_prob, reg, anchors, [det_np])

    got_cls, got_reg = jax.jit(lambda c, r, t: det_focal_loss(c, r, anchors, t))(
        cls_prob, reg, tg.det_ann)
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4)
    np.testing.assert_allclose(got_reg, want_reg, rtol=2e-4)


def test_det_focal_loss_no_gt(setup):
    rng, *_ = setup
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    cls_prob = 1 / (1 + np.exp(-rng.normal(size=(1, A, 4)).astype(np.float32)))
    reg = rng.normal(size=(1, A, 4)).astype(np.float32)
    empty = -np.ones((1, 8, 5), np.float32)
    want_cls, want_reg = det_focal_np(cls_prob, reg, anchors, [empty[0]])
    got_cls, got_reg = jax.jit(lambda c, r, t: det_focal_loss(c, r, anchors, t))(
        cls_prob, reg, jnp.asarray(empty))
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4)
    assert got_reg == 0.0


def test_kp_focal_loss(setup):
    rng, cls_ids, polys, packed, tg = setup
    logits = rng.normal(size=(1, H, W, 1)).astype(np.float32)
    pred = 1 / (1 + np.exp(-logits[..., 0]))
    pred = np.clip(pred, 1e-4, 1 - 1e-4)
    _, _, _, _, kp_np = annotations_np(cls_ids, polys, H, W)
    want = focal_np(pred[0], kp_np)
    got = jax.jit(kp_focal_loss)(logits, tg.kp_tgt)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kp_focal_from_points_matches_dense(setup):
    from instance_segmentation_tpu.losses import kp_focal_loss_from_points
    rng, cls_ids, polys, packed, tg = setup
    logits = rng.normal(size=(1, H, W, 1)).astype(np.float32)
    dense = jax.jit(kp_focal_loss)(logits, tg.kp_tgt)
    sparse = jax.jit(kp_focal_loss_from_points)(logits, tg)
    np.testing.assert_allclose(sparse, dense, rtol=1e-5)


def test_ae_loss(setup):
    rng, cls_ids, polys, packed, tg = setup
    ae = rng.normal(scale=0.5, size=(1, H, W, 4)).astype(np.float32)
    _, centers_np, dense_np, _, _ = annotations_np(cls_ids, polys, H, W)
    want = ae_loss_np(ae, [centers_np], [dense_np], H, W)
    got = jax.jit(lambda a, t: ae_loss(a, t, coordinate_grid(H, W)))(ae, tg)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_ae_loss_windowed_matches_exact_when_window_covers(setup):
    """A fixed AE window that contains every reference crop window gives the
    exact same loss as the full-image evaluation."""
    rng, cls_ids, polys, packed, tg = setup
    ae = rng.normal(scale=0.5, size=(1, H, W, 4)).astype(np.float32)
    xym = coordinate_grid(H, W)
    exact = jax.jit(lambda a, t: ae_loss(a, t, xym))(ae, tg)
    cfg = LossConfig(ae_window=(56, 80))
    windowed = jax.jit(lambda a, t: ae_loss(a, t, xym, cfg))(ae, tg)
    np.testing.assert_allclose(windowed, exact, rtol=1e-5)


def test_tangent_loss(setup):
    rng, cls_ids, polys, packed, tg = setup
    tan = rng.normal(size=(1, H, W, 2)).astype(np.float32)
    _, _, dense_np, normals_np, _ = annotations_np(cls_ids, polys, H, W)
    want = tangent_loss_np(tan, [dense_np], [normals_np])
    got = jax.jit(lambda t, tgt: tangent_loss(t, tgt))(tan, tg)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kp_focal_from_cnt_matches_from_points(setup):
    """The shared sample-count map's union is exactly the dense binary kp
    target, so the cnt-based focal must equal the sorted-point-list one."""
    from instance_segmentation_tpu.losses.losses import (
        ae_sample_count, kp_focal_loss_from_cnt, kp_focal_loss_from_points)
    rng, cls_ids, polys, packed, tg = setup
    kp = jnp.asarray(rng.normal(size=(1, H, W, 1)), jnp.float32)
    cnt = ae_sample_count(tg, H, W)
    a = jax.jit(kp_focal_loss_from_cnt)(kp, cnt)
    b = jax.jit(kp_focal_loss_from_points)(kp, tg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_tangent_loss_grad_finite_at_zero_field(setup):
    """Regression: the dense tangent form normalizes EVERY pixel; an
    underflowed-to-zero activation must not produce 0*inf = NaN in backward
    (observed as training NaN at ~step 1700 of the overfit demo)."""
    rng, cls_ids, polys, packed, tg = setup
    tan = jnp.zeros((1, H, W, 2), jnp.float32)
    g = jax.jit(jax.grad(lambda t: tangent_loss(t, tg)))(tan)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_compose_loss_finite(setup):
    rng, cls_ids, polys, packed, tg = setup
    anchors = jnp.asarray(generate_anchors(H, W, pyramid_levels=(3, 4, 5)))
    A = anchors.shape[0]
    outputs = (
        jnp.asarray(rng.normal(size=(1, H, W, 1)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, H, W, 4)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, H, W, 2)), jnp.float32),
        jnp.asarray(rng.normal(scale=0.1, size=(1, A, 4)), jnp.float32),
        jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(1, A, 8)))), jnp.float32),
    )
    total, stats = jax.jit(lambda o, t: compose_loss(o, t, anchors))(outputs, tg)
    assert np.isfinite(float(total))
    assert set(stats) == {"cls_loss", "wh_loss", "kp_loss", "ae_loss", "tan_loss", "total_loss"}
    np.testing.assert_allclose(
        float(total),
        float(stats["cls_loss"] + stats["wh_loss"] + stats["kp_loss"]
              + stats["ae_loss"] + stats["tan_loss"]), rtol=1e-6)


def test_compacted_scatters_match_full(setup):
    """ae_sample_count / tangent nmap through the valid-sample compaction
    (losses._compacted_scatter_add) are EXACT vs the full scatter, on both
    cond branches: budget that fits and budget that overflows (fallback)."""
    _, _, _, _, tg = setup
    from instance_segmentation_tpu.losses.losses import (
        LossConfig, ae_sample_count, tangent_loss)

    full = np.asarray(ae_sample_count(tg, H, W, sample_budget=0))
    n_valid = int(np.asarray(tg.pt_valid).sum())
    assert n_valid > 4  # fixture sanity: both branches below are exercised
    fits = np.asarray(ae_sample_count(tg, H, W, sample_budget=n_valid + 8))
    np.testing.assert_array_equal(fits, full)
    overflow = np.asarray(ae_sample_count(tg, H, W, sample_budget=4))
    np.testing.assert_array_equal(overflow, full)

    rng = np.random.default_rng(5)
    tan = jnp.asarray(rng.normal(size=(1, H, W, 2)), jnp.float32)
    ref = float(tangent_loss(tan, tg, LossConfig(sample_budget=0)))
    got = float(tangent_loss(tan, tg, LossConfig(sample_budget=n_valid + 8)))
    ovf = float(tangent_loss(tan, tg, LossConfig(sample_budget=4)))
    assert got == pytest.approx(ref, rel=1e-6)
    assert ovf == pytest.approx(ref, rel=1e-6)
