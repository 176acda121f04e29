"""Planar (per-channel [B,H,W] plane) loss layout vs the legacy NHWC layout.

The planar layout is a pure re-layout fast path (full-res NHWC maps with 1-4
trailing channels pad the TPU lane dim 32-128x): values and gradients must
match the NHWC path to float-op-reorder tolerance, and the model's planar
train-mode outputs must be exactly the slices of its NHWC outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from instance_segmentation_tpu.losses.losses import (
    LossConfig, compose_loss, coordinate_grid, kp_focal_loss_from_cnt,
    ae_sample_count, tangent_loss)
from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
from instance_segmentation_tpu.models.anchors import generate_anchors
from instance_segmentation_tpu.ops.targets import generate_targets


def _fixture(seed=0, B=2, H=128, W=256, M=8, P=128, n_real=4):
    rng = np.random.default_rng(seed)
    kp = jnp.asarray(rng.normal(0, 1, (B, H, W, 1)).astype(np.float32))
    ae = jnp.asarray(rng.normal(0, 1, (B, H, W, 4)).astype(np.float32))
    tan = jnp.asarray(rng.normal(0, 1, (B, H, W, 2)).astype(np.float32))
    A = 0
    polys = np.zeros((B, M, 8, 2), np.float32)
    nv = np.zeros((B, M), np.int32)
    ci = np.full((B, M), -1, np.int32)
    for b in range(B):
        for m in range(n_real):
            cy, cx = rng.uniform(20, H - 20), rng.uniform(30, W - 30)
            rh, rw = rng.uniform(8, 20), rng.uniform(10, 30)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang),
                                    cx + rw * np.cos(ang)], -1)
            nv[b, m] = 8
            ci[b, m] = rng.integers(0, 8)
        polys[b, n_real:] = polys[b, 0, 0]
    tg = generate_targets(jnp.asarray(polys), jnp.asarray(nv),
                          jnp.asarray(ci), H, W, max_points=P, dense_kp=False)
    return kp, ae, tan, tg


def _planar(kp, ae, tan):
    return (kp[..., 0],
            tuple(ae[..., c] for c in range(4)),
            tuple(tan[..., c] for c in range(2)))


def test_tangent_loss_planar_matches_nhwc():
    kp, ae, tan, tg = _fixture()
    legacy = float(tangent_loss(tan, tg))
    planar = float(tangent_loss((tan[..., 0], tan[..., 1]), tg))
    np.testing.assert_allclose(planar, legacy, rtol=1e-6)
    gl = jax.grad(lambda t: tangent_loss(t, tg))(tan)
    g0, g1 = jax.grad(lambda t: tangent_loss(t, tg))((tan[..., 0], tan[..., 1]))
    np.testing.assert_allclose(np.asarray(g0), np.asarray(gl)[..., 0],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(gl)[..., 1],
                               rtol=1e-5, atol=1e-7)


def test_kp_focal_planar_matches_nhwc():
    kp, ae, tan, tg = _fixture()
    cnt = ae_sample_count(tg, kp.shape[1], kp.shape[2])
    legacy = float(kp_focal_loss_from_cnt(kp, cnt))
    planar = float(kp_focal_loss_from_cnt(kp[..., 0], cnt))
    np.testing.assert_allclose(planar, legacy, rtol=1e-6)


def test_compose_loss_planar_matches_nhwc():
    kp, ae, tan, tg = _fixture()
    B, H, W = kp.shape[:3]
    cfg = EfficientSegConfig(num_classes=8, compound_coef=0)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels,
        anchor_scale=cfg.anchor_scale, scales=cfg.scales, ratios=cfg.ratios))
    A = anchors.shape[0]
    rng = np.random.default_rng(3)
    reg = jnp.asarray(rng.normal(0, 0.1, (B, A, 4)).astype(np.float32))
    cls = jnp.asarray(jax.nn.sigmoid(
        rng.normal(0, 1, (B, A, 8))).astype(np.float32))

    lcfg = LossConfig()
    tot_l, st_l = compose_loss((kp, ae, tan, reg, cls), tg, anchors, lcfg)
    tot_p, st_p = compose_loss(_planar(kp, ae, tan) + (reg, cls),
                               tg, anchors, lcfg)
    np.testing.assert_allclose(float(tot_p), float(tot_l), rtol=1e-5)
    for k in st_l:
        np.testing.assert_allclose(float(st_p[k]), float(st_l[k]), rtol=1e-5,
                                   err_msg=k)


def test_model_planar_outputs_are_slices():
    """Train-mode planar outputs == the NHWC outputs' channel slices."""
    cfg_p = EfficientSegConfig(num_classes=4, compound_coef=0,
                               planar_heads=True)
    cfg_n = EfficientSegConfig(num_classes=4, compound_coef=0,
                               planar_heads=False)
    mp, mn = EfficientSeg(cfg_p), EfficientSeg(cfg_n)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 128, 256, 3), dtype=np.uint8))
    v = jax.jit(lambda r: mn.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    rngs = {"dropout": jax.random.PRNGKey(1)}
    on, _ = mn.apply(v, x, train=True, rngs=rngs, mutable=["batch_stats"])
    op, _ = mp.apply(v, x, train=True, rngs=rngs, mutable=["batch_stats"])
    kp_n, ae_n, tan_n = on[0], on[1], on[2]
    kp_p, ae_p, tan_p = op[0], op[1], op[2]
    np.testing.assert_allclose(np.asarray(kp_p), np.asarray(kp_n)[..., 0],
                               atol=1e-6)
    for c in range(4):
        np.testing.assert_allclose(np.asarray(ae_p[c]),
                                   np.asarray(ae_n)[..., c], atol=1e-6)
    for c in range(2):
        np.testing.assert_allclose(np.asarray(tan_p[c]),
                                   np.asarray(tan_n)[..., c], atol=1e-6)
    # eval-mode outputs keep the NHWC contract regardless of the flag
    oe = mp.apply(v, x, train=False)
    assert oe[0].ndim == 4 and oe[0].shape[-1] == 1