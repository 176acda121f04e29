"""Space-to-depth U-Net execution (models/s2d.py) vs the standard path.

The s2d path must be numerically EXACT (same math, reassociated sums): same
parameter tree, same forward outputs, same BN batch-stat updates, same
gradients — in f32 to tolerance ~1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instance_segmentation_tpu.models.s2d import (
    depth_to_space, s2d_conv_kernel, s2d_upconv_matrix, space_to_depth,
)
from instance_segmentation_tpu.models.unet_decoder import UNetDecoder


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)),
                    jnp.float32)
    for r in (2, 4):
        y = space_to_depth(x, r)
        assert y.shape == (2, 8 // r, 12 // r, 5 * r * r)
        np.testing.assert_array_equal(depth_to_space(y, r), x)


@pytest.mark.parametrize("r,stride,k", [(2, 1, 3), (2, 1, 5), (2, 2, 3),
                                         (2, 2, 5), (4, 1, 3), (4, 2, 3)])
def test_s2d_depthwise_shift_exact(r, stride, k):
    """The shifted multiply-add depthwise (both strides) equals the real
    TF-SAME depthwise conv on the equivalent full-res tensor. (CPU math
    check; the TPU-backend check — where the naive formulation of this op
    MISCOMPILES — is tools/check_tpu_parity.py --shift-sweep.)"""
    from instance_segmentation_tpu.models.s2d import s2d_depthwise_shift
    rng = np.random.default_rng(11)
    B, H, W, C = 2, 16, 24, 5
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    kd = jnp.asarray(rng.normal(size=(k, k, 1, C)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kd, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    r_out = r // stride
    ref = space_to_depth(ref, r_out) if r_out > 1 else ref
    got = s2d_depthwise_shift(space_to_depth(x, r), kd, r, stride=stride)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("r", [2, 4])
def test_s2d_conv_kernel_exact(r):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    w = s2d_conv_kernel(k, r)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, r), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(got, r)),
                               np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("r_out", [2, 4])
def test_s2d_upconv_exact(r_out):
    rng = np.random.default_rng(2)
    r_in = r_out // 2
    x = jnp.asarray(rng.normal(size=(2, 8 * r_in, 12 * r_in, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 5, 6)), jnp.float32)
    import flax.linen as nn
    mod = nn.ConvTranspose(6, kernel_size=(2, 2), strides=(2, 2),
                           padding="VALID")
    ref = mod.apply({"params": {"kernel": k, "bias": jnp.zeros((6,))}}, x)
    w = s2d_upconv_matrix(k, r_out)
    xs = space_to_depth(x, r_in) if r_in > 1 else x
    got = xs @ w
    np.testing.assert_allclose(np.asarray(depth_to_space(got, r_out)),
                               np.asarray(ref), atol=1e-4, rtol=1e-5)


def _decoder_fixture():
    rng = np.random.default_rng(3)
    B, H, W = 2, 64, 96
    image = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    chans = [16, 24, 40, 112, 320]          # B0 feature channels
    blocks = [jnp.asarray(rng.normal(size=(B, H // (2 ** (i + 1)),
                                           W // (2 ** (i + 1)), c)),
                          jnp.float32) for i, c in enumerate(chans)]
    return image, blocks


def test_unet_s2d_matches_standard():
    image, blocks = _decoder_fixture()
    std = UNetDecoder(s2d=False)
    s2d = UNetDecoder(s2d=True)
    var = std.init(jax.random.PRNGKey(0), image, blocks, False)
    var2 = s2d.init(jax.random.PRNGKey(0), image, blocks, False)
    # identical parameter trees (paths, shapes, values)
    jax.tree.map(np.testing.assert_array_equal, var["params"], var2["params"])

    outs_std = std.apply(var, image, blocks, False)
    outs_s2d = s2d.apply(var, image, blocks, False)
    for a, b in zip(outs_std, outs_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


def test_unet_s2d_train_mode_gating():
    """s2d="train" runs the standard path at eval and the s2d path in
    training, from ONE shared parameter tree (they are identical)."""
    image, blocks = _decoder_fixture()
    gated = UNetDecoder(s2d="train")
    std = UNetDecoder(s2d=False)
    s2d = UNetDecoder(s2d=True)
    var = gated.init(jax.random.PRNGKey(0), image, blocks, False)

    outs_eval = gated.apply(var, image, blocks, False)
    outs_std = std.apply(var, image, blocks, False)
    for a, b in zip(outs_std, outs_eval):          # eval == standard bitwise
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def train_out(module):
        outs, _ = module.apply(var, image, blocks, True,
                               mutable=["batch_stats"])
        return outs
    for a, b in zip(train_out(s2d), train_out(gated)):  # train == s2d bitwise
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_unet_s2d_train_stats_and_grads_match():
    image, blocks = _decoder_fixture()
    std = UNetDecoder(s2d=False)
    s2d = UNetDecoder(s2d=True)
    var = std.init(jax.random.PRNGKey(0), image, blocks, False)

    def loss_fn(module, params):
        def f(p):
            outs, mut = module.apply(
                {"params": p, "batch_stats": var["batch_stats"]},
                image, blocks, True, mutable=["batch_stats"])
            return sum(jnp.sum(o * o) for o in outs), mut["batch_stats"]
        return jax.value_and_grad(f, has_aux=True)(params)

    (l_std, bs_std), g_std = loss_fn(std, var["params"])
    (l_s2d, bs_s2d), g_s2d = loss_fn(s2d, var["params"])
    np.testing.assert_allclose(float(l_s2d), float(l_std), rtol=1e-5)
    # BN running stats updated identically (finest-stage stats phase-grouped)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), bs_std, bs_s2d)
    flat_std = jax.tree.leaves(g_std)
    flat_s2d = jax.tree.leaves(g_s2d)
    for a, b in zip(flat_std, flat_s2d):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        # atol floor 5e-3: conv biases feeding straight into BN have an
        # ANALYTICALLY ZERO gradient (mean subtraction absorbs them); both
        # paths produce only cancellation noise there, and the noise differs.
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   atol=5e-3)


def test_backbone_s2d_matches_standard():
    """Backbone stem + /2 stage in s2d(2): identical parameter tree, equal
    forward features, equal BN stat updates, close grads (B0 arch)."""
    from instance_segmentation_tpu.models.efficientnet import (
        EfficientNetFeatures)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    std = EfficientNetFeatures(variant=0, s2d=False)
    s2d = EfficientNetFeatures(variant=0, s2d=True)
    key = jax.random.PRNGKey(0)
    var = std.init({"params": key, "dropout": key}, x, False)
    var2 = s2d.init({"params": key, "dropout": key}, x, False)
    jax.tree.map(np.testing.assert_array_equal, var["params"], var2["params"])

    outs_std = std.apply(var, x, False)
    outs_s2d = s2d.apply(var, x, False)
    assert len(outs_std) == len(outs_s2d)
    for a, b in zip(outs_std, outs_s2d):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=1e-4)

    def loss_fn(module, params):
        def f(p):
            outs, mut = module.apply(
                {"params": p, "batch_stats": var["batch_stats"]}, x, True,
                mutable=["batch_stats"], rngs={"dropout": key})
            return sum(jnp.sum(o * o) for o in outs), mut["batch_stats"]
        return jax.value_and_grad(f, has_aux=True)(params)

    (l_std, bs_std), g_std = loss_fn(std, var["params"])
    (l_s2d, bs_s2d), g_s2d = loss_fn(s2d, var["params"])
    np.testing.assert_allclose(float(l_s2d), float(l_std), rtol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4), bs_std, bs_s2d)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_s2d)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=5e-3)


def test_backbone_s2d_train_mode_gating():
    from instance_segmentation_tpu.models.efficientnet import (
        EfficientNetFeatures)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    gated = EfficientNetFeatures(variant=0, s2d="train")
    std = EfficientNetFeatures(variant=0, s2d=False)
    key = jax.random.PRNGKey(0)
    var = gated.init({"params": key, "dropout": key}, x, False)
    for a, b in zip(std.apply(var, x, False), gated.apply(var, x, False)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_unet_packed_heads_match_standard():
    """Packed inference output (kp_full [B,H,W] + heads_s2d [B,H/4,W/4,7*16])
    carries exactly the standard head maps, from the same parameter tree."""
    from instance_segmentation_tpu.models.s2d import depth_to_space
    image, blocks = _decoder_fixture()
    std = UNetDecoder(s2d=False)
    packed = UNetDecoder(packed=True)
    var = std.init(jax.random.PRNGKey(0), image, blocks, False)
    var2 = packed.init(jax.random.PRNGKey(0), image, blocks, False)
    jax.tree.map(np.testing.assert_array_equal, var["params"], var2["params"])

    kp, ae, tan = std.apply(var, image, blocks, False)
    kp_full, heads_s2d = packed.apply(var, image, blocks, False)
    assert kp_full.shape == image.shape[:3]
    full = depth_to_space(heads_s2d, 4)
    np.testing.assert_array_equal(np.asarray(kp_full), np.asarray(full[..., 0]))
    for a, b in ((kp[..., 0], full[..., 0]), (ae, full[..., 1:5]),
                 (tan, full[..., 5:7])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


def test_decode_output_packed_exact():
    """decode_output_packed on s2d-packed maps is BIT-EXACT vs decode_output
    on the unpacked maps (the packed gather is pure integer index math)."""
    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.models.s2d import space_to_depth
    from instance_segmentation_tpu.ops.decode import (
        DecodeConfig, decode_output, decode_output_packed)

    B, H, W = 2, 128, 256
    cfg = EfficientSegConfig(num_classes=8, compound_coef=0)
    model = EfficientSeg(cfg)
    images = jnp.asarray(np.random.default_rng(5).integers(
        0, 255, (B, H, W, 3), dtype=np.uint8))
    var = model.init({"params": jax.random.PRNGKey(1)}, images, train=False)
    kp, ae, tan, reg, cls = model.apply(var, images, train=False)

    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig(kp_th=256, pre_nms=64, max_dets=16, max_poly=64)
    packed_maps = space_to_depth(jnp.concatenate([kp, ae, tan], axis=-1), 4)
    d1 = decode_output((kp, ae, tan, reg, cls), anchors, 2 * H, 2 * W, 2.0, dcfg)
    d2 = decode_output_packed((kp[..., 0], packed_maps, reg, cls),
                              anchors, 2 * H, 2 * W, 2.0, dcfg)
    for name, a, b in zip(d1._fields, d1, d2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_model_packed_heads_end_to_end():
    """EfficientSeg(packed_heads=True) composes with decode_output_packed and
    matches the standard forward+decode detections (f32)."""
    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.ops.decode import (
        DecodeConfig, decode_output, decode_output_packed)

    B, H, W = 1, 128, 256
    cfg = EfficientSegConfig(num_classes=8, compound_coef=0)
    model = EfficientSeg(cfg)
    images = jnp.asarray(np.random.default_rng(9).integers(
        0, 255, (B, H, W, 3), dtype=np.uint8))
    var = model.init({"params": jax.random.PRNGKey(2)}, images, train=False)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig(kp_th=256, pre_nms=64, max_dets=16, max_poly=64)
    d1 = decode_output(model.apply(var, images, train=False),
                       anchors, 2 * H, 2 * W, 2.0, dcfg)
    d2 = decode_output_packed(
        model.apply(var, images, train=False, packed_heads=True),
        anchors, 2 * H, 2 * W, 2.0, dcfg)
    # boxes come from the identical detector branch; polygons depend on peak
    # selection over near-identical (reassociated f32) kp maps
    np.testing.assert_array_equal(np.asarray(d1.boxes), np.asarray(d2.boxes))
    np.testing.assert_array_equal(np.asarray(d1.det_valid),
                                  np.asarray(d2.det_valid))
    assert int(jnp.sum(d1.obj_valid)) == int(jnp.sum(d2.obj_valid))


def test_backbone_stem_s2d_matches_standard():
    """s2d="stem" (the packed-inference backbone mode) runs only the stem on
    the cell grid and exits to the standard layout — equal features."""
    from instance_segmentation_tpu.models.efficientnet import (
        EfficientNetFeatures)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    std = EfficientNetFeatures(variant=0, s2d=False)
    stem = EfficientNetFeatures(variant=0, s2d="stem")
    key = jax.random.PRNGKey(0)
    var = std.init({"params": key, "dropout": key}, x, False)
    var2 = stem.init({"params": key, "dropout": key}, x, False)
    jax.tree.map(np.testing.assert_array_equal, var["params"], var2["params"])
    for a, b in zip(std.apply(var, x, False), stem.apply(var, x, False)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=1e-4)
