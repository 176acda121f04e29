"""Edge cases: empty labels, no detections, border instances, overflow."""

import numpy as np
import jax
import jax.numpy as jnp

from instance_segmentation_tpu.data.packing import pack_batch
from instance_segmentation_tpu.losses import LossConfig, compose_loss
from instance_segmentation_tpu.models.anchors import generate_anchors
from instance_segmentation_tpu.ops.decode import DecodeConfig, decode_output
from instance_segmentation_tpu.ops.targets import generate_targets

H, W = 64, 128


def test_empty_labels_give_finite_losses():
    packed = pack_batch([([], [])], max_instances=4, max_verts=8)
    tg = jax.jit(lambda p, n, c: generate_targets(p, n, c, H, W, max_points=64))(
        packed.polys, packed.n_verts, packed.cls_ids)
    assert int(np.asarray(tg.inst_valid).sum()) == 0
    assert np.asarray(tg.kp_tgt).sum() == 0

    rng = np.random.default_rng(0)
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
    assert float(stats["ae_loss"]) == 0.0
    assert float(stats["tan_loss"]) == 0.0
    assert float(stats["wh_loss"]) == 0.0


def test_empty_loss_has_finite_gradients():
    packed = pack_batch([([], [])], max_instances=4, max_verts=8)
    tg = generate_targets(jnp.asarray(packed.polys), jnp.asarray(packed.n_verts),
                          jnp.asarray(packed.cls_ids), H, W, max_points=64)
    anchors = jnp.asarray(generate_anchors(H, W, pyramid_levels=(3, 4, 5)))
    A = anchors.shape[0]
    rng = np.random.default_rng(1)
    outputs = tuple(jnp.asarray(x, jnp.float32) for x in (
        rng.normal(size=(1, H, W, 1)), rng.normal(size=(1, H, W, 4)),
        rng.normal(size=(1, H, W, 2)), rng.normal(scale=0.1, size=(1, A, 4)),
        1 / (1 + np.exp(-rng.normal(size=(1, A, 8))))))

    def loss_fn(outs):
        return compose_loss(outs, tg, anchors)[0]

    grads = jax.jit(jax.grad(loss_fn))(outputs)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_decode_nothing_above_threshold():
    rng = np.random.default_rng(2)
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    outputs = (
        jnp.asarray(rng.normal(size=(1, H, W, 1)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, H, W, 4)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, H, W, 2)), jnp.float32),
        jnp.zeros((1, A, 4), jnp.float32),
        jnp.full((1, A, 8), 0.01, jnp.float32),    # all below cls_th
    )
    cfg = DecodeConfig(kp_th=512, pre_nms=32, max_dets=8, max_poly=64)
    dets = jax.jit(lambda o: decode_output(o, jnp.asarray(anchors),
                                           2 * H, 2 * W, 2.0, cfg))(outputs)
    assert not np.asarray(dets.det_valid).any()
    assert not np.asarray(dets.obj_valid).any()
    assert (np.asarray(dets.poly_len) == 0).all()


def test_border_touching_instance():
    """Instance hugging the image border: samples within 2px of the border
    are dropped (ref target_generator.py:261), the rest survive."""
    poly = np.array([[0, 0], [0, 40], [20, 40], [20, 0]], np.int32)  # touches top/left
    packed = pack_batch([([1], [poly])], max_instances=2, max_verts=8)
    tg = jax.jit(lambda p, n, c: generate_targets(p, n, c, H, W, max_points=128))(
        packed.polys, packed.n_verts, packed.cls_ids)
    pts = np.asarray(tg.points[0, 0])
    val = np.asarray(tg.pt_valid[0, 0])
    assert val.sum() > 0
    assert (pts[val][:, 0] > 1).all() and (pts[val][:, 1] > 1).all()


def test_degenerate_polygon_instance():
    """A 2-vertex 'polygon' (zero area) must not break target generation."""
    line = np.array([[10, 10], [10, 30]], np.int32)
    packed = pack_batch([([0], [line])], max_instances=2, max_verts=8)
    tg = jax.jit(lambda p, n, c: generate_targets(p, n, c, H, W, max_points=64))(
        packed.polys, packed.n_verts, packed.cls_ids)
    assert np.isfinite(np.asarray(tg.normals)).all()
    assert np.asarray(tg.pt_valid).sum() > 0   # samples along the segment
