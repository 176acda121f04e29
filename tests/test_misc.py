"""Configs, packing, meters, k-means, and registry tests."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from instance_segmentation_tpu.configs import (
    Config, Configer, StaticShapes, parse_anchor_expr,
)
from instance_segmentation_tpu.data.packing import pack_batch, pack_label
from instance_segmentation_tpu.ops.kmeans import kmeans
from instance_segmentation_tpu.utils.meters import APMeter, AverageMeter, average_precision


def test_config_attr_tree(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("data:\n  batch_size: 4\n  name: x\nlr: 0.1\n")
    cfg = Config(str(p))
    assert cfg.data.batch_size == 4
    assert cfg.lr == 0.1
    with pytest.raises(AttributeError, match="cfg.data.missing"):
        cfg.data.missing
    assert cfg.get("absent") is None
    assert cfg.to_dict()["data"]["name"] == "x"


def test_configer_paths():
    c = Configer({"a": {"b": {"c": 1}}})
    assert c.get("a", "b", "c") == 1
    assert c.exists("a", "b")
    assert not c.exists("a", "z")
    c.update(("a", "d"), 5)
    assert c.get("a", "d") == 5


def test_parse_anchor_expr():
    scales = parse_anchor_expr("[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]")
    assert np.allclose(scales, [1.0, 2 ** (1 / 3), 2 ** (2 / 3)])
    ratios = parse_anchor_expr("[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)]")
    assert ratios[1] == (1.4, 0.7)
    with pytest.raises(ValueError):
        parse_anchor_expr("__import__('os')")


def test_pack_label_pads_and_truncates():
    big = np.array([[0, 0], [0, 100], [100, 100], [100, 0]], np.float32)
    small = np.array([[0, 0], [0, 2], [2, 2]], np.float32)
    polys, n_verts, cls_ids = pack_label([1, 2, 3], [big, small, big],
                                         max_instances=2, max_verts=8)
    # keeps the two largest by bbox area
    assert (cls_ids == [1, 3]).all()
    assert n_verts[0] == 4
    # replication padding
    np.testing.assert_array_equal(polys[0][4], polys[0][3])


def test_pack_polygon_decimation():
    n = 50
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poly = np.stack([10 + 5 * np.cos(t), 10 + 5 * np.sin(t)], 1)
    polys, n_verts, _ = pack_label([0], [poly], 4, 16)
    assert n_verts[0] <= 16


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal((0, 0), 0.1, (32, 2))
    b = rng.normal((5, 5), 0.1, (32, 2))
    pts = jnp.asarray(np.vstack([a, b]), jnp.float32)
    init = jnp.asarray([[0.5, 0.5], [4.0, 4.0]], jnp.float32)
    labels, centers = kmeans(pts, init, num_iters=10)
    labels = np.asarray(labels)
    assert (labels[:32] == labels[0]).all()
    assert (labels[32:] == labels[32]).all()
    assert labels[0] != labels[32]
    # outlier gate
    pts2 = jnp.concatenate([pts, jnp.asarray([[100.0, 100.0]])])
    labels2, _ = kmeans(pts2, init, max_distance=10.0, num_iters=10)
    assert int(labels2[-1]) == 2


def test_meters_and_ap():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    ap = average_precision(np.array([0.5, 1.0]), np.array([1.0, 0.5]))
    assert 0.5 < ap <= 1.0
    apm = APMeter(2)
    apm.add_gt(0, 2)
    apm.add(0, 0.9, True)
    apm.add(0, 0.8, True)
    assert apm.class_ap(0) == 1.0


def test_cityscapes_label_table():
    from instance_segmentation_tpu.data import cityscapes as cs
    assert cs.num_cls == 8
    assert cs.name2index["person"] == 0
    assert cs.name2index["bicycle"] == 7
    assert [l[2] for l in cs.class_labels] == [24, 25, 26, 27, 28, 31, 32, 33]


def test_coco_cls_conversion():
    from instance_segmentation_tpu.data.coco import convert_cls_id_to_index
    assert convert_cls_id_to_index(1) == 0
    assert convert_cls_id_to_index(13) == 11   # after skipping id 12
    assert convert_cls_id_to_index(90) == 79


def test_instance_ap_perfect_predictions():
    from instance_segmentation_tpu.evaluation import (
        InstancePrediction, compute_instance_ap,
    )
    from instance_segmentation_tpu.evaluation.cityscapes_ap import InstanceGT
    sq = np.array([[10, 10], [60, 10], [60, 60], [10, 60]], np.float32)
    sq2 = sq + 100
    preds = [InstancePrediction("img", 0, 0.9, sq),
             InstancePrediction("img", 0, 0.8, sq2)]
    gts = [InstanceGT("img", 0, sq), InstanceGT("img", 0, sq2)]
    res = compute_instance_ap(preds, gts, {"img": (256, 256)}, num_classes=8)
    assert res["AP"] == 1.0 and res["AP50"] == 1.0
    # shifted prediction: perfect at 0.5 overlap, misses at high overlaps
    preds2 = [InstancePrediction("img", 0, 0.9, sq + 8),
              InstancePrediction("img", 0, 0.8, sq2)]
    res2 = compute_instance_ap(preds2, gts, {"img": (256, 256)}, num_classes=8)
    assert 0.0 < res2["AP"] < 1.0
