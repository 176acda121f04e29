"""Decode parity: our on-device decode vs the reference's decode_output on
IDENTICAL model outputs.

Feeds the same synthetic head outputs (crafted confident detections +
continuous random kp/ae fields, so no float ties) through both pipelines and
compares the decoded instances: classes, scores, centers, and polygon point
sets. Validates box decode + NMS + top-k peak selection + affinity grouping
+ ghost filter + polygon assembly end to end against the live reference
implementation (run in place from the read-only mount with its missing
native deps stubbed)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")

H, W = 128, 256          # model-input resolution (divisible by stride 128)
OH, OW = 256, 512        # original resolution (target_size 2)
KP_TH = 2000
N_OBJ = 3


def _stub_modules():
    import torch

    if "torchvision" not in sys.modules:
        def batched_nms(boxes, scores, idxs, iou_threshold):
            b = boxes.numpy().astype(np.float64)
            s = scores.numpy()
            off = idxs.numpy().astype(np.float64) * (b.max() + 1.0)
            b = b + off[:, None]
            order = np.argsort(-s, kind="stable")
            keep, sup = [], np.zeros(len(b), bool)
            x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            areas = (x2 - x1) * (y2 - y1)
            for i in order:
                if sup[i]:
                    continue
                keep.append(i)
                xx1 = np.maximum(x1[i], x1); yy1 = np.maximum(y1[i], y1)
                xx2 = np.minimum(x2[i], x2); yy2 = np.minimum(y2[i], y2)
                inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
                iou = inter / np.maximum(areas[i] + areas - inter, 1e-8)
                sup |= iou > iou_threshold
                sup[i] = True
            return torch.tensor(keep, dtype=torch.long)

        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        bm = types.ModuleType("torchvision.ops.boxes")
        bm.batched_nms = batched_nms
        ops.boxes = bm; tv.ops = ops
        sys.modules.update({"torchvision": tv, "torchvision.ops": ops,
                            "torchvision.ops.boxes": bm})
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")
        skm.find_contours = lambda *a, **k: []
        sk.measure = skm
        sys.modules.update({"skimage": sk, "skimage.measure": skm})
    _orig = torch.Tensor.masked_select
    if not getattr(torch.Tensor.masked_select, "_patched", False):
        patched = lambda self, m: _orig(self, m.bool())
        patched._patched = True
        torch.Tensor.masked_select = patched


def _make_outputs():
    """Crafted outputs: 3 confident boxes whose keypoint field forms noisy
    boundary rings (the network's intended regime — continuous logits, no
    float ties, boundary peaks hugging each box)."""
    from instance_segmentation_tpu.models.anchors import generate_anchors
    rng = np.random.default_rng(7)
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5, 6, 7))
    A = anchors.shape[0]
    C = 8
    cls = np.full((1, A, C), 1e-3, np.float32)
    reg = np.zeros((1, A, 4), np.float32)
    kp = (rng.normal(-8.0, 0.3, (1, H, W, 1))).astype(np.float32)
    ae = (rng.normal(0.0, 0.05, (1, H, W, 4))).astype(np.float32)
    ae[..., 2:4] += 5.0                       # tight sigma around own pixel
    tan = rng.normal(size=(1, H, W, 2)).astype(np.float32)

    gts = [((30, 20), (70, 60), 1), ((40, 120), (100, 230), 4),
           ((80, 30), (120, 70), 6)]
    for (y1, x1), (y2, x2), c in gts:
        # boundary ring in the kp logits (strong, with noise — no ties)
        for y in range(y1, y2 + 1):
            for x in (x1, x2):
                kp[0, y, x, 0] = 8.0 + rng.normal(0, 0.3)
        for x in range(x1, x2 + 1):
            for y in (y1, y2):
                kp[0, y, x, 0] = 8.0 + rng.normal(0, 0.3)
        gt = np.array([x1, y1, x2, y2], np.float32)
        ax1, ay1, ax2, ay2 = anchors[:, 1], anchors[:, 0], anchors[:, 3], anchors[:, 2]
        iw = np.clip(np.minimum(ax2, gt[2]) - np.maximum(ax1, gt[0]), 0, None)
        ih = np.clip(np.minimum(ay2, gt[3]) - np.maximum(ay1, gt[1]), 0, None)
        inter = iw * ih
        union = (ax2 - ax1) * (ay2 - ay1) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter
        best = int(np.argmax(inter / np.clip(union, 1e-8, None)))
        cls[0, best, c] = float(rng.uniform(0.7, 0.95))
        aw, ah = ax2[best] - ax1[best], ay2[best] - ay1[best]
        acx, acy = (ax1[best] + ax2[best]) / 2, (ay1[best] + ay2[best]) / 2
        reg[0, best] = [((gt[1] + gt[3]) / 2 - acy) / ah,
                        ((gt[0] + gt[2]) / 2 - acx) / aw,
                        np.log((gt[3] - gt[1]) / ah), np.log((gt[2] - gt[0]) / aw)]
    return anchors, kp, ae, tan, reg, cls


@pytest.fixture(scope="module")
def both_decodes(tmp_path_factory):
    import torch
    import json as _json
    import cv2
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from configs import Config as RefConfig, Configer as RefConfiger
    from utils.tranform import CommonTransforms as RefTransforms, TransInfo as RefInfo
    from utils import decode as ref_decode

    anchors, kp, ae, tan, reg, cls = _make_outputs()

    # ---- reference decode -----------------------------------------------
    blob = _json.load(open(os.path.join(REF, "configs", "trans_cfg.json")))
    blob["val_trans"] = {"trans_seq": ["resize"], "resize": {"target_size": 2}}
    tmp = tmp_path_factory.mktemp("cfg")
    cfg_path = str(tmp / "trans.json")
    _json.dump(blob, open(cfg_path, "w"))
    transforms = RefTransforms(RefConfiger(configs=cfg_path), "val")
    dcfg = RefConfig(os.path.join(REF, "configs", "decode_cfg.yaml"))
    dcfg.draw_flag = False
    dcfg.kp_th = KP_TH
    ref_decode.target_size = 2
    dummy = str(tmp / "dummy.png")
    cv2.imwrite(dummy, np.zeros((OH, OW, 3), np.uint8))
    infos = [RefInfo(dummy, (OH, OW))]

    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    outs = ((t(kp.transpose(0, 3, 1, 2)), t(ae.transpose(0, 3, 1, 2)),
             t(tan.transpose(0, 3, 1, 2))),
            t(reg), t(cls), t(anchors[None]))
    with torch.no_grad():
        ref_dets = ref_decode.decode_output(
            t(np.zeros((1, 3, H, W), np.float32)), outs, infos, transforms,
            dcfg, torch.device("cpu"))[0]

    # ---- our decode -------------------------------------------------------
    import jax
    import jax.numpy as jnp
    from instance_segmentation_tpu.ops.decode import DecodeConfig, decode_output
    ours_cfg = DecodeConfig(kp_th=KP_TH, pre_nms=256, max_dets=16, max_poly=1024)
    outputs = tuple(map(jnp.asarray, (kp, ae, tan, reg, cls)))
    dets = jax.jit(lambda o: decode_output(
        o, jnp.asarray(anchors), OH, OW, 2.0, ours_cfg))(outputs)
    return ref_dets, dets


def test_instances_and_classes_match(both_decodes):
    ref_dets, dets = both_decodes
    obj_valid = np.asarray(dets.obj_valid[0])
    ours_cls = sorted(np.asarray(dets.classes[0])[obj_valid].tolist())
    ref_cls = sorted(int(d[0]) for d in ref_dets)
    assert ours_cls == ref_cls
    ours_conf = sorted(np.asarray(dets.scores[0])[obj_valid].tolist())
    ref_conf = sorted(float(d[1]) for d in ref_dets)
    np.testing.assert_allclose(ours_conf, ref_conf, rtol=1e-4)


def test_polygons_match(both_decodes):
    ref_dets, dets = both_decodes
    obj_valid = np.asarray(dets.obj_valid[0])
    polys = np.asarray(dets.polygons[0])
    lens = np.asarray(dets.poly_len[0])
    classes = np.asarray(dets.classes[0])

    ref_by_cls = {int(d[0]): np.asarray(d[3], np.float64) for d in ref_dets}
    for d in np.nonzero(obj_valid)[0]:
        c = int(classes[d])
        assert c in ref_by_cls
        ours = polys[d][: lens[d]].astype(np.float64)
        ref = ref_by_cls[c]
        assert ours.shape[0] == ref.shape[0], (c, ours.shape, ref.shape)
        # compare as point sets (ordering starts at different angles)
        ours_s = ours[np.lexsort(ours.T)]
        ref_s = ref[np.lexsort(ref.T)]
        np.testing.assert_allclose(ours_s, ref_s, atol=1e-3)
