"""Decode pipeline unit tests: NMS, peak selection, grouping, assembly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_segmentation_tpu.ops.decode import (
    DecodeConfig, Detections, bbox_transform, decode_boxes, decode_output,
    greedy_nms, select_peaks,
)
from instance_segmentation_tpu.ops.geometry import (
    point_in_polygon, polygon_area, rasterize_polygon,
)


def nms_oracle(boxes, scores, th):
    """Classic greedy NMS (ref utils/nms.py:11-39 semantics, strict >)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or sup[j]:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-8) > th:
                sup[j] = True
    return sorted(keep)


def test_greedy_nms_matches_oracle():
    rng = np.random.default_rng(1)
    n = 64
    xy = rng.uniform(0, 80, size=(n, 2))
    wh = rng.uniform(5, 30, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    order = np.argsort(-scores)
    sorted_boxes = boxes[order]
    keep = jax.jit(lambda b, v: greedy_nms(b, v, 0.3))(
        jnp.asarray(sorted_boxes), jnp.ones(n, bool))
    got = sorted(order[np.asarray(keep)])
    want = nms_oracle(boxes, scores, 0.3)
    assert got == want


def test_leader_nms_matches_greedy():
    from instance_segmentation_tpu.ops.decode import leader_nms
    rng = np.random.default_rng(2)
    n = 64
    xy = rng.uniform(0, 80, size=(n, 2))
    wh = rng.uniform(5, 30, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    order = np.argsort(-scores)
    sb = jnp.asarray(boxes[order])
    valid = jnp.ones(n, bool)
    keep_mask = np.asarray(jax.jit(lambda b, v: greedy_nms(b, v, 0.3))(sb, valid))
    idx, ok = jax.jit(lambda b, v: leader_nms(b, v, 0.3, 16))(sb, valid)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert list(idx[ok]) == list(np.nonzero(keep_mask)[0][:ok.sum()])
    # partially-invalid input
    valid2 = jnp.asarray(scores[order] > 0.5)
    keep2 = np.asarray(jax.jit(lambda b, v: greedy_nms(b, v, 0.3))(sb, valid2))
    idx2, ok2 = jax.jit(lambda b, v: leader_nms(b, v, 0.3, 16))(sb, valid2)
    assert list(np.asarray(idx2)[np.asarray(ok2)]) == list(np.nonzero(keep2)[0][:np.asarray(ok2).sum()])


def test_bbox_transform_identity():
    anchors = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])  # y1,x1,y2,x2
    zeros = jnp.zeros((1, 4))
    out = np.asarray(bbox_transform(anchors, zeros, 128, 128))
    np.testing.assert_allclose(out[0], [20, 10, 60, 50], atol=1e-5)  # x1,y1,x2,y2


def test_select_peaks():
    hm = np.zeros((32, 48), np.float32)
    hm[5, 7] = 3.0
    hm[5, 8] = 2.0     # adjacent, lower -> not a peak
    hm[20, 30] = 4.0
    idx, ok = jax.jit(lambda h: select_peaks(h, 16))(jnp.asarray(hm))
    idx, ok = np.asarray(idx), np.asarray(ok)
    peaks = set(map(int, idx[ok]))
    assert 5 * 48 + 7 in peaks
    assert 20 * 48 + 30 in peaks
    assert 5 * 48 + 8 not in peaks


def test_select_peaks_approx_topk():
    """The exact_topk=False branch (lax.approx_max_k, DecodeConfig docstring):
    well-separated peaks far above the selection threshold must be found
    identically to the exact path — approximation only reorders membership
    near the k-th value."""
    from instance_segmentation_tpu.ops.decode import select_peaks_batch
    rng = np.random.default_rng(7)
    hm = rng.uniform(0.0, 0.1, size=(2, 64, 96)).astype(np.float32)
    strong = [(5, 7), (20, 30), (40, 80)]
    for b in range(2):
        for i, (y, x) in enumerate(strong):
            hm[b, y, x] = 3.0 + i
    idx_e, ok_e = jax.jit(lambda h: select_peaks_batch(h, 64, exact=True))(
        jnp.asarray(hm))
    idx_a, ok_a = jax.jit(lambda h: select_peaks_batch(h, 64, exact=False))(
        jnp.asarray(hm))
    for b in range(2):
        exact_peaks = set(map(int, np.asarray(idx_e)[b][np.asarray(ok_e)[b]]))
        approx_peaks = set(map(int, np.asarray(idx_a)[b][np.asarray(ok_a)[b]]))
        for y, x in strong:
            assert y * 96 + x in exact_peaks
            assert y * 96 + x in approx_peaks


def test_exact_topk_indices():
    from instance_segmentation_tpu.ops.decode import exact_topk_indices
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    x[0, 100] = x[0, 200] = 5.0    # exact ties
    vals, idx = jax.jit(lambda x: exact_topk_indices(x, 128))(jnp.asarray(x))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b in range(2):
        want = set(np.argsort(-x[b], kind="stable")[:128].tolist())
        got = set(idx[b].tolist())
        # same value threshold; tie membership may differ only among equal values
        assert len(got) == 128
        got_vals = np.sort(x[b][sorted(got)])
        want_vals = np.sort(x[b][sorted(want)])
        np.testing.assert_array_equal(got_vals, want_vals)
        # indices come back in ascending order
        assert np.all(np.diff(idx[b]) > 0)


def test_exact_topk_degenerate_brackets():
    """Partition-pass bracketing edge cases: constant rows (step==0 after one
    pass), k == N, all-negative rows, and +/-inf extremes."""
    from instance_segmentation_tpu.ops.decode import exact_topk_indices
    N, k = 1024, 64
    rows = np.stack([
        np.full(N, 3.25, np.float32),                       # constant
        -np.abs(np.random.default_rng(0).normal(size=N)).astype(np.float32),
        np.linspace(-1e30, 1e30, N, dtype=np.float32),      # huge range
        np.where(np.arange(N) % 7 == 0, np.float32(np.inf),
                 np.float32(-np.inf)),                      # inf plateau
    ])
    vals, idx = jax.jit(lambda x: exact_topk_indices(x, k))(jnp.asarray(rows))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b in range(rows.shape[0]):
        assert len(set(idx[b].tolist())) == k
        got = np.sort(rows[b][idx[b]])
        want = np.sort(np.sort(rows[b])[::-1][:k])
        np.testing.assert_array_equal(got, want)
        assert np.all(np.diff(idx[b]) > 0)
    # k == N: every index, ascending
    vals, idx = jax.jit(lambda x: exact_topk_indices(x, N))(jnp.asarray(rows))
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(N))


def test_render_masks_on_device():
    """End-to-end: decoded polygons rasterize to masks on device that agree
    with cv2.fillPoly of the same polygons."""
    import cv2
    from instance_segmentation_tpu.ops.decode import render_masks
    H, W = 128, 192
    kp, ae, tan, squares = _synthetic_scene(H, W)
    from instance_segmentation_tpu.models.anchors import generate_anchors
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    cls_prob = np.full((1, A, 3), 1e-3, np.float32)
    reg = np.zeros((1, A, 4), np.float32)
    for (y1, x1), (y2, x2), cls in squares:
        gt = np.array([x1, y1, x2, y2], np.float32)
        ax1, ay1, ax2, ay2 = anchors[:, 1], anchors[:, 0], anchors[:, 3], anchors[:, 2]
        iw = np.clip(np.minimum(ax2, gt[2]) - np.maximum(ax1, gt[0]), 0, None)
        ih = np.clip(np.minimum(ay2, gt[3]) - np.maximum(ay1, gt[1]), 0, None)
        inter = iw * ih
        union = (ax2 - ax1) * (ay2 - ay1) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter
        best = int(np.argmax(inter / np.clip(union, 1e-8, None)))
        cls_prob[0, best, cls] = 0.9
        aw, ah = ax2[best] - ax1[best], ay2[best] - ay1[best]
        acx, acy = (ax1[best] + ax2[best]) / 2, (ay1[best] + ay2[best]) / 2
        reg[0, best] = [((gt[1] + gt[3]) / 2 - acy) / ah, ((gt[0] + gt[2]) / 2 - acx) / aw,
                        np.log((gt[3] - gt[1]) / ah), np.log((gt[2] - gt[0]) / aw)]
    cfg = DecodeConfig(kp_th=2000, pre_nms=64, max_dets=8, max_poly=512)
    outputs = tuple(map(jnp.asarray, (kp, ae, tan, reg, cls_prob)))
    dets = jax.jit(lambda o: decode_output(
        o, jnp.asarray(anchors), H * 2, W * 2, 2.0, cfg))(outputs)
    masks = np.asarray(jax.jit(
        lambda d: render_masks(d, H * 2, W * 2, max_masks=4))(dets))
    obj_valid = np.asarray(dets.obj_valid[0])[:4]
    polys = np.asarray(dets.polygons[0])
    lens = np.asarray(dets.poly_len[0])
    assert masks.shape == (1, 4, H * 2, W * 2)
    for d in range(4):
        if not obj_valid[d]:
            assert masks[0, d].sum() == 0
            continue
        ref = np.zeros((H * 2, W * 2), np.uint8)
        cv2.fillPoly(ref, [polys[d][: lens[d]].astype(np.int32)], 1)
        inter = np.logical_and(masks[0, d], ref).sum()
        union = np.logical_or(masks[0, d], ref).sum()
        assert inter / union > 0.97       # <=1px boundary conventions differ


def test_decode_centers():
    from instance_segmentation_tpu.ops.decode import decode_centers
    H, W = 64, 96
    conf = np.zeros((H, W), np.float32)
    cls = np.zeros((H, W), np.int32)
    wh = np.zeros((H, W, 2), np.float32)
    conf[20, 30] = 0.9; cls[20, 30] = 2; wh[20, 30] = (10, 14)
    conf[40, 70] = 0.8; cls[40, 70] = 5; wh[40, 70] = (8, 8)
    conf[21, 30] = 0.5     # adjacent non-peak
    centers, classes, confs, whs, ok = jax.jit(
        lambda c, k, w: decode_centers(c, k, w, num_centers=32))(
        jnp.asarray(conf), jnp.asarray(cls), jnp.asarray(wh))
    ok = np.asarray(ok)
    got = {tuple(c) for c in np.asarray(centers)[ok].tolist()}
    assert got == {(20, 30), (40, 70)}
    assert set(np.asarray(classes)[ok].tolist()) == {2, 5}


def test_host_image_utils():
    from instance_segmentation_tpu.utils.image import (
        compute_iou_for_poly, is_cover, poly_to_mask,
    )
    sq = np.array([[2, 2], [10, 2], [10, 10], [2, 10]], np.float32)
    m = poly_to_mask(sq, (16, 16))
    assert m.sum() == 81
    assert compute_iou_for_poly(sq, sq) == 1.0
    inner = np.array([[4, 4], [8, 4], [8, 8], [4, 8]], np.float32)
    assert is_cover(m, poly_to_mask(inner, (16, 16)))


def test_point_in_polygon_and_area():
    sq = jnp.asarray([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    assert bool(point_in_polygon(jnp.asarray([5.0, 5.0]), sq))
    assert not bool(point_in_polygon(jnp.asarray([15.0, 5.0]), sq))
    assert float(polygon_area(sq, jnp.int32(4))) == 100.0


def test_internal_point_fallback_concave():
    """U-shape whose box center AND member mean sit in the concavity: the
    bounded pair-midpoint fallback (ref decode.py:51-68 tries all O(n^2)
    pairs) must still find a strictly interior point."""
    from instance_segmentation_tpu.ops.decode import _find_internal_point

    u = np.array([[0, 0], [10, 0], [10, 10], [7, 10], [7, 3],
                  [3, 3], [3, 10], [0, 10]], np.float32)
    # densify the perimeter so n >> n_pairs and a prefix window would see
    # only the (colinear) bottom edge — the spread candidates must cover it
    dense = []
    for i in range(len(u)):
        a, b = u[i], u[(i + 1) % len(u)]
        for t in np.linspace(0.0, 1.0, 6, endpoint=False):
            dense.append(a + t * (b - a))
    pts = np.asarray(dense, np.float32)                       # [48, 2]
    n = len(pts)
    Q = 64
    padded = np.concatenate([pts, np.repeat(pts[:1], Q - n, 0)], 0)

    default = jnp.asarray([5.0, 6.0])                         # in the gap
    assert not bool(point_in_polygon(default, jnp.asarray(padded)))
    mean = pts.mean(0)
    assert not bool(point_in_polygon(jnp.asarray(mean), jnp.asarray(padded)))

    got = jax.jit(lambda p, nn, d: _find_internal_point(p, nn, d, 12))(
        jnp.asarray(padded), jnp.int32(n), default)
    assert np.all(np.isfinite(np.asarray(got)))
    assert bool(point_in_polygon(got, jnp.asarray(padded)))


def test_internal_point_fallback_exhausted_degenerate():
    """All members coincident (zero-area polygon): every candidate fails;
    the fallback must return the default finitely, not NaN."""
    from instance_segmentation_tpu.ops.decode import _find_internal_point

    Q = 32
    padded = np.full((Q, 2), 7.0, np.float32)
    default = jnp.asarray([3.0, 4.0])
    got = jax.jit(lambda p, nn, d: _find_internal_point(p, nn, d, 12))(
        jnp.asarray(padded), jnp.int32(1), default)
    np.testing.assert_allclose(np.asarray(got), [3.0, 4.0])


def test_rasterize_polygon_matches_fillpoly():
    import cv2
    poly_rc = np.array([[3, 4], [3, 20], [15, 24], [18, 6]], np.float32)
    mask = np.asarray(jax.jit(lambda p: rasterize_polygon(p, 24, 32))(jnp.asarray(poly_rc)))
    ref = np.zeros((24, 32), np.uint8)
    cv2.fillPoly(ref, [poly_rc[:, ::-1].astype(np.int32)], 1)
    # allow a 1-px boundary band of disagreement (different edge conventions)
    diff = mask.astype(int) - ref.astype(int)
    interior = cv2.erode(ref, np.ones((3, 3), np.uint8))
    assert np.all(mask[interior.astype(bool)])
    assert np.abs(diff).sum() < 0.15 * ref.sum()


def _synthetic_scene(H=128, W=192, D=8, C=3):
    """Build model-like outputs containing two clean square instances."""
    rng = np.random.default_rng(0)
    kp = np.full((1, H, W, 1), -8.0, np.float32)
    ae = np.zeros((1, H, W, 4), np.float32)
    tan = np.zeros((1, H, W, 2), np.float32)

    squares = [((20, 30), (60, 70), 0), ((80, 100), (110, 150), 1)]
    from instance_segmentation_tpu.losses.losses import coordinate_grid
    xym = np.asarray(coordinate_grid(H, W))

    for (y1, x1, y2, x2, ) , cls in [(s[0] + s[1], s[2]) for s in squares]:
        for y in range(y1, y2 + 1):
            for x in (x1, x2):
                kp[0, y, x, 0] = 8.0
        for x in range(x1, x2 + 1):
            for y in (y1, y2):
                kp[0, y, x, 0] = 8.0
    # ae: tanh(0)=0 so embedding = own coordinate; sigma chosen large enough
    ae[..., 2:4] = 5.0  # sigma = exp(5) ~ 148: tight gaussian around own center
    return kp, ae, tan, squares


def test_decode_output_kmeans_mode():
    """The k-means grouping mode recovers the same two clean squares."""
    H, W = 128, 192
    kp, ae, tan, squares = _synthetic_scene(H, W)
    from instance_segmentation_tpu.models.anchors import generate_anchors
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    cls_prob = np.full((1, A, 3), 1e-3, np.float32)
    reg = np.zeros((1, A, 4), np.float32)
    for (y1, x1), (y2, x2), cls in squares:
        gt = np.array([x1, y1, x2, y2], np.float32)
        ax1, ay1, ax2, ay2 = anchors[:, 1], anchors[:, 0], anchors[:, 3], anchors[:, 2]
        iw = np.clip(np.minimum(ax2, gt[2]) - np.maximum(ax1, gt[0]), 0, None)
        ih = np.clip(np.minimum(ay2, gt[3]) - np.maximum(ay1, gt[1]), 0, None)
        inter = iw * ih
        union = (ax2 - ax1) * (ay2 - ay1) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter
        best = int(np.argmax(inter / np.clip(union, 1e-8, None)))
        cls_prob[0, best, cls] = 0.95
        aw, ah = ax2[best] - ax1[best], ay2[best] - ay1[best]
        acx, acy = (ax1[best] + ax2[best]) / 2, (ay1[best] + ay2[best]) / 2
        reg[0, best] = [((gt[1] + gt[3]) / 2 - acy) / ah, ((gt[0] + gt[2]) / 2 - acx) / aw,
                        np.log((gt[3] - gt[1]) / ah), np.log((gt[2] - gt[0]) / aw)]
    cfg = DecodeConfig(kp_th=2000, pre_nms=64, max_dets=8, max_poly=512,
                       group_mode="kmeans")
    outputs = tuple(map(jnp.asarray, (kp, ae, tan, reg, cls_prob)))
    dets = jax.jit(lambda o: decode_output(
        o, jnp.asarray(anchors), H * 2, W * 2, 2.0, cfg))(outputs)
    obj_valid = np.asarray(dets.obj_valid[0])
    assert obj_valid.sum() == 2
    assert set(np.asarray(dets.classes[0])[obj_valid].tolist()) == {0, 1}


def test_decode_output_end_to_end():
    """Full decode on a synthetic scene: detections with hand-made regression
    targets should recover two square boundary polygons on device."""
    H, W = 128, 192
    kp, ae, tan, squares = _synthetic_scene(H, W)

    from instance_segmentation_tpu.models.anchors import generate_anchors
    anchors = generate_anchors(H, W, pyramid_levels=(3, 4, 5))
    A = anchors.shape[0]
    C = 3
    cls_prob = np.full((1, A, C), 1e-3, np.float32)
    reg = np.zeros((1, A, 4), np.float32)

    # pick for each square the anchor with best IoU and give it a high score
    for (y1, x1), (y2, x2), cls in squares:
        gt = np.array([x1, y1, x2, y2], np.float32)
        ax1, ay1, ax2, ay2 = anchors[:, 1], anchors[:, 0], anchors[:, 3], anchors[:, 2]
        iw = np.clip(np.minimum(ax2, gt[2]) - np.maximum(ax1, gt[0]), 0, None)
        ih = np.clip(np.minimum(ay2, gt[3]) - np.maximum(ay1, gt[1]), 0, None)
        inter = iw * ih
        union = (ax2 - ax1) * (ay2 - ay1) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter
        best = int(np.argmax(inter / np.clip(union, 1e-8, None)))
        cls_prob[0, best, cls] = 0.95
        aw, ah = ax2[best] - ax1[best], ay2[best] - ay1[best]
        acx, acy = (ax1[best] + ax2[best]) / 2, (ay1[best] + ay2[best]) / 2
        gcx, gcy = (gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2
        reg[0, best] = [(gcy - acy) / ah, (gcx - acx) / aw,
                        np.log((gt[3] - gt[1]) / ah), np.log((gt[2] - gt[0]) / aw)]

    cfg = DecodeConfig(kp_th=2000, pre_nms=64, max_dets=8, max_poly=512)
    outputs = tuple(map(jnp.asarray, (kp, ae, tan, reg, cls_prob)))
    dets = jax.jit(lambda o: decode_output(
        o, jnp.asarray(anchors), H * 2, W * 2, 2.0, cfg))(outputs)

    det_valid = np.asarray(dets.det_valid[0])
    obj_valid = np.asarray(dets.obj_valid[0])
    assert det_valid.sum() == 2
    assert obj_valid.sum() == 2

    classes = np.asarray(dets.classes[0])[obj_valid]
    assert set(classes.tolist()) == {0, 1}

    # polygons should hug the (2x upscaled) square boundaries
    polys = np.asarray(dets.polygons[0])
    lens = np.asarray(dets.poly_len[0])
    for d in np.nonzero(obj_valid)[0]:
        cls = int(np.asarray(dets.classes[0])[d])
        (y1, x1), (y2, x2), _ = squares[cls]
        p = polys[d][:lens[d]]
        assert p[:, 0].min() >= 2 * x1 - 6 and p[:, 0].max() <= 2 * x2 + 6
        assert p[:, 1].min() >= 2 * y1 - 6 and p[:, 1].max() <= 2 * y2 + 6
        assert lens[d] > 50


def test_assemble_objects_nondefault_poly_budget():
    """Regression (round-3 review): with max_poly % 128 >= 2 the member
    window under-allocated one 128-block, pulling (0,0) padding into valid
    vertex slots for runs that start late in a block."""
    from instance_segmentation_tpu.ops.decode import DecodeConfig, assemble_objects

    H, W = 256, 256
    Q = 200
    K = 512
    # one object whose 300 member keypoints sit on a ring; the sorted run
    # must start at an arbitrary in-block offset, so precede it with a
    # second object owning 131 earlier-row keypoints
    kp_rc = np.zeros((1, K, 2), np.float32)
    assign = np.zeros((1, K), np.int32)
    valid = np.zeros((1, K), bool)
    for i in range(131):                       # object 1: rows 0..
        kp_rc[0, i] = (i // 16, 16 + i % 16)
        assign[0, i] = 1
        valid[0, i] = True
    ang = np.linspace(0, 2 * np.pi, 301)[:-1]
    ring = np.stack([120 + 60 * np.sin(ang), 120 + 60 * np.cos(ang)], -1)
    for i, rc in enumerate(ring):              # object 0: the ring
        kp_rc[0, 131 + i] = rc
        assign[0, 131 + i] = 0
        valid[0, 131 + i] = True
    boxes = np.array([[[40, 40, 200, 200], [0, 0, 64, 64]]], np.float32)
    det_valid = np.array([[True, True]])
    cfg = DecodeConfig(max_poly=Q)
    polys, poly_len, centers, obj_valid = jax.jit(
        lambda *a: assemble_objects(*a, 256, 256, 256, 256, 1.0, cfg))(
        jnp.asarray(kp_rc), jnp.asarray(valid), jnp.asarray(assign),
        jnp.asarray(boxes), jnp.asarray(det_valid))
    polys, poly_len = np.asarray(polys), np.asarray(poly_len)
    n0 = int(poly_len[0, 0])
    assert n0 == Q                       # 300 members truncated to the budget
    got = polys[0, 0, :n0]
    # every emitted vertex must be a real ring member, never (0, 0) padding
    d = np.abs(got[:, None, :] - ring[None, :, ::-1]).sum(-1).min(1)
    assert d.max() < 2.0, f"padding leaked into vertices: worst {d.max()}"
