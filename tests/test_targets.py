"""On-device target generation vs. the numpy oracle (SURVEY.md §4 strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_segmentation_tpu.data.packing import pack_batch
from instance_segmentation_tpu.ops.targets import generate_targets

from oracles import annotations_np

H, W = 64, 96


def make_label():
    """A rectangle, a triangle, and a concave L-shape, as (row, col) int32."""
    rect = np.array([[10, 10], [10, 40], [30, 40], [30, 10]], np.int32)
    tri = np.array([[40, 50], [58, 88], [40, 88]], np.int32)
    ell = np.array([[35, 5], [35, 30], [45, 30], [45, 20], [58, 20], [58, 5]], np.int32)
    return [2, 0, 5], [rect, tri, ell]


@pytest.fixture(scope="module")
def packed_and_targets():
    cls_ids, polys = make_label()
    packed = pack_batch([(cls_ids, polys)], max_instances=8, max_verts=16)
    tg = jax.jit(lambda p, n, c: generate_targets(p, n, c, H, W, max_points=256))(
        packed.polys, packed.n_verts, packed.cls_ids)
    return cls_ids, polys, packed, tg


def test_det_annotations(packed_and_targets):
    cls_ids, polys, packed, tg = packed_and_targets
    det_np, centers_np, _, _, _ = annotations_np(cls_ids, polys, H, W)
    m = len(cls_ids)
    np.testing.assert_allclose(np.asarray(tg.det_ann)[0, :m], det_np, atol=1e-5)
    assert np.all(np.asarray(tg.det_ann)[0, m:] == -1.0)
    np.testing.assert_allclose(np.asarray(tg.centers)[0, :m], centers_np, atol=1e-5)
    assert np.asarray(tg.inst_valid)[0].sum() == m


def test_dense_points_match_oracle(packed_and_targets):
    cls_ids, polys, packed, tg = packed_and_targets
    _, _, dense_np, normals_np, _ = annotations_np(cls_ids, polys, H, W)
    pts = np.asarray(tg.points)[0]
    val = np.asarray(tg.pt_valid)[0]
    nrm = np.asarray(tg.normals)[0]
    for i in range(len(cls_ids)):
        got = pts[i][val[i]]
        want = dense_np[i]
        assert got.shape == want.shape, f"instance {i}: {got.shape} vs {want.shape}"
        np.testing.assert_array_equal(got, want)
        np.testing.assert_allclose(nrm[i][val[i]], normals_np[i], atol=1e-5)


def test_kp_mask_matches_oracle(packed_and_targets):
    cls_ids, polys, packed, tg = packed_and_targets
    _, _, _, _, kp_np = annotations_np(cls_ids, polys, H, W)
    np.testing.assert_array_equal(np.asarray(tg.kp_tgt)[0], kp_np)


def test_normals_point_inward(packed_and_targets):
    """Inward normals: stepping along the normal from a boundary point should
    move toward the polygon interior for a convex rectangle."""
    cls_ids, polys, packed, tg = packed_and_targets
    pts = np.asarray(tg.points)[0][0]
    val = np.asarray(tg.pt_valid)[0][0]
    nrm = np.asarray(tg.normals)[0][0]
    rect = polys[0]
    cy, cx = rect[:, 0].mean(), rect[:, 1].mean()
    inner = pts[val] + nrm[val] * 3.0
    d_before = np.hypot(pts[val][:, 0] - cy, pts[val][:, 1] - cx)
    d_after = np.hypot(inner[:, 0] - cy, inner[:, 1] - cx)
    assert np.all(d_after < d_before)
