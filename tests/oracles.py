"""Literal numpy oracles of the reference algorithms.

Hand-written re-implementations (from the reference's documented semantics,
SURVEY.md §2 rows 22-24) of the per-instance python/numpy math that the
reference runs on host. Used only in tests, as ground truth for the
vectorized on-device versions. Coordinates follow the framework convention:
polygons are int (row, col) arrays.
"""

from __future__ import annotations

import math

import numpy as np

INF = 65535


# -- target generation (ref utils/target_generator.py) -----------------------

def point_in_poly_np(poly: np.ndarray, pt) -> bool:
    """Even-odd crossing test, strict inside."""
    y, x = float(pt[0]), float(pt[1])
    inside = False
    n = len(poly)
    for i in range(n):
        ay, ax = poly[i]
        by, bx = poly[(i + 1) % n]
        if (ay > y) != (by > y):
            t = (y - ay) / (by - ay)
            xi = ax + t * (bx - ax)
            if x < xi:
                inside = not inside
    return inside


def dense_sample_polygon_np(polygons, h, w):
    """Walk polygon edges in 2px max-norm steps; emit int points + inward normals."""
    out_pts, out_nrm = [], []
    for polygon in polygons:
        pts, nrms = [], []
        n = polygon.shape[0]
        for i in range(n):
            j = (i + 1) % n
            d = polygon[j].astype(np.float64) - polygon[i]
            md = max(abs(d[0]), abs(d[1]))
            if md == 0:
                continue
            nrm = np.array([-d[1], d[0]], dtype=np.float64)
            nrm = nrm / max(np.sqrt((nrm * nrm).sum()), 1e-4)
            test = (polygon[j] + polygon[i]) / 2.0 + nrm / abs(nrm.max())
            if not point_in_poly_np(polygon, test):
                nrm = -nrm
            inc = d / md
            for k in range(0, int(md), 2):
                p = polygon[i] + inc * k
                if 1 < p[0] < h - 2 and 1 < p[1] < w - 2:
                    pts.append(p)
                    nrms.append(nrm)
        out_pts.append(np.array(pts, dtype=np.float64).astype(np.int32).reshape(-1, 2))
        out_nrm.append(np.array(nrms, dtype=np.float32).reshape(-1, 2))
    return out_pts, out_nrm


def annotations_np(cls_ids, polygons, h, w):
    """det boxes (x1,y1,x2,y2,cls), centers (row,col), kp binary mask."""
    boxes = []
    centers = []
    for poly in polygons:
        mn, mx = poly.min(0), poly.max(0)   # (row,col)
        boxes.append([mn[1], mn[0], mx[1], mx[0]])
        centers.append([(mn[0] + mx[0]) / 2.0, (mn[1] + mx[1]) / 2.0])
    det = np.array([b + [c] for b, c in zip(boxes, cls_ids)], np.float32).reshape(-1, 5)

    dense, normals = dense_sample_polygon_np(polygons, h, w)
    kp = np.zeros((h, w), np.float32)
    for pts in dense:
        kp[pts[:, 0], pts[:, 1]] = 1.0
    return det, np.array(centers, np.float32).reshape(-1, 2), dense, normals, kp


def gaussian_stamp_np(canvas: np.ndarray, center, radius=3):
    """CenterNet max-splat of a (2r+1)^2 gaussian, sigma = diameter/6."""
    d = 2 * radius + 1
    sigma = d / 6.0
    ys, xs = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    g = np.exp(-(xs * xs + ys * ys) / (2 * sigma * sigma))
    r, c = int(center[0]), int(center[1])
    h, w = canvas.shape
    top, bottom = min(r, radius), min(h - r, radius + 1)
    left, right = min(c, radius), min(w - c, radius + 1)
    if top + bottom <= 0 or left + right <= 0:
        return canvas
    sub = canvas[r - top:r + bottom, c - left:c + right]
    gsub = g[radius - top:radius + bottom, radius - left:radius + right]
    np.maximum(sub, gsub, out=sub)
    return canvas


def kp_gaussian_mask_np(kps, h, w, radius=3):
    m = np.zeros((h, w), np.float32)
    for kp in kps:
        gaussian_stamp_np(m, kp, radius)
    return m


# -- losses (ref models/loss.py) ----------------------------------------------

def focal_np(pred, gt, window=None):
    pred = np.clip(pred, 1e-4, 1 - 1e-4)
    pos = (gt == 1.0).astype(np.float64)
    neg = (gt < 1.0).astype(np.float64)
    if window is not None:
        pos, neg = pos * window, neg * window
    pos_l = (np.log(pred) * (1 - pred) ** 2 * pos).sum()
    neg_l = (np.log(1 - pred) * pred ** 2 * (1 - gt) ** 4 * neg).sum()
    npos = pos.sum()
    return -neg_l if npos == 0 else -(pos_l + neg_l) / npos


def iou_np(anchors, gt):
    """anchors [A,4] (y1,x1,y2,x2), gt [M,4] (x1,y1,x2,y2)."""
    iw = np.minimum(anchors[:, 3:4], gt[None, :, 2]) - np.maximum(anchors[:, 1:2], gt[None, :, 0])
    ih = np.minimum(anchors[:, 2:3], gt[None, :, 3]) - np.maximum(anchors[:, 0:1], gt[None, :, 1])
    iw, ih = np.clip(iw, 0, None), np.clip(ih, 0, None)
    area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = np.clip(area_a[:, None] + area_g[None, :] - iw * ih, 1e-8, None)
    return iw * ih / union


def det_focal_np(cls_prob, reg, anchors, ann_list, alpha=0.25, gamma=2.0):
    """cls_prob [B,A,C], reg [B,A,4], anchors [A,4], ann_list: per-image [m,5]."""
    B = cls_prob.shape[0]
    aw = anchors[:, 3] - anchors[:, 1]
    ah = anchors[:, 2] - anchors[:, 0]
    acx = anchors[:, 1] + 0.5 * aw
    acy = anchors[:, 0] + 0.5 * ah
    cls_out, reg_out = [], []
    for b in range(B):
        ann = ann_list[b]
        ann = ann[ann[:, 4] != -1]
        p = np.clip(cls_prob[b], 1e-4, 1 - 1e-4)
        if ann.shape[0] == 0:
            cls_out.append(((1 - alpha) * p ** gamma * -np.log(1 - p)).sum())
            reg_out.append(0.0)
            continue
        iou = iou_np(anchors, ann[:, :4])
        mx, arg = iou.max(1), iou.argmax(1)
        assigned = ann[arg]
        targets = -np.ones_like(p)
        targets[mx < 0.4] = 0
        pos = mx >= 0.5
        npos = pos.sum()
        targets[pos] = 0
        targets[pos, assigned[pos, 4].astype(int)] = 1
        af = np.where(targets == 1, alpha, 1 - alpha)
        fw = np.where(targets == 1, 1 - p, p)
        bce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        cl = np.where(targets != -1, af * fw ** gamma * bce, 0).sum() / max(npos, 1)
        cls_out.append(cl)
        if npos > 0:
            a = assigned[pos]
            gw = np.clip(a[:, 2] - a[:, 0], 1, None)
            gh = np.clip(a[:, 3] - a[:, 1], 1, None)
            gcx = a[:, 0] + 0.5 * (a[:, 2] - a[:, 0])
            gcy = a[:, 1] + 0.5 * (a[:, 3] - a[:, 1])
            t = np.stack([(gcy - acy[pos]) / ah[pos], (gcx - acx[pos]) / aw[pos],
                          np.log(gh / ah[pos]), np.log(gw / aw[pos])], 1)
            diff = np.abs(t - reg[b][pos])
            sm = np.where(diff <= 1 / 9, 0.5 * 9 * diff ** 2, diff - 0.5 / 9)
            reg_out.append(sm.mean())
        else:
            reg_out.append(0.0)
    return np.mean(cls_out), np.mean(reg_out) * 50


def coordinate_grid_np(h, w):
    ys = np.linspace(0, 1, 1024)[:h]
    xs = np.linspace(0, 2, 2048)[:w]
    return np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).astype(np.float32)


def ae_loss_np(ae, centers_list, dense_list, h, w):
    """ae [B,H,W,4]; per-image lists of centers (row,col float) and dense kp arrays."""
    B = ae.shape[0]
    xym = coordinate_grid_np(h, w)
    total = 0.0
    for b in range(B):
        centers = centers_list[b]
        dense = dense_list[b]
        n = len(centers)
        if n == 0:
            continue
        emb = np.tanh(ae[b, ..., 0:2]) + xym
        sig = np.exp(ae[b, ..., 2:4])
        cint = np.array(centers).astype(np.int32)
        cemb = xym[cint[:, 0], cint[:, 1]]          # [n,2]
        var_l, inst_l = 0.0, 0.0
        for i in range(n):
            kps = dense[i]
            ms = ((kps.max(0) - kps.min(0)) * 2).astype(np.int32)
            lt = np.clip(cint[i] - ms // 2, 0, 2048)
            rb = cint[i] + ms // 2
            rb = np.array([min(rb[0], h), min(rb[1], w)])
            window = np.zeros((h, w))
            window[lt[0]:rb[0], lt[1]:rb[1]] = 1
            pred = np.exp(-((emb - cemb[i]) ** 2 * sig).sum(-1))
            tgt = kp_gaussian_mask_np(kps, h, w)
            inst_l += focal_np(pred, tgt, window)
            ek = emb[kps[:, 0], kps[:, 1]]
            sk = sig[kps[:, 0], kps[:, 1]]
            d = np.exp(-(((ek[:, None, :] - cemb[None, :, :]) ** 2) * sk[:, None, :]).sum(-1))
            var_l += np.abs(d[:, i] - d.max(1)).sum()
        total += (var_l + inst_l) / max(n, 1)
    return total / B


def tangent_loss_np(tan, dense_list, normal_list):
    B = tan.shape[0]
    out = []
    for b in range(B):
        dense, normals = dense_list[b], normal_list[b]
        if len(dense) == 0 or sum(len(d) for d in dense) == 0:
            out.append(0.0)
            continue
        pts = np.vstack([d for d in dense if len(d)])
        nrm = np.vstack([n for n in normals if len(n)])
        t = tan[b][pts[:, 0], pts[:, 1]]
        t = t / np.clip(np.sqrt((t * t).sum(-1, keepdims=True)), 1e-4, None)
        out.append((1 - (nrm * t).sum(-1)).mean())
    return np.mean(out)
