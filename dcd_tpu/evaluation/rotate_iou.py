"""Rotated-rectangle IoU, fully vectorized NumPy.

Replaces the reference's numba.cuda kernels
(``GMW/evaluation/kitti_object_eval_python/rotate_iou.py:18-332``) with a
batched implementation of the same algorithm: corner-in-quad tests +
pairwise segment intersections collected into a candidate set, pseudo-angle
sort around the centroid, fan-triangle (shoelace) area. Same box
convention: ``[cx, cy, w, l, angle]`` with clockwise-positive angle and the
clockwise corner layout of ``rbbox_to_corners`` (:206-231).

No CUDA/numba dependency; the whole (N, K) pair grid is evaluated with
array ops, which is fast enough for the KITTI protocol (~50 dets/image)
and runs anywhere.
"""

from __future__ import annotations

import numpy as np


def rbbox_to_corners(rbboxes: np.ndarray) -> np.ndarray:
    """(..., 5) [cx, cy, w, l, angle] -> (..., 4, 2) clockwise corners."""
    angle = rbboxes[..., 4]
    a_cos = np.cos(angle)
    a_sin = np.sin(angle)
    cx = rbboxes[..., 0]
    cy = rbboxes[..., 1]
    xd = rbboxes[..., 2]
    yd = rbboxes[..., 3]
    # corner offsets in box frame (clockwise; reference :215-227)
    ox = np.stack([-xd / 2, -xd / 2, xd / 2, xd / 2], axis=-1)
    oy = np.stack([-yd / 2, yd / 2, yd / 2, -yd / 2], axis=-1)
    # clockwise rotation: [cos, sin; -sin, cos]
    px = a_cos[..., None] * ox + a_sin[..., None] * oy + cx[..., None]
    py = -a_sin[..., None] * ox + a_cos[..., None] * oy + cy[..., None]
    return np.stack([px, py], axis=-1)


def _triangle_area(a, b, c):
    return (
        (a[..., 0] - c[..., 0]) * (b[..., 1] - c[..., 1])
        - (a[..., 1] - c[..., 1]) * (b[..., 0] - c[..., 0])
    ) / 2.0


def _points_in_quad(pts: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """pts (..., P, 2) inside quad (..., 4, 2) -> (..., P) bool.

    Projection test along the quad's two edge directions
    (reference point_in_quadrilateral :162-179).
    """
    A = corners[..., 0, :][..., None, :]
    ab = corners[..., 1, :][..., None, :] - A
    ad = corners[..., 3, :][..., None, :] - A
    ap = pts - A
    abab = (ab * ab).sum(-1)
    abap = (ab * ap).sum(-1)
    adad = (ad * ad).sum(-1)
    adap = (ad * ap).sum(-1)
    # relative epsilon: fp32 roundoff must not drop corners that lie exactly
    # on the boundary (e.g. identical boxes)
    eps = 1e-5 * (abab + adad)
    return (abab + eps >= abap) & (abap >= -eps) & (adad + eps >= adap) & (adap >= -eps)


def _segment_intersections(c1: np.ndarray, c2: np.ndarray):
    """All 16 edge-pair intersections between quads c1, c2 (..., 4, 2).

    Returns (points (..., 16, 2), valid (..., 16)). Mirrors
    line_segment_intersection (:124-159): strict sign tests, so touching
    endpoints don't count (same numerics as the reference).
    """
    a = c1[..., :, None, :]  # (..., 4, 1, 2) edge starts of quad 1
    b = np.roll(c1, -1, axis=-2)[..., :, None, :]
    c = c2[..., None, :, :]
    d = np.roll(c2, -1, axis=-2)[..., None, :, :]

    area_abc = _triangle_area(a, b, c)
    area_abd = _triangle_area(a, b, d)
    area_cda = _triangle_area(c, d, a)
    area_cdb = area_cda + area_abc - area_abd

    valid = (area_abc * area_abd < 0) & (area_cda * area_cdb < 0)
    denom = area_abd - area_abc
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(denom != 0, area_cda / np.where(denom == 0, 1.0, denom), 0.0)
    pts = a + t[..., None] * (b - a)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _polygon_area_sorted(pts: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Area of the convex polygon formed by the valid candidate points.

    pts: (..., M, 2); valid: (..., M). Pseudo-angle sort around the valid
    centroid (reference sort_vertex_in_convex_polygon :35-...), then a fan
    of |triangle| areas from the first sorted vertex (reference area :25-32).
    """
    n = valid.sum(-1)  # (...,)
    cnt = np.maximum(n, 1)[..., None]
    center = (pts * valid[..., None]).sum(-2) / cnt  # (..., 2)
    v = pts - center[..., None, :]
    d = np.sqrt((v**2).sum(-1))
    with np.errstate(divide="ignore", invalid="ignore"):
        vx = np.where(d > 0, v[..., 0] / np.where(d == 0, 1.0, d), 0.0)
    key = np.where(v[..., 1] < 0, -2.0 - vx, vx)
    key = np.where(valid, key, np.inf)  # invalid points sort last
    order = np.argsort(key, axis=-1, kind="stable")
    spts = np.take_along_axis(pts, order[..., None], axis=-2)

    # fan triangles: p0, p_{i+1}, p_{i+2} for i in [0, n-2)
    M = pts.shape[-2]
    p0 = spts[..., 0:1, :]
    p1 = spts[..., 1 : M - 1, :]
    p2 = spts[..., 2:M, :]
    tri = np.abs(_triangle_area(np.broadcast_to(p0, p1.shape), p1, p2))
    idx = np.arange(M - 2)
    tri_valid = idx < np.maximum(n[..., None] - 2, 0)
    return (tri * tri_valid).sum(-1)


def rotate_iou_eval(boxes: np.ndarray, query_boxes: np.ndarray, criterion: int = -1) -> np.ndarray:
    """(N, 5) x (K, 5) -> (N, K) rotated IoU / normalized intersection.

    criterion: -1 IoU, 0 inter/area1, 1 inter/area2, else raw intersection —
    same switch as devRotateIoUEval (:251-263). float32 internally like the
    CUDA kernel.
    """
    boxes = boxes.astype(np.float32)
    query_boxes = query_boxes.astype(np.float32)
    N, K = boxes.shape[0], query_boxes.shape[0]
    if N == 0 or K == 0:
        return np.zeros((N, K), dtype=np.float32)

    b1 = boxes[:, None, :]  # (N, 1, 5)
    b2 = query_boxes[None, :, :]  # (1, K, 5)
    c1 = rbbox_to_corners(np.broadcast_to(b1, (N, K, 5)))  # (N, K, 4, 2)
    c2 = rbbox_to_corners(np.broadcast_to(b2, (N, K, 5)))

    in2 = _points_in_quad(c1, c2)  # corners of 1 inside 2: (N, K, 4)
    in1 = _points_in_quad(c2, c1)
    seg_pts, seg_valid = _segment_intersections(c1, c2)  # (N, K, 16, 2)

    cand_pts = np.concatenate([c1, c2, seg_pts], axis=-2)  # (N, K, 24, 2)
    cand_valid = np.concatenate([in2, in1, seg_valid], axis=-1)

    inter_area = _polygon_area_sorted(cand_pts, cand_valid)

    area1 = boxes[:, 2] * boxes[:, 3]
    area2 = query_boxes[:, 2] * query_boxes[:, 3]
    if criterion == -1:
        denom = area1[:, None] + area2[None, :] - inter_area
    elif criterion == 0:
        denom = np.broadcast_to(area1[:, None], inter_area.shape)
    elif criterion == 1:
        denom = np.broadcast_to(area2[None, :], inter_area.shape)
    else:
        return inter_area.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(denom > 0, inter_area / np.where(denom == 0, 1.0, denom), 0.0)
    return out.astype(np.float32)
