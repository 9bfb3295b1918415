"""KITTI evaluator tests: rotated IoU vs an independent Sutherland-Hodgman
oracle + analytic cases, and AP protocol sanity (perfect/missing/degraded
detections)."""

import os
import sys

import numpy as np
import pytest

from dcd_tpu.evaluation.rotate_iou import rotate_iou_eval, rbbox_to_corners
from dcd_tpu.evaluation import kitti_eval


# ---------------------------------------------------------------------------
# independent oracle: Sutherland–Hodgman polygon clipping
# ---------------------------------------------------------------------------

def _sh_clip(subject, clip):
    """Clip polygon `subject` by convex polygon `clip` (both lists of (x,y))."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) <= 0

    def intersect(p1, p2, a, b):
        dc = (a[0] - b[0], a[1] - b[1])
        dp = (p1[0] - p2[0], p1[1] - p2[1])
        n1 = a[0] * b[1] - a[1] * b[0]
        n2 = p1[0] * p2[1] - p1[1] * p2[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
        return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)

    output = list(subject)
    a = clip[-1]
    for b in clip:
        input_list = output
        output = []
        if not input_list:
            break
        s = input_list[-1]
        for e in input_list:
            if inside(e, a, b):
                if not inside(s, a, b):
                    output.append(intersect(s, e, a, b))
                output.append(e)
            elif inside(s, a, b):
                output.append(intersect(s, e, a, b))
            s = e
        a = b
    return output


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    area = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def _oracle_iou(b1, b2):
    c1 = [tuple(p) for p in rbbox_to_corners(np.asarray(b1, np.float64))]
    c2 = [tuple(p) for p in rbbox_to_corners(np.asarray(b2, np.float64))]
    # ensure clip polygon is counter-clockwise for the inside() convention
    def ccw(poly):
        s = sum((poly[(i + 1) % 4][0] - poly[i][0]) * (poly[(i + 1) % 4][1] + poly[i][1]) for i in range(4))
        return list(reversed(poly)) if s < 0 else poly

    inter = _poly_area(_sh_clip(ccw(c1), ccw(c2)))
    a1 = b1[2] * b1[3]
    a2 = b2[2] * b2[3]
    return inter / (a1 + a2 - inter)


class TestRotateIoU:
    def test_identical_boxes(self):
        # axis-aligned: corners are exact in fp32, full overlap
        b = np.array([[1.0, 2.0, 3.0, 4.0, 0.0]])
        iou = rotate_iou_eval(b, b)
        np.testing.assert_allclose(iou, 1.0, atol=1e-6)
        # rotated identical boxes: fp32 roundoff makes the strict
        # point-in-quad test drop the far corner — the reference CUDA
        # kernel does the same; assert bit-parity with its transcription
        # rather than the geometric 1.0 (see rotate_iou.py docstring)
        sys.path.insert(0, os.path.dirname(__file__))
        from ref_rotate_iou_oracle import rotate_iou_gpu_eval as ref

        br = np.array([[1.0, 2.0, 3.0, 4.0, 0.7]])
        got = rotate_iou_eval(br, br)
        want = ref(br, br)
        np.testing.assert_array_equal(got.astype(np.float64), want)

    def test_axis_aligned_known(self):
        b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b2 = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])  # half overlap
        iou = rotate_iou_eval(b1, b2)
        np.testing.assert_allclose(iou[0, 0], (2.0) / (4 + 4 - 2), atol=1e-4)

    def test_disjoint(self):
        b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
        b2 = np.array([[10.0, 10.0, 1.0, 1.0, -0.2]])
        np.testing.assert_allclose(rotate_iou_eval(b1, b2), 0.0, atol=1e-6)

    def test_45_degrees_inscribed(self):
        # square rotated 45deg inside a box of same center: intersection is
        # the rotated square if it fits
        big = np.array([[0.0, 0.0, 4.0, 4.0, 0.0]])
        small = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        iou = rotate_iou_eval(big, small)
        np.testing.assert_allclose(iou[0, 0], 4.0 / (16 + 4 - 4), atol=1e-4)

    def test_random_vs_oracle(self):
        rng = np.random.RandomState(3)
        boxes = np.stack(
            [
                rng.uniform(-3, 3, 40),
                rng.uniform(-3, 3, 40),
                rng.uniform(0.5, 4, 40),
                rng.uniform(0.5, 4, 40),
                rng.uniform(-np.pi, np.pi, 40),
            ],
            axis=1,
        )
        got = rotate_iou_eval(boxes[:20], boxes[20:])
        for i in range(20):
            for j in range(20):
                want = _oracle_iou(boxes[i], boxes[20 + j])
                assert abs(got[i, j] - want) < 2e-3, (i, j, got[i, j], want)


def _make_annos(n_objs, cls="Car", score=None, jitter=0.0, rng=None):
    """Synthetic GT/DT anno in the eval dict format.

    NOTE: the official protocol only fills its 41 recall slots when there
    are >= 41 valid GT objects overall — AP(perfect detector) == 100 only
    then; tests size their scenes accordingly.
    """
    rng = rng or np.random.RandomState(0)
    boxes = []
    locs = []
    dims = []
    rots = []
    for i in range(n_objs):
        x0, y0 = rng.uniform(0, 1000), rng.uniform(0, 200)
        boxes.append([x0, y0, x0 + 80, y0 + 60])
        locs.append([rng.uniform(-10, 10), 1.6, rng.uniform(10, 50)])
        dims.append([4.0, 1.5, 1.7])  # l, h, w
        rots.append(rng.uniform(-np.pi, np.pi))
    boxes = np.array(boxes, np.float64).reshape(n_objs, 4)
    locs = np.array(locs).reshape(n_objs, 3)
    dims = np.array(dims).reshape(n_objs, 3)
    rots = np.array(rots)
    if jitter:
        locs = locs + rng.uniform(-jitter, jitter, locs.shape)
    anno = {
        "name": np.array([cls] * n_objs),
        "truncated": np.zeros(n_objs),
        "occluded": np.zeros(n_objs, np.int64),
        "alpha": rots.copy(),
        "bbox": boxes,
        "dimensions": dims,
        "location": locs,
        "rotation_y": rots,
        "score": rng.uniform(0.3, 1.0, n_objs) if score is None else np.asarray(score),
    }
    return anno


def _near_perfect_dt(gt, seed=7):
    """Detections equal to GT up to a 1e-4 location jitter (IoU ~0.9998).

    Bit-identical rotated boxes hit the reference kernel's strict-test
    corner-drop quirk (exactly collinear edges yield no intersections and
    roundoff drops corners — see rotate_iou.py docstring); real detections
    are never bit-identical, so 'perfect detector' tests jitter."""
    rng = np.random.RandomState(seed)
    dt = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in gt.items()}
    dt["location"] = dt["location"] + rng.uniform(-1e-4, 1e-4, dt["location"].shape)
    return dt


class TestAPProtocol:
    def test_perfect_detections_ap100(self):
        gt_annos = [_make_annos(12, rng=np.random.RandomState(i)) for i in range(5)]
        dt_annos = [_near_perfect_dt(a) for a in gt_annos]
        result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"], metric="R40")
        assert abs(ret["Car_3d_moderate_R40_0.70"] - 100.0) < 1e-6, result

    def test_no_detections_ap0(self):
        gt_annos = [_make_annos(12, rng=np.random.RandomState(i)) for i in range(5)]
        empty = {
            "name": np.array([]), "truncated": np.array([]), "occluded": np.array([], np.int64),
            "alpha": np.array([]), "bbox": np.zeros((0, 4)), "dimensions": np.zeros((0, 3)),
            "location": np.zeros((0, 3)), "rotation_y": np.array([]), "score": np.array([]),
        }
        dt_annos = [empty] * 5
        result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"], metric="R40")
        assert ret["Car_3d_moderate_R40_0.70"] == 0.0

    def test_degraded_locations_lower_ap(self):
        gt_annos = [_make_annos(12, rng=np.random.RandomState(i)) for i in range(5)]
        dt_good = [dict(a) for a in gt_annos]
        dt_bad = []
        for i, a in enumerate(gt_annos):
            b = dict(a)
            b = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in a.items()}
            b["location"] = b["location"] + np.array([1.5, 0, 1.5])
            dt_bad.append(b)
        _, ret_good = kitti_eval.get_official_eval_result(gt_annos, dt_good, ["Car"], metric="R40")
        _, ret_bad = kitti_eval.get_official_eval_result(gt_annos, dt_bad, ["Car"], metric="R40")
        assert ret_bad["Car_3d_moderate_R40_0.70"] < ret_good["Car_3d_moderate_R40_0.70"]
        # 2D bbox AP unaffected by 3D location error
        assert abs(ret_bad["Car_bev_moderate_R40_0.70"] - 100.0) > 1e-9  # bev drops

    def test_score_ranking_affects_pr(self):
        """Half the detections are false positives with higher scores ->
        precision at high recall must drop."""
        rng = np.random.RandomState(5)
        gt = _make_annos(50, rng=rng)
        fp = _make_annos(50, rng=np.random.RandomState(99))
        gtj = _near_perfect_dt(gt)
        dt = {
            k: np.concatenate([gtj[k], fp[k]], axis=0) for k in gt
        }
        dt["score"] = np.concatenate([np.full(50, 0.5), np.full(50, 0.9)])
        _, ret = kitti_eval.get_official_eval_result([gt], [dt], ["Car"], metric="R40")
        ap = ret["Car_3d_moderate_R40_0.70"]
        assert 0 < ap < 100


class TestDifficultyRules:
    def test_small_boxes_ignored_for_easy(self):
        """GT below 40px height is ignored at easy difficulty (not counted
        as FN)."""
        gt = _make_annos(50)
        gt["bbox"][-1] = [0, 0, 50, 30]  # 30px high -> ignored for easy+mod
        dt = _near_perfect_dt(gt)
        dt = {k: (v[:-1].copy() if isinstance(v, np.ndarray) else v) for k, v in dt.items()}
        _, ret = kitti_eval.get_official_eval_result([gt], [dt], ["Car"], metric="R40")
        # detections match all 49 valid gts; the small gt is ignored, not FN
        assert abs(ret["Car_3d_easy_R40_0.70"] - 100.0) < 1e-6

    def test_van_is_ignored_not_fp(self):
        """A Van GT matched by a Car detection doesn't count as TP or FP."""
        gt = _make_annos(50)
        gt["name"] = np.array(["Car"] * 49 + ["Van"])
        dt = _near_perfect_dt(gt)
        dt["name"] = np.array(["Car"] * 50)
        _, ret = kitti_eval.get_official_eval_result([gt], [dt], ["Car"], metric="R40")
        assert abs(ret["Car_3d_moderate_R40_0.70"] - 100.0) < 1e-6


class TestNativeFusedMatcher:
    """The C++ fused matcher (native/eval_native.cc) must agree with the
    Python protocol loops exactly (the native path mirrors the reference's
    fused_compute_statistics, eval.py:276-335)."""

    def _run_both(self, gt_annos, dt_annos):
        from dcd_tpu import native

        if not native.available():
            import pytest

            pytest.skip("no native toolchain")
        r_nat, ret_nat = kitti_eval.get_official_eval_result(
            gt_annos, dt_annos, ["Car"], metric="R40"
        )
        orig = native.get_lib
        try:
            native.get_lib = lambda: None  # force the Python fallback
            r_py, ret_py = kitti_eval.get_official_eval_result(
                gt_annos, dt_annos, ["Car"], metric="R40"
            )
        finally:
            native.get_lib = orig
        return ret_nat, ret_py

    def test_native_matches_python_messy_scene(self):
        rng = np.random.RandomState(7)
        gt_annos, dt_annos = [], []
        for i in range(6):
            r = np.random.RandomState(100 + i)
            gt = _make_annos(12, jitter=0.0, rng=r)
            # mix in ignored classes, DontCare regions, occlusion levels
            gt["name"][3] = "Van"
            gt["name"][4] = "DontCare"
            gt["occluded"][5] = 2
            gt["truncated"][6] = 0.4
            gt["bbox"][7] = [0, 0, 60, 30]  # small -> height-ignored
            dt = _make_annos(14, jitter=0.6, rng=np.random.RandomState(200 + i))
            # overlap some dts with the gts so matches happen
            dt["bbox"][:10] = gt["bbox"][:10] + rng.uniform(-6, 6, (10, 4))
            dt["location"][:10] = gt["location"][:10] + rng.uniform(-0.4, 0.4, (10, 3))
            dt["rotation_y"][:10] = gt["rotation_y"][:10] + rng.uniform(-0.2, 0.2, 10)
            dt["dimensions"][:10] = gt["dimensions"][:10]
            gt_annos.append(gt)
            dt_annos.append(dt)
        ret_nat, ret_py = self._run_both(gt_annos, dt_annos)
        assert ret_nat.keys() == ret_py.keys()
        for k in ret_nat:
            np.testing.assert_allclose(ret_nat[k], ret_py[k], atol=1e-9, err_msg=k)

    def test_native_matches_python_edge_cases(self):
        # empty detections / empty gts / all-ignored
        gt_a = _make_annos(45, rng=np.random.RandomState(1))
        dt_empty = {
            k: (v[:0].copy() if isinstance(v, np.ndarray) else v)
            for k, v in gt_a.items()
        }
        gt_empty = dict(dt_empty)
        dt_b = _make_annos(5, rng=np.random.RandomState(2))
        ret_nat, ret_py = self._run_both([gt_a, gt_empty], [dt_empty, dt_b])
        for k in ret_nat:
            np.testing.assert_allclose(ret_nat[k], ret_py[k], atol=1e-9, err_msg=k)
