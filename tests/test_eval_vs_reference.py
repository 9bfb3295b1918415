"""Bit-check the AP evaluator against the REFERENCE's own eval.py
(VERDICT r2 item #6, SURVEY §4(e)).

The reference's evaluator (GMW/evaluation/kitti_object_eval_python/eval.py)
is numba-jitted; numba is not in this image, but every @numba.jit here is
semantically a plain Python function — so we stub numba.jit to identity,
import the reference module from /root/reference, and compare full
precision/recall/AOS arrays on random canned scenes with DontCare / Van /
truncation / occlusion edge cases, for metric 0 (bbox), where the overlap
kernel (image_box_overlap) is pure numba.jit — no numba.cuda needed.

Skipped when /root/reference is not present (e.g. a user checkout).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

from dcd_tpu.evaluation import kitti_eval

REF_EVAL_DIR = "/root/reference/GMW/evaluation/kitti_object_eval_python"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EVAL_DIR), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_eval():
    """Import the reference eval.py with numba stubbed to identity."""

    def _identity_jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    if "numba" not in sys.modules or not hasattr(sys.modules["numba"], "__dcd_stub__"):
        numba = types.ModuleType("numba")
        numba.__dcd_stub__ = True
        numba.jit = _identity_jit
        numba.njit = _identity_jit
        numba.float32 = np.float32
        cuda = types.ModuleType("numba.cuda")
        cuda.jit = _identity_jit
        cuda.is_available = lambda: False
        numba.cuda = cuda
        sys.modules["numba"] = numba
        sys.modules["numba.cuda"] = cuda

    pkg = types.ModuleType("ref_kitti_eval_pkg")
    pkg.__path__ = [REF_EVAL_DIR]
    sys.modules["ref_kitti_eval_pkg"] = pkg
    return importlib.import_module("ref_kitti_eval_pkg.eval")


def _rand_scene(rng: np.random.RandomState):
    """One random image's (gt_anno, dt_anno) with protocol edge cases:
    DontCare regions, non-evaluated classes (Van ignored for Car), the
    40/25-px height thresholds, truncation/occlusion difficulty rules,
    and detections that straddle real/ignored/spurious."""
    names = ["Car", "Car", "Car", "Van", "Pedestrian", "Truck", "DontCare"]
    n_gt = rng.randint(0, 13)
    gname, gbox, gtrunc, gocc, galpha = [], [], [], [], []
    for _ in range(n_gt):
        cls = names[rng.randint(len(names))]
        x0 = rng.uniform(0, 1100)
        y0 = rng.uniform(0, 300)
        # heights straddling the MIN_HEIGHT 40/25 thresholds
        h = rng.choice([rng.uniform(20, 30), rng.uniform(38, 42), rng.uniform(45, 120)])
        w = h * rng.uniform(0.8, 2.5)
        gname.append(cls)
        gbox.append([x0, y0, x0 + w, y0 + h])
        gtrunc.append(rng.choice([0.0, 0.1, 0.14, 0.16, 0.31, 0.6]))
        gocc.append(rng.randint(0, 4))
        galpha.append(rng.uniform(-np.pi, np.pi))
    gt = {
        "name": np.array(gname, dtype="<U12"),
        "bbox": np.array(gbox, np.float64).reshape(-1, 4),
        "truncated": np.array(gtrunc, np.float64),
        "occluded": np.array(gocc, np.int64),
        "alpha": np.array(galpha, np.float64),
    }

    dname, dbox, dalpha, dscore = [], [], [], []
    # detections: perturbed copies of gt boxes (some class-mismatched) ...
    for i in range(n_gt):
        if rng.rand() < 0.7:
            b = np.array(gbox[i]) + rng.uniform(-8, 8, 4)
            dname.append("Car" if rng.rand() < 0.85 else gname[i])
            dbox.append(b)
            dalpha.append(galpha[i] + rng.uniform(-0.3, 0.3))
            dscore.append(rng.rand())
    # ... plus pure false positives
    for _ in range(rng.randint(0, 5)):
        x0, y0 = rng.uniform(0, 1100), rng.uniform(0, 300)
        h = rng.uniform(22, 90)
        dname.append("Car")
        dbox.append([x0, y0, x0 + h * rng.uniform(1, 2.5), y0 + h])
        dalpha.append(rng.uniform(-np.pi, np.pi))
        dscore.append(rng.rand())
    dt = {
        "name": np.array(dname, dtype="<U12"),
        "bbox": np.array(dbox, np.float64).reshape(-1, 4),
        "alpha": np.array(dalpha, np.float64),
        "score": np.array(dscore, np.float64),
        "truncated": np.zeros(len(dname)),
        "occluded": np.zeros(len(dname), np.int64),
    }
    _add_3d_fields(gt, dt, rng)
    return gt, dt


def _add_3d_fields(gt, dt, rng):
    """Camera-frame 3D fields for the BEV/3D metrics, with protocol edge
    cases: near-duplicates, exactly touching boxes, degenerate zero-size
    dims, and bit-identical location pairs."""

    def boxes3d(n):
        loc = np.stack(
            [rng.uniform(-20, 20, n), np.full(n, 1.65), rng.uniform(5, 60, n)], 1
        )
        dims = np.stack(
            [rng.uniform(3.0, 4.5, n), rng.uniform(1.3, 1.8, n), rng.uniform(1.5, 1.9, n)], 1
        )
        rot = rng.uniform(-np.pi, np.pi, n)
        return loc, dims, rot

    g_loc, g_dims, g_rot = boxes3d(len(gt["name"]))
    gt["location"], gt["dimensions"], gt["rotation_y"] = g_loc, g_dims, g_rot

    n_dt = len(dt["name"])
    d_loc, d_dims, d_rot = boxes3d(n_dt)
    for i in range(min(n_dt, len(gt["name"]))):
        r = rng.rand()
        if r < 0.5:  # near-duplicate of a gt (TP candidate)
            d_loc[i] = g_loc[i] + rng.uniform(-0.3, 0.3, 3)
            d_dims[i] = g_dims[i] * rng.uniform(0.95, 1.05, 3)
            d_rot[i] = g_rot[i] + rng.uniform(-0.05, 0.05)
        elif r < 0.6:  # bit-identical location/dims/rot (degenerate strict-test path)
            d_loc[i], d_dims[i], d_rot[i] = g_loc[i], g_dims[i], g_rot[i]
        elif r < 0.7:  # exactly touching along x (axis-aligned share an edge)
            d_rot[i] = g_rot[i] = 0.0
            d_loc[i] = g_loc[i] + np.array([g_dims[i][0], 0.0, 0.0])
            d_dims[i] = g_dims[i]
        elif r < 0.75:  # degenerate zero-size detection
            d_dims[i] = 0.0
    dt["location"], dt["dimensions"], dt["rotation_y"] = d_loc, d_dims, d_rot


@pytest.fixture(scope="module")
def scenes():
    rng = np.random.RandomState(1234)
    pairs = [_rand_scene(rng) for _ in range(50)]
    gt_annos = [p[0] for p in pairs]
    dt_annos = [p[1] for p in pairs]
    return gt_annos, dt_annos


# min_overlaps in the reference layout (num_minoverlap, metric, class):
# Car bbox thresholds 0.7 (strict) and 0.5 (loose), eval.py:647-653
MIN_OVERLAPS = np.array([0.7, 0.5]).reshape(2, 1, 1).repeat(3, axis=1)


def test_eval_class_bbox_bitwise(ref_eval, scenes):
    """precision/recall arrays for metric 0 (bbox AP) must match the
    reference eval_class (eval.py:446-") to float tolerance across all
    difficulties and both min_overlaps, including AOS."""
    gt_annos, dt_annos = scenes
    ours = kitti_eval.eval_class(
        gt_annos, dt_annos, [0], [0, 1, 2], 0, MIN_OVERLAPS, compute_aos=True
    )
    theirs = ref_eval.eval_class(
        gt_annos, dt_annos, [0], [0, 1, 2], 0, MIN_OVERLAPS, compute_aos=True
    )
    for key in ("precision", "recall", "orientation"):
        np.testing.assert_allclose(
            ours[key], theirs[key], rtol=0, atol=1e-12, err_msg=key
        )
    # the comparison must not be vacuous
    assert ours["precision"].sum() > 0
    assert 0 < ours["precision"].max() <= 1.0


def test_eval_class_bbox_pedestrian_cyclist(ref_eval, scenes):
    """Same bit-check for the other evaluated classes (different
    MIN_HEIGHT/ignore semantics paths)."""
    gt_annos, dt_annos = scenes
    mo = np.array([0.5, 0.25]).reshape(2, 1, 1).repeat(3, axis=1).repeat(2, axis=2)
    ours = kitti_eval.eval_class(gt_annos, dt_annos, [1, 2], [0, 1, 2], 0, mo)
    theirs = ref_eval.eval_class(gt_annos, dt_annos, [1, 2], [0, 1, 2], 0, mo)
    np.testing.assert_allclose(ours["precision"], theirs["precision"], rtol=0, atol=1e-12)


@pytest.fixture(scope="module")
def ref_eval_cuda_stubbed(ref_eval):
    """Reference eval with its numba.cuda rotated-IoU launcher replaced by
    the plain-Python transcription of the same kernel
    (ref_rotate_iou_oracle.py) — the VERDICT r3 #3 protocol: un-CUDA the
    device functions mechanically, then bit-check eval_class end-to-end."""
    sys.path.insert(0, os.path.dirname(__file__))
    import ref_rotate_iou_oracle as oracle

    orig = ref_eval.rotate_iou_gpu_eval
    ref_eval.rotate_iou_gpu_eval = oracle.rotate_iou_gpu_eval
    yield ref_eval
    ref_eval.rotate_iou_gpu_eval = orig


def test_rotate_iou_bitwise_vs_transcribed_kernel():
    """dcd_tpu's vectorized rotate_iou must be bit-identical to the
    transcribed CUDA kernel on rotated / touching / degenerate / identical
    boxes, for every criterion the protocol uses (-1 for BEV, 2 for 3D)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_rotate_iou_oracle import rotate_iou_gpu_eval as oracle
    from dcd_tpu.evaluation.rotate_iou import rotate_iou_eval

    rng = np.random.RandomState(0)

    def rand_boxes(n):
        return np.stack(
            [rng.uniform(-40, 40, n), rng.uniform(0, 70, n),
             rng.uniform(0.1, 5, n), rng.uniform(0.1, 10, n),
             rng.uniform(-np.pi, np.pi, n)], 1)

    for trial in range(10):
        b = rand_boxes(12)
        q = rand_boxes(9)
        q[:6] = b[:6] + rng.uniform(-1, 1, (6, 5))  # overlapping cluster
        b[0] = [0, 0, 2, 4, 0.3]; q[0] = b[0]            # identical rotated
        b[1] = [0, 0, 2, 4, 0.0]; q[1] = [2, 0, 2, 4, 0.0]  # touching edge
        b[2] = [0, 0, 0.0, 4, 0.5]; q[2] = [0, 0, 2, 0.0, 0.5]  # zero-size
        b[3] = [0, 0, 10, 10, 0.0]; q[3] = [1, 1, 2, 2, 0.7]  # containment
        for crit in (-1, 0, 1, 2):
            want = oracle(b, q, crit)
            got = rotate_iou_eval(b, q, crit).astype(np.float64)
            same = (got == want) | (np.isnan(got) & np.isnan(want))
            assert same.all(), (trial, crit, np.argwhere(~same))


@pytest.mark.parametrize("metric", [1, 2])
def test_eval_class_bev_3d_bitwise(ref_eval_cuda_stubbed, scenes, metric):
    """precision/recall for metric 1 (BEV AP) and metric 2 (3D AP) must
    bit-match the reference eval_class with its rotated-IoU kernel
    transcribed to plain Python (rotate_iou.py:18-332 -> oracle)."""
    gt_annos, dt_annos = scenes
    ours = kitti_eval.eval_class(
        gt_annos, dt_annos, [0], [0, 1, 2], metric, MIN_OVERLAPS
    )
    theirs = ref_eval_cuda_stubbed.eval_class(
        gt_annos, dt_annos, [0], [0, 1, 2], metric, MIN_OVERLAPS
    )
    for key in ("precision", "recall"):
        np.testing.assert_array_equal(ours[key], theirs[key], err_msg=key)
    assert ours["precision"].sum() > 0  # not vacuous
    assert 0 < ours["precision"].max() <= 1.0


def test_official_eval_result_string_matches(ref_eval_cuda_stubbed, scenes):
    """The full get_official_eval_result — all four metric families across
    both overlap rows — must produce the identical result string and
    ret_dict (reference eval.py:644-...)."""
    gt_annos, dt_annos = scenes
    ours_str, ours_dict = kitti_eval.get_official_eval_result(
        gt_annos, dt_annos, ["Car"], metric="R40"
    )
    theirs_str, theirs_dict = ref_eval_cuda_stubbed.get_official_eval_result(
        gt_annos, dt_annos, ["Car"], metric="R40"
    )
    assert ours_str == theirs_str
    # ours carries the reference keys (bit-equal) plus legacy-style extras
    missing = set(theirs_dict) - set(ours_dict)
    assert not missing, missing
    for k in theirs_dict:
        np.testing.assert_array_equal(ours_dict[k], theirs_dict[k], err_msg=k)


def test_map_summaries_match(ref_eval, scenes):
    """R11 and R40 AP summaries computed from matching precision arrays
    must agree (get_mAP eval.py:554-566, get_mAP_R40 :561)."""
    gt_annos, dt_annos = scenes
    ours = kitti_eval.eval_class(gt_annos, dt_annos, [0], [0, 1, 2], 0, MIN_OVERLAPS)
    np.testing.assert_allclose(
        kitti_eval.get_mAP(ours["precision"]),
        ref_eval.get_mAP(ours["precision"]), rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        kitti_eval.get_mAP_R40(ours["precision"]),
        ref_eval.get_mAP_R40(ours["precision"]), rtol=0, atol=1e-12,
    )
