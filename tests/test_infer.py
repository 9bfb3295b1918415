"""Post-processor tests: peak recovery, score threshold, KITTI formatting.

Builds synthetic head outputs with known objects painted in, then checks the
decoded detections."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.engine.infer import format_kitti_lines, postprocess
from dcd_tpu.models.predictor import Converter_key2channel
from dcd_tpu.data.synthetic import KITTI_P2


@pytest.fixture(scope="module")
def cfg():
    base = dgde_run_config()
    return dataclasses.replace(
        base, input=dataclasses.replace(base.input, height_train=96, width_train=160)
    )


def _paint_predictions(cfg, objects):
    """Create head-output arrays with given objects painted at their centers.

    objects: list of dicts with keys cx, cy (feature-map ints), score,
    depth_offset-ish values. Everything else is neutral.
    """
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    Ho, Wo = cfg.input.height_train // 4, cfg.input.width_train // 4
    R = sum(c for g in head.regression_channels for c in g)
    cls_map = np.full((1, Ho, Wo, 1), 1e-4, np.float32)
    reg_map = np.zeros((1, Ho, Wo, R), np.float32)
    for ob in objects:
        cx, cy = ob["cx"], ob["cy"]
        cls_map[0, cy, cx, 0] = ob["score"]
        reg_map[0, cy, cx, k2c("2d_dim")] = [4.0, 3.0, 4.0, 3.0]
        reg_map[0, cy, cx, k2c("depth")] = ob.get("depth_logit", 0.0)
        reg_map[0, cy, cx, k2c("depth_uncertainty")] = ob.get("unc", -2.0)
        reg_map[0, cy, cx, k2c("corner_uncertainty")] = ob.get("unc", -2.0)
        # plausible keypoints: vertical extent ~ f*h/(d*4)
        sep = 721.5 * 1.5 / (ob.get("depth", 20.0) * 4)
        kpts = np.zeros((10, 2), np.float32)
        kpts[[0, 1, 2, 3], 1] = sep / 2
        kpts[[4, 5, 6, 7], 1] = -sep / 2
        kpts[8, 1] = sep / 2
        kpts[9, 1] = -sep / 2
        reg_map[0, cy, cx, k2c("corner_offset")] = kpts.reshape(-1)
        # orientation: bin 0 active
        ori_cls = np.zeros(8, np.float32)
        ori_cls[1] = 5.0
        ori_cls[0] = -5.0
        reg_map[0, cy, cx, k2c("ori_cls")] = ori_cls
        offs = np.zeros(8, np.float32)
        offs[0] = 0.0
        offs[1] = 1.0
        reg_map[0, cy, cx, k2c("ori_offset")] = offs
    return {"cls": jnp.asarray(cls_map), "reg": jnp.asarray(reg_map)}


@pytest.fixture(scope="module")
def decoded(cfg):
    objects = [
        dict(cx=10, cy=12, score=0.9, depth=20.0),
        dict(cx=30, cy=8, score=0.5, depth=35.0),
        dict(cx=20, cy=20, score=0.05, depth=10.0),  # below threshold
    ]
    preds = _paint_predictions(cfg, objects)
    out = postprocess(
        cfg,
        preds,
        jnp.asarray(KITTI_P2[None], jnp.float32),
        jnp.asarray([[16.0, 8.0]], jnp.float32),
        jnp.asarray([[128.0, 80.0]], jnp.float32),
    )
    return objects, out


def test_valid_count_respects_threshold(decoded):
    objects, out = decoded
    assert int(np.asarray(out["valid"]).sum()) == 2  # 0.05 < 0.2 threshold


def test_top_detection_matches_painted_peak(decoded):
    objects, out = decoded
    dets = np.asarray(out["dets"])[0]
    valid = np.asarray(out["valid"])[0]
    rows = dets[valid]
    # scores are rescored by uncertainty confidence but order is preserved
    assert rows[0, 13] > rows[1, 13]
    # cls is Car (0)
    assert rows[0, 0] == 0
    # location depth positive and within range
    assert 0 < rows[0, 11] < 100


def test_dims_are_hwl(decoded):
    """Painted dims offsets are 0 -> decoded dims == class mean (l,h,w),
    output must be rolled to (h,w,l)."""
    objects, out = decoded
    dets = np.asarray(out["dets"])[0]
    valid = np.asarray(out["valid"])[0]
    row = dets[valid][0]
    h, w, l = row[6], row[7], row[8]
    assert abs(h - 1.5261) < 0.01 and abs(w - 1.6286) < 0.01 and abs(l - 3.884) < 0.01


def test_box2d_within_image(decoded):
    objects, out = decoded
    dets = np.asarray(out["dets"])[0]
    valid = np.asarray(out["valid"])[0]
    boxes = dets[valid][:, 2:6]
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 127).all()
    assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= 79).all()


def test_kitti_lines(decoded):
    objects, out = decoded
    lines = format_kitti_lines(np.asarray(out["dets"])[0], np.asarray(out["valid"])[0])
    assert len(lines) == 2
    for line in lines:
        parts = line.split(" ")
        assert parts[0] == "Car"
        assert len(parts) == 16  # cls, trunc, occ, alpha, 4 box, 3 dim, 3 loc, roty, score
