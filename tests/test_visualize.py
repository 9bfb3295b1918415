"""Visualization smoke tests (PIL rendering)."""

import numpy as np

from dcd_tpu.data.kitti_geometry import Calibration
from dcd_tpu.data.synthetic import KITTI_P2, make_scene
from dcd_tpu.utils.visualize import draw_bev, draw_detections, draw_heatmap


def _fake_dets(n=3):
    rng = np.random.RandomState(0)
    dets = np.zeros((n, 14))
    for i in range(n):
        dets[i, 0] = 0  # Car
        dets[i, 2:6] = [50 + 100 * i, 100, 150 + 100 * i, 200]
        dets[i, 6:9] = [1.5, 1.6, 3.9]  # h, w, l
        dets[i, 9:12] = [i - 1.0, 1.6, 15.0 + 5 * i]
        dets[i, 12] = 0.3 * i
        dets[i, 13] = 0.9 - 0.1 * i
    return dets


def test_draw_detections():
    img, objs, calib = make_scene(seed=0)
    dets = _fake_dets()
    out = draw_detections(img, dets, np.array([True, True, False]), calib)
    assert out.size == (img.shape[1], img.shape[0])
    arr = np.asarray(out)
    assert arr.shape[2] == 3


def test_draw_bev():
    dets = _fake_dets()
    out = draw_bev(dets, np.array([True] * 3), gt_dets=dets)
    assert out.size[0] > 0


def test_draw_heatmap():
    img, _, _ = make_scene(seed=1)
    hm = np.random.RandomState(0).rand(96, 320).astype(np.float32)
    out = draw_heatmap(img, hm)
    assert out.size == (img.shape[1], img.shape[0])


def test_render_scene_panel():
    """Full debug panel (reference show_image_with_boxes,
    visualize_infer.py:190-321): pred + GT wireframes, BEV strip on the
    right, optional heatmap strip on top."""
    from dcd_tpu.utils.visualize import gt_rows_from_objects, render_scene

    img, objs, calib = make_scene(seed=2, num_objs=4)
    dets = _fake_dets()
    gt_rows = gt_rows_from_objects(objs)
    assert gt_rows.shape[1] == 14 and len(gt_rows) > 0
    panel = render_scene(img, dets, np.array([True, True, True]), calib, gt_rows=gt_rows)
    assert panel.ndim == 3 and panel.shape[2] == 3
    assert panel.shape[1] > img.shape[1]  # BEV appended on the right
    hm = np.random.RandomState(0).rand(img.shape[0] // 4, img.shape[1] // 4)
    panel2 = render_scene(
        img, dets, np.array([True] * 3), calib, gt_rows=gt_rows, heatmap=hm
    )
    assert panel2.shape[0] > panel.shape[0]  # heatmap strip stacked on top


def test_save_scene_visualization(tmp_path):
    from dcd_tpu.utils.visualize import save_scene_visualization

    img, objs, calib = make_scene(seed=3)
    dets = _fake_dets()
    p = str(tmp_path / "000001.png")
    save_scene_visualization(p, img, dets, np.array([True] * 3), calib)
    from PIL import Image

    assert Image.open(p).size[0] > 0
