"""Target-encoder tests on synthetic scenes."""

import numpy as np
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.target_encoder import collate, encode_targets, get_edge_indices


@pytest.fixture(scope="module")
def cfg():
    return dgde_run_config()


@pytest.fixture(scope="module")
def sample(cfg):
    img, objs, calib = synthetic.make_scene(seed=3, num_objs=8)
    return encode_targets(img, objs, calib, cfg, img_id="000003")


def test_shapes(cfg, sample):
    t = sample.targets
    M = cfg.datasets.max_objects
    n = cfg.model.head.extra_kpts_num + 10
    assert t["hm"].shape == (1, cfg.output_height, cfg.output_width)
    assert t["keypoints"].shape == (M, 10, 3)
    assert t["extra_kpts_2d"].shape == (M, n, 3)
    assert t["extra_kpts_3d"].shape == (M, n, 3)
    assert t["Calib_P"].shape == (M, 3, 4)
    assert t["orientations"].shape == (M, 8)
    assert t["edge_indices"].shape == (cfg.max_edge_length, 2)
    assert sample.image.shape == (cfg.input.height_train, cfg.input.width_train, 3)


def test_heatmap_peaks_at_centers(sample):
    t = sample.targets
    mask = t["reg_mask"].astype(bool)
    assert mask.sum() > 0
    centers = t["target_centers"][mask]
    for cx, cy in centers:
        assert t["hm"][0, cy, cx] == 1.0


def test_depth_consistency(sample):
    """locations z must equal the object depth; offsets must place the
    projected center correctly."""
    t = sample.targets
    mask = t["reg_mask"].astype(bool)
    locs = t["locations"][mask]
    assert (locs[:, 2] > 0).all()
    # reproject via the stored per-object calib
    for i in np.where(mask)[0]:
        P = t["Calib_P"][i]
        loc = t["locations"][i]
        hom = np.concatenate([loc, [1.0]])
        uvw = P @ hom
        uv = uvw[:2] / uvw[2]
        fm = (uv + t["pad_size"]) / 4.0
        want = t["target_centers"][i] + t["offset_3D"][i]
        np.testing.assert_allclose(fm, want, atol=1e-3)


def test_edge_ring_within_bounds(cfg, sample):
    t = sample.targets
    n = int(t["edge_len"])
    ring = t["edge_indices"][: n + 1]
    assert (ring[:, 0] >= 0).all() and (ring[:, 0] < cfg.output_width).all()
    assert (ring[:, 1] >= 0).all() and (ring[:, 1] < cfg.output_height).all()


def test_edge_ring_is_closed_loop():
    pad = np.array([32, 20])
    ring = get_edge_indices((640, 300), pad, 4)
    # consecutive points differ by at most 1 step in each axis
    diffs = np.abs(np.diff(ring, axis=0))
    assert diffs.max() <= 1


def test_collate(cfg):
    samples = []
    for s in range(2):
        img, objs, calib = synthetic.make_scene(seed=s)
        samples.append(encode_targets(img, objs, calib, cfg, img_id=f"{s:06d}"))
    batch = collate(samples)
    assert batch["images"].shape[0] == 2
    assert batch["hm"].shape[0] == 2


def test_extra_kpts_projection_consistency(cfg, sample):
    """extra_kpts_2d (local fm coords) + target_center, upscaled, must equal
    the camera projection of the rotated extra_kpts_3d at the object pose."""
    t = sample.targets
    idxs = np.where((t["reg_mask"] > 0) & (t["find_pcl"] > 0))[0]
    assert len(idxs) > 0
    i = idxs[0]
    P = t["Calib_P"][i]
    ry = t["rotys"][i]
    loc = t["locations"][i]  # mid-height center
    n_extra = cfg.model.head.extra_kpts_num
    k3 = t["extra_kpts_3d"][i, :n_extra]  # object-local, mid-height origin
    c, s = np.cos(ry), np.sin(ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    # dataset stores kpts relative to mid-height: camera pos = R@k + bottom_t
    # bottom center t = loc + [0, h/2, 0]
    h = t["dimensions"][i, 1]
    t_bottom = loc + np.array([0, h / 2, 0])
    cam = (R @ k3.T).T + t_bottom
    hom = np.concatenate([cam, np.ones((n_extra, 1))], axis=1)
    uvw = hom @ P.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    fm = (uv + t["pad_size"]) / 4.0
    want_local = fm - t["target_centers"][i]
    np.testing.assert_allclose(t["extra_kpts_2d"][i, :n_extra, :2], want_local, atol=1e-2)
