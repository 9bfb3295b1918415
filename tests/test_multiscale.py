"""Multi-scale bucketing tests."""

import dataclasses

import numpy as np

from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.multiscale import ScaleBucket, bucket_schedule, encode_at_bucket, make_buckets


def test_bucket_schedule_deterministic():
    a = bucket_schedule(3, seed=63, length=100)
    b = bucket_schedule(3, seed=63, length=100)
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)) <= {0, 1, 2}


def test_make_buckets_from_cfg():
    cfg = dgde_run_config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(cfg.input, multi_train_size=((1120, 640), (1376, 768))),
    )
    buckets = make_buckets(cfg)
    assert buckets == [ScaleBucket(1120, 640), ScaleBucket(1376, 768)]


def test_encode_at_bucket_shapes_and_consistency():
    cfg = dgde_run_config()
    img, objs, calib = synthetic.make_scene(seed=3, num_objs=6)
    for bucket in (ScaleBucket(640, 192), ScaleBucket(960, 288)):
        s = encode_at_bucket(img, objs, calib, cfg, bucket, img_id="000003")
        assert s.image.shape == (bucket.height, bucket.width, 3)
        t = s.targets
        mask = t["reg_mask"].astype(bool)
        assert mask.sum() > 0
        # reprojection consistency still holds at the bucket scale
        for i in np.where(mask)[0]:
            P = t["Calib_P"][i]
            hom = np.concatenate([t["locations"][i], [1.0]])
            uvw = P @ hom
            uv = uvw[:2] / uvw[2]
            fm = (uv + t["pad_size"]) / 4.0
            want = t["target_centers"][i] + t["offset_3D"][i]
            np.testing.assert_allclose(fm, want, atol=1e-2)
