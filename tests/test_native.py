"""Native C++ host kernels vs NumPy reference implementations."""

import numpy as np
import pytest

from dcd_tpu import native
from dcd_tpu.data import heatmap as hm


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_splat_batch_matches_numpy():
    rng = np.random.RandomState(0)
    H, W = 96, 320
    n = 12
    cls_ids = rng.randint(0, 3, n)
    centers = np.stack([rng.randint(0, W, n), rng.randint(0, H, n)], axis=1)
    radii_x = rng.randint(0, 12, n)
    radii_y = rng.randint(0, 12, n)
    kinds = rng.randint(0, 2, n)

    want = np.zeros((3, H, W), np.float32)
    for i in range(n):
        if kinds[i] == 0:
            hm.draw_umich_gaussian(want[cls_ids[i]], centers[i], int(radii_x[i]))
        else:
            hm.draw_umich_gaussian_2d(want[cls_ids[i]], centers[i], int(radii_x[i]), int(radii_y[i]))

    got = native.splat_batch(
        np.zeros((3, H, W), np.float32), cls_ids, centers, radii_x, radii_y, kinds
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_splat_border_clipping():
    """Objects at the border must splat identically to numpy."""
    for cx, cy in [(0, 0), (319, 95), (0, 95), (5, 0)]:
        want = np.zeros((1, 96, 320), np.float32)
        hm.draw_umich_gaussian(want[0], (cx, cy), 8)
        got = native.splat_batch(
            np.zeros((1, 96, 320), np.float32),
            np.array([0]), np.array([[cx, cy]]), np.array([8]), np.array([8]), np.array([0]),
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_pad_normalize_matches_numpy():
    import dataclasses

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data.target_encoder import normalize_image, pad_image

    cfg = dgde_run_config()
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (375, 1242, 3), np.uint8)
    padded, _ = pad_image(img, cfg.input.height_train, cfg.input.width_train)
    want = normalize_image(padded, cfg)
    got = native.pad_normalize_image(
        img, cfg.input.height_train, cfg.input.width_train,
        np.asarray(cfg.input.pixel_mean), np.asarray(cfg.input.pixel_std),
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_draw_gaussian_1d():
    """Reference heatmap_coder.py:68-81: peak 1 at the center, symmetric,
    max-merge with existing values, border-clipped."""
    from dcd_tpu.data.heatmap import draw_gaussian_1d

    edge = np.zeros(11, np.float32)
    draw_gaussian_1d(edge, 5, 3)
    assert edge[5] == 1.0
    np.testing.assert_allclose(edge[5 - 3 : 5], edge[5 + 3 : 5 : -1], rtol=1e-6)
    assert edge[0] == 0.0
    # max-merge keeps the larger of two splats
    prev = edge.copy()
    draw_gaussian_1d(edge, 5, 1)
    np.testing.assert_array_equal(edge, prev)
    # center at the border clips without wrapping
    e2 = np.zeros(6, np.float32)
    draw_gaussian_1d(e2, 0, 3)
    assert e2[0] == 1.0 and e2.argmax() == 0


def test_draw_ellip_gaussian_one_sided_radii():
    """Reference heatmap_coder.py:139-159: radii come from the smaller
    one-sided box extent; equals draw_umich_gaussian_2d with those radii."""
    from dcd_tpu.data.heatmap import draw_ellip_gaussian, draw_umich_gaussian_2d

    hm = np.zeros((20, 30), np.float32)
    center = (12.0, 10.0)  # (x, y)
    box2d = (4.0, 6.0, 28.0, 12.0)  # width one-side min = 8, height = 2
    draw_ellip_gaussian(hm, center, box2d, ratio=0.5)
    want = np.zeros((20, 30), np.float32)
    draw_umich_gaussian_2d(want, center, int(8 * 0.5), int(2 * 0.5))
    np.testing.assert_array_equal(hm, want)
    assert hm[10, 12] == 1.0
