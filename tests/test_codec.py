"""Golden tests for the geometry codec against naive reference formulations."""

import numpy as np
import jax.numpy as jnp
import pytest

from dcd_tpu.ops import codec
from dcd_tpu.data import kitti_geometry as geo

RNG = np.random.RandomState(0)

KITTI_P2 = np.array(
    [
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ]
)


def _naive_pairs_depth(kps, kps_3d, rot_y, K):
    """Direct port of the reference math (anno_encoder.py:326-390) with
    explicit (n, n) matrices and a python get_up loop — the oracle."""
    b, n = kps.shape[0], kps.shape[1]
    fx, cx, fy, cy = K[:, 0, 0], K[:, 0, 2], K[:, 1, 1], K[:, 1, 2]
    b3 = K[:, 2, 3]
    y_n = (kps[:, :, 1] - cy[:, None]) / fy[:, None]
    X, Y, Z = kps_3d[:, :, 0], kps_3d[:, :, 1], kps_3d[:, :, 2]
    cos, sin = np.cos(rot_y)[:, None], np.sin(rot_y)[:, None]
    C = X * sin - Z * cos
    H = Y + y_n * C
    n_pairs = n * (n - 1) // 2
    out = np.zeros((b, n_pairs))
    dv_out = np.zeros((b, n_pairs))
    count = 0
    for i in range(n):
        for j in range(i + 1, n):
            dH = H[:, i] - H[:, j]
            dV = y_n[:, i] - y_n[:, j]
            out[:, count] = np.abs(dH) / np.maximum(np.abs(dV), 1e-10)
            dv_out[:, count] = dV
            count += 1
    out = np.clip(out, 2.0, 80.0) - b3[:, None]
    return out, dv_out


class TestPairsDepth:
    def test_matches_naive(self):
        b, n = 3, 12
        kps = RNG.uniform(0, 1200, size=(b, n, 2))
        kps_3d = RNG.uniform(-2, 2, size=(b, n, 3))
        rot = RNG.uniform(-np.pi, np.pi, size=(b,))
        K = np.tile(KITTI_P2[None], (b, 1, 1))
        want, _ = _naive_pairs_depth(kps, kps_3d, rot, K)
        got, _ = codec.decode_pairs_kpts_depth(
            jnp.asarray(kps, jnp.float32),
            jnp.asarray(kps_3d, jnp.float32),
            jnp.asarray(rot, jnp.float32),
            jnp.asarray(K, jnp.float32),
            training=False,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_exact_depth_recovery(self):
        """Keypoints projected from a known location must solve back to its
        depth (the closed form is exact for consistent inputs)."""
        n = 20
        depth = 25.0
        loc = np.array([1.5, 0.8, depth])
        ry = 0.4
        kpts_local = RNG.uniform(-1.5, 1.5, size=(n, 3))
        calib = geo.Calibration(KITTI_P2)
        R = geo.roty_matrix(ry)
        kpts_cam = (R @ kpts_local.T).T + loc
        kpts_2d, _ = calib.project_rect_to_image(kpts_cam)
        got, _ = codec.decode_pairs_kpts_depth(
            jnp.asarray(kpts_2d[None], jnp.float32),
            jnp.asarray(kpts_local[None], jnp.float32),
            jnp.asarray([ry], jnp.float32),
            jnp.asarray(KITTI_P2[None], jnp.float32),
            training=False,
        )
        got = np.asarray(got)[0]
        # most pairs must recover depth ~= loc_z (some pairs are degenerate)
        med = np.median(got)
        assert abs(med - depth) < 0.5, med

    def test_training_topk_and_mask(self):
        b, n = 2, 10
        kps = RNG.uniform(0, 1200, size=(b, n, 2)).astype(np.float32)
        kps_3d = RNG.uniform(-2, 2, size=(b, n, 3)).astype(np.float32)
        rot = RNG.uniform(-np.pi, np.pi, size=(b,)).astype(np.float32)
        K = np.tile(KITTI_P2[None], (b, 1, 1)).astype(np.float32)
        mask = (RNG.rand(b, n) > 0.3).astype(np.float32)
        topk = 17
        got, got_mask = codec.decode_pairs_kpts_depth(
            jnp.asarray(kps), jnp.asarray(kps_3d), jnp.asarray(rot), jnp.asarray(K),
            training=True, kpts_2d_mask=jnp.asarray(mask), pairs_topk=topk,
        )
        assert got.shape == (b, topk)
        assert got_mask.shape == (b, topk)
        # top-k selection picks the largest |dV| pairs
        want_full, dv = _naive_pairs_depth(kps, kps_3d, rot, K)
        for bi in range(b):
            order = np.argsort(-np.abs(dv[bi]))[:topk]
            np.testing.assert_allclose(
                np.sort(np.asarray(got)[bi]), np.sort(want_full[bi][order]), rtol=1e-4, atol=1e-4
            )


class TestBox3d:
    def test_corners_match_object3d(self):
        obj = geo.Object3d(
            type="Car", truncation=0, occlusion=0, alpha_label=0.0,
            box2d=np.zeros(4), h=1.5, w=1.6, l=3.9,
            t=np.array([1.0, 1.2, 20.0]), ry=0.7,
            extra_kpts_3D=np.zeros((5, 3)), find_pcl=0,
        )
        want = obj.generate_corners3d()
        # encode_box3d takes the 3D *center* (bottom center shifted up h/2)
        locs = obj.t.copy()
        locs[1] -= obj.h / 2
        got = codec.encode_box3d(
            jnp.asarray([obj.ry], jnp.float32),
            jnp.asarray([[obj.l, obj.h, obj.w]], jnp.float32),
            jnp.asarray(locs[None], jnp.float32),
        )
        got = np.asarray(got)[0]
        # corner sets must match up to ordering; also check exact order:
        # encode_box3d's gather ordering reproduces generate_corners3d's
        # (x: +,+,-,-,+,+,-,- ; y: 0000,-h... shifted to be center-relative)
        want_sorted = want[np.lexsort(want.T)]
        got_sorted = got[np.lexsort(got.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, rtol=1e-4, atol=1e-4)

    def test_exact_corner_order(self):
        """encode_box3d corner k must equal R @ object-corner k + loc with
        the reference's index table."""
        ry, l, h, w = 0.3, 4.0, 1.5, 1.8
        loc = np.array([0.5, 1.0, 15.0])
        got = np.asarray(
            codec.encode_box3d(
                jnp.asarray([ry], jnp.float32),
                jnp.asarray([[l, h, w]], jnp.float32),
                jnp.asarray(loc[None], jnp.float32),
            )
        )[0]
        # reference gather: x half-dims [l/2]*4 + [-l/2]*4 indexed by
        # [4,5,0,1,6,7,2,3] etc. Build object-frame corners accordingly.
        half = np.array([l, h, w]) / 2
        signs = np.ones((3, 8))
        signs[:, 4:] = -1
        vals = signs * half[:, None]
        idx = np.array([[4, 5, 0, 1, 6, 7, 2, 3], [0, 1, 2, 3, 4, 5, 6, 7], [4, 0, 1, 5, 6, 2, 3, 7]])
        obj_corners = np.take_along_axis(vals, idx, axis=1)  # (3, 8)
        want = (geo.roty_matrix(ry) @ obj_corners).T + loc
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestLocationRoundTrip:
    def test_project_unproject(self):
        # exact with P[2,3] = 0; with the real KITTI term (~0.0027 m) the
        # pair is only approximately inverse (same as the reference, which
        # ignores P[2,3] in project_image_to_rect, kitti_utils.py:399-418)
        P = KITTI_P2.copy()
        P[2, 3] = 0.0
        calib = geo.Calibration(P)
        pts = RNG.uniform(-5, 5, size=(50, 3))
        pts[:, 2] = RNG.uniform(5, 60, size=50)
        uv, depth = calib.project_rect_to_image(pts)
        back = calib.project_image_to_rect(np.concatenate([uv, depth[:, None]], axis=1))
        np.testing.assert_allclose(back, pts, rtol=1e-9, atol=1e-9)

        calib_real = geo.Calibration(KITTI_P2)
        uv, depth = calib_real.project_rect_to_image(pts)
        back = calib_real.project_image_to_rect(np.concatenate([uv, depth[:, None]], axis=1))
        np.testing.assert_allclose(back, pts, rtol=0, atol=0.02)

    def test_decode_location_matches_host(self):
        calib = geo.Calibration(KITTI_P2)
        K = 8
        points = RNG.uniform(0, 300, size=(K, 2)).astype(np.float32)
        offsets = RNG.uniform(-1, 1, size=(K, 2)).astype(np.float32)
        depths = RNG.uniform(5, 60, size=(K,)).astype(np.float32)
        pad = np.tile(np.array([[32.0, 20.0]], np.float32), (K, 1))
        uv = (points + offsets) * 4 - pad
        want = calib.project_image_to_rect(np.concatenate([uv, depths[:, None]], axis=1))
        got = codec.decode_location(
            jnp.asarray(points), jnp.asarray(offsets), jnp.asarray(depths),
            jnp.asarray(np.tile(KITTI_P2[None], (K, 1, 1)), jnp.float32),
            jnp.asarray(pad), down_ratio=4,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestOrientation:
    def test_multibin_roundtrip(self):
        """encode (dataset-side) -> decode (codec) must recover alpha."""
        from dcd_tpu.data.target_encoder import encode_alpha_multibin

        num_bin = 4
        for alpha in np.linspace(-np.pi + 0.01, np.pi - 0.01, 17):
            enc = encode_alpha_multibin(alpha, num_bin=num_bin)
            # build an orientation vector that decodes to this encoding:
            # bin logits favor encoded bins; sin/cos from the offsets
            vec = np.zeros(num_bin * 4, dtype=np.float32)
            for i in range(num_bin):
                vec[i * 2 + 1] = 10.0 if enc[i] == 1 else -10.0
                vec[i * 2] = -vec[i * 2 + 1]
                off = enc[num_bin + i]
                vec[num_bin * 2 + i * 2] = np.sin(off)
                vec[num_bin * 2 + i * 2 + 1] = np.cos(off)
            loc = np.array([[0.0, 0.0, 10.0]], np.float32)  # ray = 0 -> roty == alpha
            rotys, alphas = codec.decode_axes_orientation(
                jnp.asarray(vec[None]), jnp.asarray(loc), orien_bin_size=num_bin
            )
            err = np.abs(np.asarray(alphas)[0] - alpha)
            err = min(err, 2 * np.pi - err)
            assert err < 1e-3, (alpha, np.asarray(alphas)[0])

    def test_alpha_roty_conversions(self):
        for _ in range(20):
            ry = RNG.uniform(-np.pi, np.pi)
            x, z = RNG.uniform(-10, 10), RNG.uniform(1, 50)
            alpha = geo.convert_rot_to_alpha(ry, z, x)
            assert -np.pi <= alpha <= np.pi


class TestKeypointDepth:
    def test_center_height_depth(self):
        """An object of height h at depth d has center keypoint separation
        f*h/d pixels -> decode must return d."""
        f = KITTI_P2[0, 0]
        h, d = 1.5, 30.0
        down = 4
        sep = f * h / d / down  # feature-map pixels
        kpts = np.zeros((1, 10, 2), np.float32)
        kpts[0, 8, 1] = sep / 2  # bottom below
        kpts[0, 9, 1] = -sep / 2  # top above
        # make the corner pairs consistent too
        kpts[0, [0, 1, 2, 3], 1] = sep / 2
        kpts[0, [4, 5, 6, 7], 1] = -sep / 2
        dims = np.array([[3.9, h, 1.6]], np.float32)
        got = codec.decode_depth_from_keypoints(
            jnp.asarray(kpts), jnp.asarray(dims),
            jnp.asarray(KITTI_P2[None], jnp.float32), down_ratio=down,
        )
        np.testing.assert_allclose(np.asarray(got)[0], [d, d, d], rtol=1e-2)


class TestDimensionDecode:
    def test_exp_mean(self):
        mean = jnp.asarray([[3.88, 1.53, 1.63]], jnp.float32)
        std = jnp.asarray([[0.42, 0.14, 0.10]], jnp.float32)
        off = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
        got = codec.decode_dimension(jnp.asarray([0]), off, mean, std, ("exp", True, False))
        want = np.exp(np.asarray(off)) * np.asarray(mean)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
