"""3D pose geometry tests (Rodrigues vs scipy-free oracles)."""

import numpy as np
import jax.numpy as jnp

from dcd_tpu.ops import geometry3d as g3

RNG = np.random.RandomState(0)


def test_rodrigues_axis_angle_known():
    # 90deg about z: x -> y
    aa = jnp.asarray([0.0, 0.0, np.pi / 2])
    R = np.asarray(g3.angle_axis_to_rotation_matrix(aa))
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)


def test_rodrigues_orthonormal():
    aa = jnp.asarray(RNG.randn(10, 3))
    R = np.asarray(g3.angle_axis_to_rotation_matrix(aa))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r) - 1) < 1e-5


def test_rodrigues_small_angle_branch():
    aa = jnp.asarray([1e-9, -1e-9, 1e-9])
    R = np.asarray(g3.angle_axis_to_rotation_matrix(aa))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_rotation_error_zero_and_pi():
    aa = jnp.asarray(RNG.randn(3))
    R = g3.angle_axis_to_rotation_matrix(aa)
    assert float(g3.rotation_errors(R, R)) < 1e-3
    R180 = g3.angle_axis_to_rotation_matrix(jnp.asarray([0.0, 0.0, np.pi]))
    I = jnp.eye(3)
    assert abs(float(g3.rotation_errors(R180, I)) - np.pi) < 1e-3


def test_correspondence_matrix_identity_pose():
    """3D points projected to 2D with identity pose must be inliers on the
    diagonal."""
    p3d = jnp.asarray(RNG.uniform(-1, 1, (1, 6, 3)) + np.array([0, 0, 5.0]))
    p2d = p3d[..., :2] / p3d[..., 2:3]
    C = np.asarray(
        g3.correspondence_matrices(jnp.eye(3)[None], jnp.zeros((1, 3)), p2d, p3d, 1e-3)
    )[0]
    np.testing.assert_allclose(np.diag(C), 1.0)


def test_reprojection_error_zero_for_true_pose():
    p3d = jnp.asarray(RNG.uniform(-1, 1, (1, 5, 3)) + np.array([0, 0, 6.0]))
    p2d = p3d[..., :2] / p3d[..., 2:3]
    P = jnp.eye(5)[None] / 5.0
    err = float(
        g3.reprojection_errors(jnp.eye(3)[None], jnp.zeros((1, 3)), p2d, p3d, P)[0]
    )
    assert err < 1e-5
