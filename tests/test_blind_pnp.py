"""Declarative weighted blind PnP tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dcd_tpu.models.blind_pnp import objective, weighted_blind_pnp
from dcd_tpu.ops.geometry3d import angle_axis_to_rotation_matrix

RNG = np.random.RandomState(0)


def _make_problem(n=12, noise=0.0):
    aa_gt = np.array([0.1, -0.2, 0.15])
    t_gt = np.array([0.2, -0.1, 4.0])
    R = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(aa_gt)))
    p3d = RNG.uniform(-1, 1, (n, 3))
    cam = p3d @ R.T + t_gt
    p2d = cam[:, :2] / cam[:, 2:3] + noise * RNG.randn(n, 2)
    theta_gt = np.concatenate([aa_gt, t_gt])
    return jnp.asarray(p2d), jnp.asarray(p3d), jnp.asarray(theta_gt)


def test_objective_zero_at_true_pose():
    p2d, p3d, theta_gt = _make_problem()
    P = jnp.eye(p2d.shape[0]) / p2d.shape[0]
    val = float(objective(P, theta_gt, p2d, p3d))
    assert val < 1e-6


def test_inner_solver_recovers_pose():
    p2d, p3d, theta_gt = _make_problem()
    P = jnp.eye(p2d.shape[0]) / p2d.shape[0]
    theta0 = theta_gt + jnp.asarray(RNG.randn(6) * 0.05)
    theta = weighted_blind_pnp(P, theta0, p2d, p3d, 60)
    # objective at the solution must be near-zero (pose may differ along
    # gauge directions but reprojection must fit)
    assert float(objective(P, theta, p2d, p3d)) < 1e-5


def test_implicit_gradient_wrt_weights():
    p2d, p3d, theta_gt = _make_problem()
    n = p2d.shape[0]
    P = jnp.ones((n, n)) / (n * n)
    theta0 = theta_gt + 0.02

    def outer(P):
        theta = weighted_blind_pnp(P, theta0, p2d, p3d, 40)
        return (theta**2).sum()

    g = jax.grad(outer)(P)
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0
