"""Declarative weighted blind PnP (bi-level pose solver).

Parity component for ``GMW/lib/nonlinear_weighted_blind_pnp.py`` (imported
by the reference's model but not called in the shipped forward path): the
inner problem minimizes the transport-weighted angular reprojection
objective over a 6-dof pose theta = (angle_axis, t),

    J(P, theta) = sum_mn P_mn * (1 - <bearing(p2d_m), normalize(R p3d_n + t)>)

and the outer gradient dJ_outer/dP comes from the implicit function theorem
(Deep Declarative Networks): dtheta/dP = -H^{-1} B with H the inner Hessian
over theta and B the mixed second derivative. The reference solves the
inner problem with torch LBFGS (:138-...) and assembles Dy by hand (:76-);
here the inner solve is a fixed-iteration Gauss-Newton/gradient hybrid
under jit and the implicit backward is built from jax.hessian/jax.jacobian.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.geometry3d import angle_axis_to_rotation_matrix, points_to_bearings, transform_and_normalise_points


def objective(P: jnp.ndarray, theta: jnp.ndarray, p2d: jnp.ndarray, p3d: jnp.ndarray) -> jnp.ndarray:
    """Weighted angular reprojection (scalar per batch element)."""
    R = angle_axis_to_rotation_matrix(theta[..., :3])
    t = theta[..., 3:]
    b2 = points_to_bearings(p2d)
    b3 = transform_and_normalise_points(p3d, R, t)
    dot = jnp.einsum("...md,...nd->...mn", b2, b3)
    return ((1.0 - dot) * P).sum(axis=(-2, -1))


def _solve_inner(P, theta0, p2d, p3d, iters: int = 50, damping: float = 1e-4):
    """Damped-Newton inner solve, fixed iteration count (jit-friendly)."""

    def obj(theta):
        return objective(P, theta, p2d, p3d)

    grad_fn = jax.grad(obj)
    hess_fn = jax.hessian(obj)

    def body(_, theta):
        g = grad_fn(theta)
        H = hess_fn(theta)
        H = H + damping * jnp.eye(6, dtype=theta.dtype)
        step = jnp.linalg.solve(H, g)
        # fall back to gradient descent when the Newton step is bad
        ok = jnp.isfinite(step).all()
        step = jnp.where(ok, step, 0.1 * g)
        new = theta - step
        better = obj(new) < obj(theta)
        return jnp.where(better, new, theta - 0.05 * g)

    return jax.lax.fori_loop(0, iters, body, theta0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def weighted_blind_pnp(P, theta0, p2d, p3d, iters: int = 50):
    """argmin_theta J(P, theta); gradients flow to P implicitly.

    P: (m, n) transport weights; theta0: (6,) initial pose; p2d: (m, 2)
    normalized image points; p3d: (n, 3). Batch via jax.vmap.
    """
    return _solve_inner(P, theta0, p2d, p3d, iters)


def _pnp_fwd(P, theta0, p2d, p3d, iters):
    theta = _solve_inner(P, theta0, p2d, p3d, iters)
    return theta, (P, theta, p2d, p3d)


def _pnp_bwd(iters, res, g):
    P, theta, p2d, p3d = res
    # implicit function theorem at the stationary point:
    # dtheta/dP = -H^{-1} * d2J/(dtheta dP); vjp: gP = -B^T H^{-1} g
    def obj_theta(th):
        return objective(P, th, p2d, p3d)

    H = jax.hessian(obj_theta)(theta)  # (6, 6)
    H = H + 1e-6 * jnp.eye(6, dtype=theta.dtype)
    v = jnp.linalg.solve(H, g)  # (6,)

    def grad_wrt_theta(P_):
        return jax.grad(lambda th: objective(P_, th, p2d, p3d))(theta)

    _, vjp_P = jax.vjp(grad_wrt_theta, P)
    (gP,) = vjp_P(-v)
    return gP, jnp.zeros_like(theta), jnp.zeros_like(p2d), jnp.zeros_like(p3d)


weighted_blind_pnp.defvjp(_pnp_fwd, _pnp_bwd)
