"""Sinkhorn layer tests: marginal satisfaction, objective optimality, and
the implicit gradient vs autodiff-through-unrolled-iterations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.ops.sinkhorn import (
    regularised_transport,
    sinkhorn_forward,
    sinkhorn_objective,
)

RNG = np.random.RandomState(0)


def _rand_problem(b=2, m=5, n=7):
    M = jnp.asarray(np.abs(RNG.randn(b, m, n)).astype(np.float32))
    r = jnp.full((b, m), 1.0 / m, jnp.float32)
    c = jnp.full((b, n), 1.0 / n, jnp.float32)
    return M, r, c


def test_marginals():
    M, r, c = _rand_problem()
    P = sinkhorn_forward(M, r, c)
    np.testing.assert_allclose(np.asarray(P.sum(-1)), np.asarray(r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(P.sum(-2)), np.asarray(c), atol=1e-6)


def test_objective_optimality():
    """Perturbing P* away from the solution (preserving marginals) must not
    decrease the objective."""
    M, r, c = _rand_problem(1, 4, 4)
    P = sinkhorn_forward(M, r, c)
    base = float(sinkhorn_objective(M, P, r, c)[0])
    rng = np.random.RandomState(1)
    for _ in range(10):
        # random doubly-centered perturbation keeps both marginals
        d = rng.randn(4, 4) * 1e-3
        d = d - d.mean(0, keepdims=True) - d.mean(1, keepdims=True) + d.mean()
        P2 = np.asarray(P)[0] + d
        if (P2 <= 0).any():
            continue
        val = float(sinkhorn_objective(M, jnp.asarray(P2[None]), r, c)[0])
        assert val >= base - 1e-7


def test_implicit_gradient_matches_unrolled():
    """The analytic implicit VJP must match autodiff through the unrolled
    fixed-point iteration (the standard check for declarative layers)."""
    M, r, c = _rand_problem(2, 5, 6)

    def loss_implicit(M):
        P = regularised_transport(M, r, c, 10.0, 1e-9, 100)
        return (P * jnp.cos(M)).sum() + (P**2).sum()

    def unrolled(M):
        # plain-python unrolled Sinkhorn (fully differentiable)
        lmbda = 10.0
        K = jnp.exp(-lmbda * jnp.minimum(M, 5.0))
        u = r[..., None]
        for _ in range(200):
            u = r[..., None] / (K @ (c[..., None] / (K.transpose(0, 2, 1) @ u)))
        v = c[..., None] / (K.transpose(0, 2, 1) @ u)
        P = (u * K) * v.transpose(0, 2, 1)
        return (P * jnp.cos(M)).sum() + (P**2).sum()

    g_imp = jax.grad(loss_implicit)(M)
    g_unr = jax.grad(unrolled)(M)
    np.testing.assert_allclose(np.asarray(g_imp), np.asarray(g_unr), rtol=2e-3, atol=2e-5)


def test_gradient_finite_near_uniform_cost():
    """Near-uniform costs are the worst conditioning for the implicit
    solve; gradients must stay finite. (Exactly-uniform cost makes the KKT
    Schur complement singular — the reference's torch.cholesky fails there
    too, so that degenerate case is out of contract.)"""
    b, m, n = 1, 4, 4
    M = jnp.ones((b, m, n), jnp.float32) + 1e-3 * jnp.asarray(RNG.randn(b, m, n), jnp.float32)
    r = jnp.full((b, m), 1.0 / m)
    c = jnp.full((b, n), 1.0 / n)
    g = jax.grad(lambda M: regularised_transport(M, r, c, 10.0, 1e-9, 100).std())(M)
    assert np.isfinite(np.asarray(g)).all()


def test_cg_matches_cholesky_solver():
    """The matrix-free PCG Schur solve must agree with the dense Cholesky
    path (the reference's strategy) to solver tolerance."""
    import numpy as np

    from dcd_tpu.ops import sinkhorn as S

    rng = np.random.RandomState(0)
    b, m, n = 3, 33, 32
    M = jnp.asarray(rng.rand(b, m, n).astype(np.float32))
    P = S.sinkhorn_forward(M)
    g = jnp.asarray(rng.randn(b, m, n).astype(np.float32))
    old = S.SOLVER
    try:
        S.SOLVER = "cg"
        g_cg = S._sinkhorn_vjp_dense(P, 10.0, g.reshape(b, -1))
        S.SOLVER = "chol"
        g_ch = S._sinkhorn_vjp_dense(P, 10.0, g.reshape(b, -1))
    finally:
        S.SOLVER = old
    scale = float(jnp.max(jnp.abs(g_ch))) + 1e-12
    assert float(jnp.max(jnp.abs(g_cg - g_ch))) / scale < 1e-5
