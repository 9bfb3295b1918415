"""Entropy-regularised optimal transport (Sinkhorn) as a declarative layer.

TPU rewrite of ``GMW/lib/optimal_transport.py:26-232``:

* forward: vectorized Sinkhorn scaling ``u <- r / K(c / K^T u)`` run inside a
  ``lax.while_loop`` with the same tolerance/iteration caps (:52-72).
* backward: the analytic implicit gradient from Deep Declarative Networks
  Lemma 4.4 (:75-128) — build the Schur complement S of the KKT system,
  Cholesky-factorize, and assemble the vector-Jacobian product. Implemented
  with ``jax.scipy.linalg.cho_factor/cho_solve`` batched by vmap (the
  reference loops ``torch.cholesky_inverse`` per sample, :113-114).

fp32 throughout; the Cholesky is the numerically delicate part, exactly as
in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# Schur-complement solver for the implicit VJP: "chol" (dense Cholesky of
# the Schur complement — the reference's strategy,
# optimal_transport.py:104-117, and the production default) or "cg"
# (matrix-free Jacobi-preconditioned conjugate gradients; S @ v needs only
# two B1 matvecs and no (b, n, n) temporary). Measured on hardware at the
# shipped 2628-edge scale (tools/bench_gmw.py): chol 49.7 ms/step finite,
# cg 112 ms/step and fp32-fragile (the Schur system is ill-conditioned
# enough that single-precision PCG needs hundreds of iterations and can
# break down) — so cg stays an option, oracle-tested at small scale.
import os as _os

SOLVER = _os.environ.get("DCD_SINKHORN_SOLVER", "chol")
_CG_TOL = 1e-8
_CG_MAX_ITERS = 256
# Forward kernel-matrix dtype (VERDICT r4 #7 route 2): "bfloat16" halves
# the HBM reads of the (b, n, n) K matrix in every scaling-iteration
# matvec (the iterations stay fp32: u/v/r/c and the accumulators). The
# fixed point then carries ~1e-3 relative noise and the 1e-9 u-tolerance
# can no longer trigger, so the loop runs to max_iterations — measured at
# the shipped scale in tools/bench_gmw.py before judging (see the note in
# docs/PERF.md round 5). fp32 stays the default.
K_DTYPE = _os.environ.get("DCD_SINKHORN_K_DTYPE", "float32")


def sinkhorn_forward(
    M: jnp.ndarray,
    r: Optional[jnp.ndarray] = None,
    c: Optional[jnp.ndarray] = None,
    lmbda: float = 10.0,
    tolerance: float = 1e-9,
    max_iterations: int = 100,
    max_distance: float = 5.0,
) -> jnp.ndarray:
    """Transport matrix P for cost M (b, m, n); r (b, m), c (b, n) marginals."""
    b, m, n = M.shape
    K = jnp.exp(-lmbda * jnp.minimum(M, max_distance))
    if K_DTYPE == "bfloat16":
        K = K.astype(jnp.bfloat16)
    if r is None:
        r = jnp.full((b, m), 1.0 / m, M.dtype)
    if c is None:
        c = jnp.full((b, n), 1.0 / n, M.dtype)
    r = r[..., None]  # (b, m, 1)
    c = c[..., None]  # (b, n, 1)

    def kmat(vec, eq):
        # matvec against K in its storage dtype, fp32 accumulation
        return jnp.einsum(eq, K, vec.astype(K.dtype),
                          preferred_element_type=jnp.float32)

    def cond(state):
        i, u, u_prev = state
        return (i < max_iterations) & ~jnp.all(jnp.abs(u - u_prev) <= tolerance)

    def body(state):
        i, u, _ = state
        Ktu = kmat(u, "bmn,bm1->bn1")
        u_new = r / kmat(c / Ktu, "bmn,bn1->bm1")
        return i + 1, u_new, u

    u0 = r
    _, u, _ = jax.lax.while_loop(cond, body, (0, u0, jnp.ones_like(u0)))
    v = c / kmat(u, "bmn,bm1->bn1")
    P = (u * K.astype(M.dtype)) * v.transpose(0, 2, 1)
    return P


def _schur_solve_cg(B1, d1inv, d2, rhs):
    """Solve S x = rhs for S = D2 - B1^T D1^-1 B1 (SPD) without forming S.

    Matrix-free Jacobi-preconditioned conjugate gradients: one S @ p is
    two B1 matvecs (O(b m n)) vs the O(n^3/3) Cholesky of a (b, n, n)
    materialized S. In practice (see the SOLVER note above) the shipped
    2628-edge system is ill-conditioned enough that fp32 PCG needs
    hundreds of iterations and loses to the dense factorization on
    hardware — kept as an option for smaller graphs / memory-bound
    settings. Batched over b inside one lax.while_loop; runs until every
    sample's relative residual is under _CG_TOL.
    """
    diagS = d2 - jnp.einsum("bkn,bk->bn", B1 * B1, d1inv)
    pinv = 1.0 / jnp.maximum(diagS, 1e-30)

    def matvec(x):
        return d2 * x - jnp.einsum(
            "bkn,bk->bn", B1, d1inv * jnp.einsum("bkn,bn->bk", B1, x)
        )

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = pinv * r0
    p0 = z0
    rz0 = (r0 * z0).sum(-1)
    rhs_nrm = jnp.maximum((rhs * rhs).sum(-1), 1e-30)

    def cond(state):
        i, x, r, p, rz = state
        done = jnp.all((r * r).sum(-1) <= (_CG_TOL**2) * rhs_nrm)
        return (i < _CG_MAX_ITERS) & ~done

    def body(state):
        i, x, r, p, rz = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum((p * Ap).sum(-1), 1e-30)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        z = pinv * r
        rz_new = (r * z).sum(-1)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta[:, None] * p
        return i + 1, x, r, p, rz_new

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
    return x


def _sinkhorn_vjp_dense(P: jnp.ndarray, lmbda: float, v: jnp.ndarray) -> jnp.ndarray:
    """Implicit gradient dJ/dM from dJ/dP (both (b, m, n)).

    Port of gradientFn (optimal_transport.py:75-128) — but where the
    reference materializes the full KKT-inverse blocks (Sinv via
    torch.cholesky_inverse :113-114, then R and Q as n^2 matrices), the VJP
    only ever applies that inverse to ONE vector per sample. So we solve
    A @ [u3; u4] = [u1; u2] directly with a single Cholesky of the Schur
    complement S plus one block-substitution: the O(n^3) matrix-matrix
    inverse/products collapse to one n^3/3 factorization and O(n^2) solves.
    At the shipped scale (E = 2628) this is ~4x less FLOPs and drops three
    (b, n, n) temporaries — the difference between fitting the GMW backward
    on-chip at batch 8 and not.
    """
    b, m, n = P.shape
    B = lmbda * P
    hinv = B.reshape(b, -1)  # vec of H^-1 diagonal
    d1inv = 1.0 / B.sum(-1)[:, 1:]  # (b, m-1)
    d2 = B.sum(-2)  # (b, n)
    B1 = B[:, 1:, :]  # (b, m-1, n)

    vHinv = v * hinv  # (b, m*n)
    blocks = vHinv.reshape(b, m, n)
    u1 = blocks.sum(-1)[:, 1:]  # (b, m-1)
    u2 = blocks.sum(-2)  # (b, n)

    # block solve of [[D1, B1], [B1^T, D2]] [x1; x2] = [u1; u2] via the
    # Schur complement S = D2 - B1^T D1^-1 B1 (sign-flipped vs the
    # reference's -S; symmetric positive definite either way):
    #   x2 = S^-1 (u2 - B1^T D1^-1 u1);  x1 = D1^-1 (u1 - B1 x2)
    t = u2 - jnp.einsum("bkn,bk->bn", B1, d1inv * u1)
    if SOLVER == "cg":
        x2 = _schur_solve_cg(B1, d1inv, d2, t)
    else:
        S = jnp.einsum(
            "bkn,bkm->bnm", B1 * d1inv[:, :, None], B1,
            preferred_element_type=jnp.float32,
        )
        S = jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(d2) - S
        cf, _ = jax.vmap(lambda s: jax.scipy.linalg.cho_factor(s, lower=True))(S)
        x2 = jax.vmap(
            lambda f, rhs: jax.scipy.linalg.cho_solve((f, True), rhs)
        )(cf, t)  # (b, n)
    x1 = d1inv * (u1 - jnp.einsum("bkn,bn->bk", B1, x2))  # (b, m-1)

    # [u3; u4] rows: row 0 of the (m, n) grid is x2 alone; rows 1..m-1 are
    # x1_i + x2_j (the reference's u5 assembly, :121-125)
    u5 = x1[:, :, None] + x2[:, None, :]  # (b, m-1, n)
    uHinv = jnp.concatenate([x2[:, None, :], u5], axis=-2).reshape(b, -1) * hinv
    return uHinv - vHinv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def regularised_transport(M, r, c, lmbda=10.0, tolerance=1e-9, max_iterations=100):
    """Differentiable Sinkhorn layer (reference RegularisedTransport :224-232).

    Gradients flow to M only (r, c treated as constants, like the
    reference's ``backward`` returning None for them).
    """
    return sinkhorn_forward(M, r, c, lmbda, tolerance, max_iterations)


def _rt_fwd(M, r, c, lmbda, tolerance, max_iterations):
    P = sinkhorn_forward(M, r, c, lmbda, tolerance, max_iterations)
    return P, P


def _rt_bwd(lmbda, tolerance, max_iterations, P, g):
    b, m, n = P.shape
    grad = _sinkhorn_vjp_dense(P, lmbda, g.reshape(b, -1)).reshape(b, m, n)
    return grad, None, None


regularised_transport.defvjp(_rt_fwd, _rt_bwd)


def sinkhorn_objective(M, P, r, c, lmbda=10.0):
    """Entropy-regularised objective (reference objectiveFn :39-49), for
    tests: P* must minimize this subject to the marginals."""
    rc = jnp.einsum("bi,bj->bij", r, c)
    logprc = jnp.where(
        rc == 0.0,
        jnp.zeros_like(rc),
        jnp.log(jnp.clip(P, 1e-36)) - jnp.log(jnp.clip(rc, 1e-36)),
    )
    return (P * M).sum((-2, -1)) + (P * logprc / lmbda).sum((-2, -1))
