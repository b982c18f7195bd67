"""Gaussian sampling parametrized by precision matrices (TPU-native).

Replaces the reference's Cython/LAPACK kernel ``precision_mvnorm``
(reference distributions.pyx:42-110, which clobbers its input with dpotrf /
dtrmv / dpotrs in-place) with pure, jit-friendly Cholesky factor-and-solve,
and the kriging sum-to-zero projection ``ensure_sums_to_zero`` (reference
distributions.pyx:24-39) with a fused two-reduction expression.

Also provides the constrained ICAR conditional draw that the reference
implements with a warm-started MINRES on a 2n block system (reference
gibbs/logit.py:73-99): on TPU a dense Cholesky with two right-hand sides is
exact and — batched across vmapped chains by XLA — faster at the problem
sizes involved. All functions here are written *unbatched*; the chain axis
is added by ``jax.vmap`` in the sampler driver.
"""

import jax
import jax.numpy as jnp


def sum_to_zero(x, z):
    """Kriging projection onto the hyperplane ``1'v = 0``.

    Given ``x = Lambda^{-1} y`` and ``z = Lambda^{-1} 1``, returns
    ``x - z * sum(x) / sum(z)``, the conditional draw on the constraint
    surface (reference distributions.pyx:24-39).
    """
    return x - z * (jnp.sum(x) / jnp.sum(z))


#: below this dimension the Cholesky/solves are unrolled into scalar
#: expressions (coefficient-count O(d^3) but fully fusible elementwise
#: ops) instead of LAPACK-style custom calls, whose fixed per-call cost
#: dwarfs the arithmetic for the p ~ 3 regression blocks every Gibbs
#: iteration draws
_UNROLL_DIM = 6


def _chol_unrolled(a, d):
    """Lower Cholesky factor of a (d, d) SPD matrix as scalar ops."""
    low = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = a[i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            if i == j:
                low[i][j] = jnp.sqrt(s)
            else:
                low[i][j] = s / low[j][j]
    return low


def _fwd_unrolled(low, b, d):
    """Solve L y = b (lower triangular, scalar list form)."""
    y = [None] * d
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y[i] = s / low[i][i]
    return y


def _bwd_unrolled(low, y, d):
    """Solve L' x = y."""
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - low[k][i] * x[k]
        x[i] = s / low[i][i]
    return x


def precision_mvnorm(key, b, prec):
    """Draw from N(Lambda^{-1} b, Lambda^{-1}), ``b`` (d,), ``prec`` (d, d).

    Pure (non-clobbering) TPU analog of reference distributions.pyx:42-110.
    Uses mean = cho_solve(L, b) and fluctuation L'^{-T} eps, which has
    covariance (L L')^{-1} = Lambda^{-1}; one factorization, one extra
    triangular solve. For small d (regression blocks) the factorization
    and solves are unrolled into fusible scalar expressions — no
    factorization custom call in the hot loop.
    """
    eps = jax.random.normal(key, b.shape, b.dtype)
    d = b.shape[-1]
    if b.ndim == 1 and d <= _UNROLL_DIM:
        low = _chol_unrolled(prec, d)
        # mean: L L' m = b ; fluctuation: L' f = eps
        mean = _bwd_unrolled(low, _fwd_unrolled(low, b, d), d)
        fluct = _bwd_unrolled(low, eps, d)
        return jnp.stack([m + f for m, f in zip(mean, fluct)])
    chol = jnp.linalg.cholesky(prec)
    mean = jax.scipy.linalg.cho_solve((chol, True), b)
    fluct = jax.scipy.linalg.solve_triangular(chol, eps, lower=True, trans=1)
    return mean + fluct


def constrained_icar_mvnorm(key, b, omega, tau, q_dense, sqrt_factor):
    """Draw eta ~ N(Lambda^{-1} b, Lambda^{-1}) restricted to 1'eta = 0.

    ``Lambda = tau * Q + diag(omega)``. This is the eta conditional of the
    logit ICAR sampler (reference gibbs/logit.py:16-99). Method:

      1. y = b + sqrt(omega) * eps1 + sqrt(tau) * (B @ eps2), where
         ``B = sqrt_factor`` satisfies B B' = Q (the eigenfactor
         U[:, 1:] * sqrt(s[1:]) of the singular ICAR precision, mirroring
         reference gibbs/logit.py:66-67). Then y ~ N(b, Lambda).
      2. Solve Lambda [x, z] = [y, 1] with one Cholesky factorization
         (the reference does this with a block-diagonal 2n MINRES solve,
         gibbs/logit.py:80-89; Cholesky is exact — no solver tolerance
         enters the chain).
      3. Kriging-project: eta = x - z * sum(x)/sum(z).
    """
    n = b.shape[0]
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (n,), b.dtype)
    eps2 = jax.random.normal(k2, (sqrt_factor.shape[1],), b.dtype)
    y = b + jnp.sqrt(omega) * eps1 + jnp.sqrt(tau) * (sqrt_factor @ eps2)

    lam = tau * q_dense + jnp.diag(omega)
    chol = jnp.linalg.cholesky(lam)
    rhs = jnp.stack([y, jnp.ones_like(y)], axis=-1)  # (n, 2)
    sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
    return sum_to_zero(sol[:, 0], sol[:, 1])


def constrained_icar_mvnorm_cg(
    key, b, omega, tau, q_dense, sqrt_factor, eigvecs, eigvals, warm,
    iters,
):
    """CG variant of :func:`constrained_icar_mvnorm` with warm starts.

    Same distribution, but the two solves run through the batched
    spectrally-preconditioned CG of :mod:`occuspytial_tpu.ops.cg` seeded
    from ``warm`` (a (2, n) stack of the previous iteration's solutions) —
    the TPU translation of the reference's warm-started MINRES
    (gibbs/logit.py:80-92). Returns ``(eta, new_warm)`` so the sampler can
    carry the solutions forward.
    """
    from .cg import icar_cg_solve

    n = b.shape[0]
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (n,), b.dtype)
    eps2 = jax.random.normal(k2, (sqrt_factor.shape[1],), b.dtype)
    y = b + jnp.sqrt(omega) * eps1 + jnp.sqrt(tau) * (sqrt_factor @ eps2)

    rhs = jnp.stack([y, jnp.ones_like(y)])  # (2, n)
    sol = icar_cg_solve(
        rhs, warm, omega, tau, q_dense, eigvecs, eigvals, iters
    )
    return sum_to_zero(sol[0], sol[1]), sol


def constrained_icar_mvnorm_unit(key, b, tau, eigvecs, eigvals):
    """Constrained draw for the unit-noise case ``Lambda = tau*Q + I``.

    With omega identically 1 (the probit ICAR eta conditional), Lambda is
    exactly diagonal in Q's eigenbasis, so both solves and the
    perturbation are closed-form spectral transforms — no factorization,
    no iteration:

        y' = U'b + eps1' + sqrt(tau*s) * eps2'   (eps' standard normal in
                                                  the eigenbasis)
        x  = U (y' / (tau*s + 1)),  z = U (U'1 / (tau*s + 1))

    followed by the kriging projection. The singular direction (s=0) is
    retained with unit precision from the identity term; the projection
    then removes the constraint component exactly.
    """
    n = b.shape[0]
    eps = jax.random.normal(key, (n,), b.dtype)
    d = tau * eigvals + 1.0
    y_spec = (b @ eigvecs) + jnp.sqrt(d) * eps
    x = (y_spec / d) @ eigvecs.T
    ones_spec = jnp.sum(eigvecs, axis=0)  # U' 1
    z = (ones_spec / d) @ eigvecs.T
    return sum_to_zero(x, z)


def rsr_mvnorm(key, b, omega, tau, q_rsr, k_basis, sqrt_factor):
    """Draw the RSR eta (q,) from N(Lambda^{-1} b, Lambda^{-1}).

    ``Lambda = tau * Q_rsr + K' diag(omega) K`` with ``K`` the (n, q) Moran
    basis. Mirrors reference gibbs/logit.py:269-337 but uses a Cholesky
    solve instead of ``np.linalg.solve`` of the assembled precision; the
    K' diag(omega) K contraction runs on the MXU.

    ``sqrt_factor`` is the (q, q) eigenfactor E with E E' = Q_rsr
    (reference gibbs/logit.py:320).
    """
    q = q_rsr.shape[0]
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (k_basis.shape[0],), b.dtype)
    eps2 = jax.random.normal(k2, (q,), b.dtype)
    # y ~ N(b, Lambda): K'(sqrt(omega) eps1) + sqrt(tau) E eps2
    y = b + (jnp.sqrt(omega) * eps1) @ k_basis + jnp.sqrt(tau) * (
        sqrt_factor @ eps2
    )
    lam = tau * q_rsr + jnp.einsum(
        "np,n,nq->pq", k_basis, omega, k_basis,
        precision='highest',
    )
    chol = jnp.linalg.cholesky(lam)
    return jax.scipy.linalg.cho_solve((chol, True), y)
