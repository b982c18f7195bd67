"""Precision-parametrized Gaussian draw tests.

The reference tests its Cython kernel only for shape / reproducibility /
input-clobbering (reference tests/test_distributions.py); here the draws
are additionally validated against the analytic mean and covariance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from occuspytial_tpu.ops.icar import (
    icar_spectral,
    icar_sqrt_factor,
    lattice_precision,
    psd_sqrt_factor,
)
from occuspytial_tpu.ops.mvnorm import (
    constrained_icar_mvnorm,
    constrained_icar_mvnorm_cg,
    constrained_icar_mvnorm_unit,
    precision_mvnorm,
    rsr_mvnorm,
    sum_to_zero,
)


def test_sum_to_zero():
    rng = np.random.default_rng(0)
    x, z = rng.normal(size=20), rng.uniform(1, 2, size=20)
    out = sum_to_zero(jnp.asarray(x), jnp.asarray(z))
    assert abs(float(out.sum())) < 1e-4
    # matches the reference's kriging formula (distributions.pyx:24-39)
    np.testing.assert_allclose(
        np.asarray(out), x - z * (x.sum() / z.sum()), rtol=1e-5, atol=1e-6
    )


def test_precision_mvnorm_moments():
    rng = np.random.default_rng(1)
    d = 4
    a = rng.normal(size=(d, d))
    prec = a @ a.T + d * np.eye(d)
    b = rng.normal(size=d)
    cov = np.linalg.inv(prec)
    mean = cov @ b

    keys = jax.random.split(jax.random.key(0), 40_000)
    draws = jax.vmap(
        lambda k: precision_mvnorm(
            k, jnp.asarray(b, jnp.float32), jnp.asarray(prec, jnp.float32)
        )
    )(keys)
    draws = np.asarray(draws, dtype=np.float64)
    np.testing.assert_allclose(draws.mean(0), mean, atol=4 * np.sqrt(
        np.diag(cov).max() / draws.shape[0]) * 4)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.05 * np.abs(
        cov).max() + 0.01)


def test_precision_mvnorm_does_not_clobber_input():
    """Unlike the reference Cython kernel (documented clobbering at
    reference tests/test_distributions.py:16), inputs are untouched."""
    prec = jnp.eye(3) * 2.0
    before = np.asarray(prec).copy()
    precision_mvnorm(jax.random.key(0), jnp.ones(3), prec)
    np.testing.assert_array_equal(np.asarray(prec), before)


def _lattice_q(n_rows, n_cols):
    return np.asarray(
        lattice_precision(n_rows, n_cols, 4).todense(), dtype=np.float64
    )


def test_constrained_icar_moments():
    """Draws must satisfy 1'eta = 0 and match the constrained-MVN moments.

    The unconstrained precision is Lambda = tau*Q + diag(omega); the
    conditional on the hyperplane has mean m - S1 (1'm)/(1'S1) with
    S = Lambda^{-1} (kriging identity the reference implements at
    gibbs/logit.py:94-99)."""
    rng = np.random.default_rng(2)
    q = _lattice_q(4, 4)
    n = q.shape[0]
    omega = rng.uniform(0.1, 0.3, n)
    tau = 1.7
    b = rng.normal(size=n)
    lam = tau * q + np.diag(omega)
    cov = np.linalg.inv(lam)
    m = cov @ b
    s1 = cov @ np.ones(n)
    mean_c = m - s1 * (m.sum() / s1.sum())

    factor = jnp.asarray(icar_sqrt_factor(q), jnp.float32)
    keys = jax.random.split(jax.random.key(5), 40_000)
    draws = jax.vmap(
        lambda k: constrained_icar_mvnorm(
            k, jnp.asarray(b, jnp.float32), jnp.asarray(omega, jnp.float32),
            jnp.asarray(tau, jnp.float32), jnp.asarray(q, jnp.float32),
            factor,
        )
    )(keys)
    draws = np.asarray(draws, dtype=np.float64)
    assert np.abs(draws.sum(1)).max() < 1e-3
    se = np.sqrt(np.diag(cov).max() / draws.shape[0])
    np.testing.assert_allclose(draws.mean(0), mean_c, atol=6 * se)
    # constrained covariance: C - C1 1'C / (1'C1)
    cov_c = cov - np.outer(s1, s1) / s1.sum()
    np.testing.assert_allclose(
        np.cov(draws.T), cov_c, atol=0.08 * np.abs(cov_c).max() + 0.01
    )


def test_cg_draw_matches_cholesky_draw():
    """Identical random inputs => the CG draw must reproduce the exact
    Cholesky draw to solver tolerance (deterministic comparison, no MC)."""
    rng = np.random.default_rng(7)
    q = np.asarray(
        lattice_precision(8, 10, 8).todense(), dtype=np.float64
    )
    n = q.shape[0]
    s_eig, u_eig, sf = icar_spectral(q)
    omega = jnp.asarray(rng.uniform(0.02, 0.25, n), jnp.float32)
    tau = jnp.asarray(5.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=n), jnp.float32)
    args = (
        jnp.asarray(q, jnp.float32), jnp.asarray(sf, jnp.float32),
    )
    key = jax.random.key(3)
    exact = constrained_icar_mvnorm(key, b, omega, tau, *args)
    warm = jnp.zeros((2, n), jnp.float32)
    approx, warm_out = constrained_icar_mvnorm_cg(
        key, b, omega, tau, args[0], args[1],
        jnp.asarray(u_eig, jnp.float32), jnp.asarray(s_eig, jnp.float32),
        warm, 15,
    )
    assert abs(float(approx.sum())) < 1e-3
    scale = float(jnp.abs(exact).max())
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(exact), atol=0.02 * scale
    )
    assert warm_out.shape == (2, n)


def test_unit_spectral_draw_moments():
    """tau*Q + I case: closed-form spectral draw matches the constrained
    moments."""
    rng = np.random.default_rng(8)
    q = np.asarray(
        lattice_precision(4, 4, 4).todense(), dtype=np.float64
    )
    n = q.shape[0]
    s_eig, u_eig, _ = icar_spectral(q)
    tau = 1.3
    b = rng.normal(size=n)
    lam = tau * q + np.eye(n)
    cov = np.linalg.inv(lam)
    m = cov @ b
    s1 = cov @ np.ones(n)
    mean_c = m - s1 * (m.sum() / s1.sum())
    cov_c = cov - np.outer(s1, s1) / s1.sum()

    keys = jax.random.split(jax.random.key(9), 40_000)
    draws = jax.vmap(
        lambda k: constrained_icar_mvnorm_unit(
            k, jnp.asarray(b, jnp.float32), jnp.asarray(tau, jnp.float32),
            jnp.asarray(u_eig, jnp.float32),
            jnp.asarray(s_eig, jnp.float32),
        )
    )(keys)
    draws = np.asarray(draws, dtype=np.float64)
    assert np.abs(draws.sum(1)).max() < 1e-3
    se = np.sqrt(np.diag(cov).max() / draws.shape[0])
    np.testing.assert_allclose(draws.mean(0), mean_c, atol=6 * se)
    np.testing.assert_allclose(
        np.cov(draws.T), cov_c, atol=0.08 * np.abs(cov_c).max() + 0.01
    )


def test_rsr_mvnorm_moments():
    rng = np.random.default_rng(3)
    n, qd = 30, 5
    k_basis = np.linalg.qr(rng.normal(size=(n, qd)))[0]
    q_rsr = np.eye(qd) * rng.uniform(1, 2, qd)
    omega = rng.uniform(0.1, 0.3, n)
    tau = 0.8
    b = rng.normal(size=qd)
    lam = tau * q_rsr + k_basis.T @ np.diag(omega) @ k_basis
    cov = np.linalg.inv(lam)
    mean = cov @ b

    keys = jax.random.split(jax.random.key(7), 40_000)
    draws = jax.vmap(
        lambda k: rsr_mvnorm(
            k, jnp.asarray(b, jnp.float32), jnp.asarray(omega, jnp.float32),
            jnp.asarray(tau, jnp.float32), jnp.asarray(q_rsr, jnp.float32),
            jnp.asarray(k_basis, jnp.float32),
            jnp.asarray(psd_sqrt_factor(q_rsr), jnp.float32),
        )
    )(keys)
    draws = np.asarray(draws, dtype=np.float64)
    se = np.sqrt(np.diag(cov).max() / draws.shape[0])
    np.testing.assert_allclose(draws.mean(0), mean, atol=6 * se)
    np.testing.assert_allclose(
        np.cov(draws.T), cov, atol=0.08 * np.abs(cov).max() + 0.01
    )


def test_spectral_cg_matches_site_basis_cg():
    """The eigenbasis CG (2 matmuls/iter) and the site-basis CG generate
    the same Krylov iterates up to float32 rounding: solutions from
    identical inputs must agree to well below the solver tolerance the
    sampler relies on, and the returned spectral carry must transform
    back to the site solution."""
    from occuspytial_tpu.ops.cg import icar_cg_solve, icar_cg_solve_spectral

    rng = np.random.default_rng(11)
    q = np.asarray(
        lattice_precision(9, 9, 8).todense(), dtype=np.float64
    )
    n = q.shape[0]
    s_eig, u_eig, _ = icar_spectral(q)
    u32 = jnp.asarray(u_eig, jnp.float32)
    s32 = jnp.asarray(s_eig, jnp.float32)
    omega = jnp.asarray(rng.uniform(0.02, 0.25, n), jnp.float32)
    tau = jnp.asarray(3.7, jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)

    site = icar_cg_solve(
        rhs, jnp.zeros_like(rhs), omega, tau,
        jnp.asarray(q, jnp.float32), u32, s32, 15,
    )
    spec_site, spec_carry = icar_cg_solve_spectral(
        rhs, jnp.zeros_like(rhs), omega, tau, u32, s32, 15,
    )
    scale = float(jnp.abs(site).max())
    np.testing.assert_allclose(
        np.asarray(spec_site), np.asarray(site), atol=5e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(spec_carry @ u32.T), np.asarray(spec_site),
        atol=1e-4 * scale,
    )
    # solution quality vs the exact dense solve
    lam = tau * np.asarray(q) + np.diag(np.asarray(omega, np.float64))
    exact = np.linalg.solve(lam, np.asarray(rhs, np.float64).T).T
    np.testing.assert_allclose(
        np.asarray(spec_site), exact, atol=2e-2 * np.abs(exact).max()
    )
