"""Matrix-free lattice operator tests against the dense assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occuspytial_tpu.ops import stencil
from occuspytial_tpu.ops.icar import lattice_precision


@pytest.mark.parametrize('neighbors', [4, 8])
@pytest.mark.parametrize('rho', [1.0, 0.5])
def test_matvec_matches_dense(neighbors, rho):
    spec = stencil.LatticeSpec(6, 9, neighbors, rho)
    q = lattice_precision(6, 9, neighbors, rho).toarray().astype(float)
    deg = jnp.asarray(stencil.degree_grid(spec))
    rng = np.random.default_rng(0)
    v = rng.standard_normal((3, spec.n))
    out = np.asarray(stencil.matvec(spec, deg, jnp.asarray(v)))
    np.testing.assert_allclose(out, v @ q.T, atol=1e-4)

    # quadratic form
    qf = float(stencil.quad_form(spec, deg, jnp.asarray(v[0])))
    assert qf == pytest.approx(v[0] @ q @ v[0], rel=1e-5)


@pytest.mark.parametrize('neighbors,rho', [(4, 1.0), (8, 1.0), (8, 0.6)])
def test_noise_covariance(neighbors, rho):
    """E[(B eps)(B eps)'] must equal Q exactly."""
    spec = stencil.LatticeSpec(4, 5, neighbors, rho)
    q = lattice_precision(4, 5, neighbors, rho).toarray().astype(float)
    deg = jnp.asarray(stencil.degree_grid(spec), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 60_000)
    draws = jax.vmap(lambda k: stencil.noise(spec, deg, k))(keys)
    draws = np.asarray(draws, dtype=np.float64)
    cov = draws.T @ draws / draws.shape[0]
    np.testing.assert_allclose(cov, q, atol=0.12 * max(1, q.max()))


def test_cg_solves_system():
    spec = stencil.LatticeSpec(8, 8, 8, 1.0)
    q = lattice_precision(8, 8, 8).toarray().astype(float)
    fixed = {k: jnp.asarray(v) for k, v in stencil.setup(spec).items()}
    rng = np.random.default_rng(1)
    omega = jnp.asarray(rng.uniform(0.05, 0.25, spec.n), jnp.float32)
    tau = jnp.asarray(3.7, jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((2, spec.n)), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    sol = np.asarray(
        stencil.cg_solve(spec, fixed, rhs, x0, omega, tau, 60)
    )
    lam = 3.7 * q + np.diag(np.asarray(omega))
    expected = np.linalg.solve(lam, np.asarray(rhs).T).T
    np.testing.assert_allclose(sol, expected, atol=5e-3)


def test_constrained_draw_sums_to_zero():
    spec = stencil.LatticeSpec(8, 8, 8, 1.0)
    fixed = {k: jnp.asarray(v) for k, v in stencil.setup(spec).items()}
    rng = np.random.default_rng(2)
    omega = jnp.asarray(rng.uniform(0.05, 0.25, spec.n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(spec.n), jnp.float32)
    warm = jnp.zeros((2, spec.n), jnp.float32)
    eta, warm2 = stencil.constrained_mvnorm(
        spec, fixed, jax.random.key(0), b, omega,
        jnp.asarray(2.0, jnp.float32), warm, 60,
    )
    assert abs(float(eta.sum())) < 1e-3
    assert warm2.shape == (2, spec.n)


def test_sampler_with_stencil_solver():
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    Q, W, X, y, *_ = make_data(
        n=150, ns=100, p=3, q=2, min_v=2, max_v=6, random_state=10
    )
    # make_data picked some lattice; find its shape from the factorization
    # used there is random — instead build our own dataset on a known grid
    from occuspytial_tpu.ops.icar import lattice_precision as lp

    q2 = lp(10, 15, 8).astype(float)
    s = LogitICARGibbs(
        q2, W, X, y, random_state=1, lattice=(10, 15, 8),
        pg_method='devroye',
    )
    assert s.solver == 'stencil'
    post = s.sample(20, burnin=4, chains=2, progressbar=False)
    assert post['beta'].shape == (2, 16, 3)
    assert np.isfinite(post['beta']).all()

    # mismatched lattice raises
    with pytest.raises(ValueError, match='does not match'):
        LogitICARGibbs(
            Q, W, X, y, random_state=1, lattice=(10, 15, 4),
            pg_method='devroye',
        )


def test_matvec_mxu_matches_shift_form():
    # the hot-loop matmul form must equal the exact shift-add operator
    from occuspytial_tpu.ops import stencil

    for neighbors in (4, 8):
        spec = stencil.LatticeSpec(6, 9, neighbors)
        fixed = {
            k: jnp.asarray(v) for k, v in stencil.setup(spec).items()
        }
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((3, spec.n)), jnp.float32)
        a = stencil.matvec(spec, fixed['lat_deg'], v)
        b = stencil.matvec_mxu(spec, fixed, v)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
