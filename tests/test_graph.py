"""Matrix-free arbitrary-graph operator tests against dense assembly.

The graph path exists for spatial graphs the lattice stencil cannot
express (reference's sparse MINRES handles these too, reference
gibbs/logit.py:80-92), so the fixtures deliberately include an
IRREGULAR Delaunay-triangulation adjacency, not just lattices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from occuspytial_tpu.ops import graph
from occuspytial_tpu.ops.icar import lattice_precision


def delaunay_precision(n_sites, seed=0, rho=1.0):
    """ICAR/CAR precision on an irregular planar adjacency."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n_sites, 2))
    tri = Delaunay(pts)
    rows, cols = [], []
    for simplex in tri.simplices:
        for a in range(3):
            i, j = simplex[a], simplex[(a + 1) % 3]
            rows += [i, j]
            cols += [j, i]
    adj = sps.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n_sites, n_sites)
    ).tocsr()
    adj.data[:] = 1.0  # dedupe repeated edges
    adj = sps.csr_matrix((adj > 0).astype(float))
    deg = np.asarray(adj.sum(axis=1)).ravel()
    return (sps.diags(deg) - rho * adj).tocsr()


@pytest.mark.parametrize(
    'make_q',
    [
        lambda: lattice_precision(6, 9, 4),
        lambda: lattice_precision(6, 9, 8, 0.6),
        lambda: delaunay_precision(80),
        lambda: delaunay_precision(80, rho=0.7),
    ],
)
def test_matvec_and_quad_match_dense(make_q):
    q = make_q()
    qd = q.toarray().astype(float)
    spec, arrs = graph.build(q, deflate=8)
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    rng = np.random.default_rng(0)
    v = rng.standard_normal((3, spec.n))
    out = np.asarray(graph.matvec(fixed, jnp.asarray(v, jnp.float32)))
    np.testing.assert_allclose(out, v @ qd.T, atol=1e-4)
    qf = float(graph.quad_form(fixed, jnp.asarray(v[0], jnp.float32)))
    assert qf == pytest.approx(v[0] @ qd @ v[0], rel=1e-4)


def test_build_rejects_invalid_precisions():
    # positive off-diagonal: not a CAR form
    bad = np.array([[2.0, 1.0], [1.0, 2.0]])
    with pytest.raises(ValueError, match='off-diagonal'):
        graph.build(bad)
    # off-diagonal mass exceeding the diagonal
    bad2 = np.array([[0.5, -1.0], [-1.0, 0.5]])
    with pytest.raises(ValueError, match='exceeds'):
        graph.build(bad2)
    # asymmetric (one-sided adjacency): matvec/noise/banded panels would
    # silently disagree about which operator they represent
    bad3 = np.array([
        [2.0, -1.0, 0.0],
        [0.0, 2.0, -1.0],
        [0.0, 0.0, 2.0],
    ])
    with pytest.raises(ValueError, match='symmetric'):
        graph.build(bad3)


@pytest.mark.parametrize('rho', [1.0, 0.7])
def test_noise_covariance(rho):
    """E[(B eps)(B eps)'] must equal Q, incl. the proper-CAR surplus."""
    q = delaunay_precision(20, seed=3, rho=rho)
    qd = q.toarray().astype(float)
    spec, arrs = graph.build(q, deflate=0)
    assert spec.has_surplus == (rho < 1.0)
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    keys = jax.random.split(jax.random.key(0), 60_000)
    draws = np.asarray(
        jax.vmap(lambda k: graph.noise(spec, fixed, k))(keys), np.float64
    )
    cov = draws.T @ draws / draws.shape[0]
    np.testing.assert_allclose(cov, qd, atol=0.12 * max(1, qd.max()))


@pytest.mark.parametrize('deflate', [0, 32])
def test_cg_solves_irregular_system(deflate):
    q = delaunay_precision(120, seed=1)
    qd = q.toarray().astype(float)
    spec, arrs = graph.build(q, deflate=deflate)
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    rng = np.random.default_rng(1)
    omega = jnp.asarray(rng.uniform(0.05, 0.25, spec.n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((2, spec.n)), jnp.float32)
    sol = np.asarray(
        graph.cg_solve(
            spec, fixed, rhs, jnp.zeros_like(rhs), omega,
            jnp.asarray(3.7, jnp.float32), 60,
        )
    )
    lam = 3.7 * qd + np.diag(np.asarray(omega, np.float64))
    expected = np.linalg.solve(lam, np.asarray(rhs, np.float64).T).T
    np.testing.assert_allclose(sol, expected, atol=5e-3)


def test_deflation_beats_plain_jacobi_at_large_tau():
    """The rank-m bottom eigenbasis is what makes a fixed small budget
    viable when tau dominates omega (the smooth modes Jacobi stalls on).
    """
    q = lattice_precision(50, 50, 8)
    qd = q.toarray().astype(np.float64)
    rng = np.random.default_rng(1)
    omega_np = rng.uniform(0.02, 0.25, 2500)
    omega = jnp.asarray(omega_np, jnp.float32)
    rhs_np = rng.standard_normal((2, 2500))
    rhs = jnp.asarray(rhs_np, jnp.float32)
    tau = jnp.asarray(40.0, jnp.float32)
    lam = 40.0 * qd + np.diag(omega_np)
    expected = np.linalg.solve(lam, rhs_np.T).T

    def rel_err(deflate):
        spec, arrs = graph.build(q, deflate=deflate)
        fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
        sol = np.asarray(
            graph.cg_solve(
                spec, fixed, rhs, jnp.zeros_like(rhs), omega, tau, 16
            ),
            np.float64,
        )
        return np.linalg.norm(sol - expected) / np.linalg.norm(expected)

    # measured calibration: ~7e-1 plain vs ~5e-5 deflated at 16 iters
    assert rel_err(0) > 0.05
    assert rel_err(64) < 1e-3


def test_banded_layout_enabled_when_bandwidth_fits():
    # 50x50 lattice: natural bandwidth 50 -> one 128-tile covers it
    spec, _ = graph.build(lattice_precision(50, 50, 8), deflate=0)
    assert spec.block == 128 and spec.n_pad % 128 == 0
    # too few blocks for a tridiagonal structure -> ELL only
    spec_small, _ = graph.build(delaunay_precision(120, seed=1), deflate=0)
    assert spec_small.block == 0
    # explicit opt-out
    spec_off, arrs_off = graph.build(
        lattice_precision(50, 50, 8), deflate=0, block=0
    )
    assert spec_off.block == 0 and 'gr_bd_diag' not in arrs_off


def test_banded_matvec_matches_dense():
    q = delaunay_precision(400, seed=4)
    qd = q.toarray().astype(np.float64)
    spec, arrs = graph.build(q, deflate=0, block=256)
    assert spec.block == 256
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    perm = arrs['gr_perm']
    rng = np.random.default_rng(3)
    v = rng.standard_normal((2, spec.n))
    v_pad = np.zeros((2, spec.n_pad), np.float32)
    v_pad[:, : spec.n] = v[:, perm]
    out_p = np.asarray(
        graph.banded_matvec(spec, fixed, jnp.asarray(v_pad))
    )
    # un-permute and compare against the dense product
    out = out_p[:, : spec.n][:, arrs['gr_iperm']]
    np.testing.assert_allclose(out, v @ qd.T, atol=1e-4)
    # the padded tail rows of Q are zero: output there must be zero
    np.testing.assert_allclose(out_p[:, spec.n:], 0.0, atol=1e-6)


def test_banded_forced_block_validation():
    q = lattice_precision(50, 50, 8)
    with pytest.raises(ValueError, match='multiple of 128'):
        graph.build(q, block=100)
    with pytest.raises(ValueError, match='covering the'):
        # bandwidth of the RCM'd Delaunay graph exceeds 0 < 128? use a
        # lattice whose natural bandwidth (50) exceeds a too-small tile
        graph.build(lattice_precision(200, 200, 8), block=128)


@pytest.mark.parametrize('deflate', [0, 32])
def test_banded_cg_matches_ell_cg(deflate):
    """The RCM-permuted block-tridiagonal CG must return the ELL CG's
    solution (same system, same budget; they differ only in rounding)."""
    q = delaunay_precision(500, seed=6)
    rng = np.random.default_rng(4)
    omega = jnp.asarray(rng.uniform(0.05, 0.3, 500), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((3, 500)), jnp.float32)
    tau = jnp.asarray(2.3, jnp.float32)

    def solve(block):
        spec, arrs = graph.build(q, deflate=deflate, block=block)
        fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
        return spec, np.asarray(
            graph.cg_solve(
                spec, fixed, rhs, jnp.zeros_like(rhs), omega, tau, 48
            )
        )

    spec_b, sol_banded = solve(256)
    spec_e, sol_ell = solve(0)
    assert spec_b.block == 256 and spec_e.block == 0
    np.testing.assert_allclose(sol_banded, sol_ell, atol=2e-4)


def test_constrained_draw_sums_to_zero():
    q = delaunay_precision(100, seed=2)
    spec, arrs = graph.build(q, deflate=16)
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    rng = np.random.default_rng(2)
    omega = jnp.asarray(rng.uniform(0.05, 0.25, spec.n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(spec.n), jnp.float32)
    warm = jnp.zeros((2, spec.n), jnp.float32)
    eta, warm2 = graph.constrained_mvnorm(
        spec, fixed, jax.random.key(0), b, omega,
        jnp.asarray(2.0, jnp.float32), warm, 60,
    )
    assert abs(float(eta.sum())) < 1e-3
    assert warm2.shape == (2, spec.n)


def test_sampler_with_graph_solver_irregular():
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    # dataset whose spatial graph is NOT a lattice
    _, W, X, y, *_ = make_data(
        n=150, ns=100, p=3, q=2, min_v=2, max_v=6, random_state=10
    )
    q = delaunay_precision(150, seed=5)
    s = LogitICARGibbs(
        q, W, X, y, random_state=1, solver='graph',
        pg_method='devroye',
    )
    assert s.solver == 'graph'
    assert s.graph.n == 150 and s.graph.deflate == 64
    post = s.sample(20, burnin=4, chains=2, progressbar=False)
    assert post['beta'].shape == (2, 16, 3)
    assert np.isfinite(np.asarray(post['beta'])).all()
    # the in-run guardrail's diagnostic is small at the default budget
    assert s.solver_residual() < 1e-2

    # starved budget trips the guardrail (no deflation, one iteration)
    bad = LogitICARGibbs(
        q, W, X, y, random_state=1, solver='graph', cg_iters=1,
        graph_rank=0, pg_method='devroye',
    )
    with pytest.raises(RuntimeError, match='did not converge'):
        bad.init_carry(chains=1)

    # shape mismatch between Q and X raises
    with pytest.raises(ValueError, match='sites'):
        LogitICARGibbs(
            delaunay_precision(120), W, X, y, random_state=1,
            solver='graph', pg_method='devroye',
        )


def test_sparse_q_auto_selects_graph_solver():
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.models.logit import _GRAPH_AUTO_THRESHOLD
    from occuspytial_tpu.utils import make_data

    n = _GRAPH_AUTO_THRESHOLD
    rows = 64
    q = lattice_precision(rows, n // rows, 8)
    _, W, X, y, *_ = make_data(
        n=n, ns=40, p=2, q=2, min_v=2, max_v=4, random_state=0
    )
    s = LogitICARGibbs(q, W, X, y, random_state=0, pg_method='devroye')
    assert s.solver == 'graph'
    assert 'gr_idx' in s.fixed and 'Q' not in s.fixed
