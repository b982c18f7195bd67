"""Lattice precision / spectral setup tests (mirrors reference
tests/test_utils.py lattice assertions, without libpysal)."""

import numpy as np
import pytest

from occuspytial_tpu.ops.icar import (
    icar_sqrt_factor,
    lattice_precision,
    moran_basis,
    psd_sqrt_factor,
    verify_spatial_precision,
)


def test_lattice_neighbor_counts():
    mat = lattice_precision(2, 4, max_neighbors=4)
    # interior sites of a 2x4 rook lattice have 3 neighbors
    assert mat.diagonal().max() == 3

    mat = lattice_precision(2, 4, max_neighbors=8)
    assert mat.diagonal().max() == 5

    with pytest.raises(ValueError, match='neighbors should be one of'):
        lattice_precision(2, 4, max_neighbors=9)


def test_lattice_rank():
    # ICAR precision (rho=1) is singular with rank n-1
    mat = lattice_precision(2, 4, max_neighbors=8)
    assert np.linalg.matrix_rank(mat.toarray()) == 7
    # proper CAR (rho<1) is full rank
    assert np.linalg.matrix_rank(
        lattice_precision(2, 4, 8, rho=0.5).toarray()
    ) == 8
    assert np.linalg.matrix_rank(
        lattice_precision(2, 4, 8, rho=0).toarray()
    ) == 8


def test_lattice_row_sums_zero():
    q = lattice_precision(5, 6, max_neighbors=4).toarray()
    np.testing.assert_array_equal(q.sum(axis=1), np.zeros(30))
    np.testing.assert_array_equal(q, q.T)


def test_verify_spatial_precision():
    q = lattice_precision(5, 6, max_neighbors=8)
    verify_spatial_precision(q)  # singular: passes
    rng = np.random.default_rng(0)
    a = rng.normal(size=(30, 30))
    with pytest.raises(ValueError, match='must be singular'):
        verify_spatial_precision(a @ a.T + 30 * np.eye(30))


def test_sqrt_factors():
    q = lattice_precision(4, 5, max_neighbors=4).toarray().astype(float)
    b = icar_sqrt_factor(q)
    assert b.shape == (20, 19)
    np.testing.assert_allclose(b @ b.T, q, atol=1e-8)

    spd = q + np.eye(20)
    e = psd_sqrt_factor(spd)
    np.testing.assert_allclose(e @ e.T, spd, atol=1e-8)


def test_moran_basis_properties():
    rng = np.random.default_rng(1)
    n = 30
    q = lattice_precision(5, 6, max_neighbors=4).astype(float)
    x = np.column_stack([np.ones(n), rng.normal(size=(n, 2))])

    k, q_rsr = moran_basis(x, q, r=0.5)
    qd = k.shape[1]
    assert 0 < qd < n
    # basis columns are orthonormal eigenvectors
    np.testing.assert_allclose(k.T @ k, np.eye(qd), atol=1e-10)
    np.testing.assert_allclose(q_rsr, k.T @ q.toarray() @ k, atol=1e-10)

    # explicit q overrides the threshold
    k2, q2 = moran_basis(x, q, num_eigs=4)
    assert k2.shape == (n, 4) and q2.shape == (4, 4)

    with pytest.raises(ValueError, match='Threshold value needs to be in'):
        moran_basis(x, q, r=1.5)


def test_moran_basis_lanczos_matches_dense():
    """The matrix-free Lanczos Moran basis must span the same subspace
    as the dense eigh path (compared via the rotation-invariant
    projector K K' and the spectrum of Q_rsr)."""
    import scipy.sparse as sps

    from occuspytial_tpu.ops.icar import _moran_basis_lanczos

    rng = np.random.default_rng(3)
    q = lattice_precision(20, 20, 8)
    x = rng.uniform(-2, 2, (400, 3))
    x[:, 0] = 1

    k_d, qr_d = moran_basis(x, q.toarray(), num_eigs=12)
    xtx_inv_xt = np.linalg.solve(x.T @ x, x.T)
    k_l, qr_l = _moran_basis_lanczos(
        x, sps.csr_matrix(q), 0.5, 12, xtx_inv_xt
    )
    assert k_l.shape == k_d.shape == (400, 12)
    np.testing.assert_allclose(k_l @ k_l.T, k_d @ k_d.T, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.eigvalsh(qr_l), np.linalg.eigvalsh(qr_d), atol=1e-8
    )

    # threshold mode: adaptive block must find every eigenvalue >= r
    k_t, _ = _moran_basis_lanczos(
        x, sps.csr_matrix(q), 0.5, None, xtx_inv_xt
    )
    k_ref, _ = moran_basis(x, q.toarray(), r=0.5)
    assert k_t.shape == k_ref.shape
    np.testing.assert_allclose(k_t @ k_t.T, k_ref @ k_ref.T, atol=1e-6)


def test_rsr_samplers_large_sparse_q():
    """RSR construction at >= the Lanczos threshold with a SPARSE Q:
    no dense Q is materialized and both RSR samplers run (the reference
    RSR needs a dense eigendecomposition, capping it at small n)."""
    import scipy.sparse as sps

    from occuspytial_tpu import LogitRSRGibbs, ProbitRSRGibbs
    from occuspytial_tpu.ops.icar import _MORAN_LANCZOS_THRESHOLD
    from occuspytial_tpu.utils import make_data

    rows = 64
    n = _MORAN_LANCZOS_THRESHOLD
    assert rows * (n // rows) == n
    q = sps.csr_matrix(lattice_precision(rows, n // rows, 8))
    _, W, X, y, *_ = make_data(
        n=n, ns=60, p=3, q=2, min_v=2, max_v=4, random_state=0
    )

    for cls in (LogitRSRGibbs, ProbitRSRGibbs):
        kw = {'pg_method': 'devroye'} if cls is LogitRSRGibbs else {}
        s = cls(q, W, X, y, random_state=0, q=24, **kw)
        assert 'Q' not in s.fixed, 'dense Q must not be materialized'
        assert s.q_dim == 24
        post = s.sample(8, burnin=2, chains=2, progressbar=False)
        assert np.isfinite(np.asarray(post['beta'])).all()
