"""ICAR precision-matrix construction and one-time spectral setup.

Host-side (numpy/scipy) helpers that run once at sampler construction, the
TPU analog of the reference's setup phase:

- ``lattice_precision`` replaces ``rand_precision_mat``'s dependency on
  libpysal's ``lat2SW`` (reference utils.py:38-103) with a direct
  rook/queen stencil assembly: Q = diag(rowsum(A)) - rho * A.
- ``icar_sqrt_factor`` mirrors the dense eigenfactor precomputation of
  ``_EtaICARPosterior.__init__`` (reference gibbs/logit.py:64-67): drop the
  null eigenvector of the singular ICAR precision and return
  B = U[:, 1:] * sqrt(s[1:]) so that B B' = Q.
- ``psd_sqrt_factor`` is the nonsingular analog used for the RSR-projected
  precision (reference gibbs/logit.py:317-320).
- ``moran_basis`` builds the Moran-operator eigenbasis used by the RSR
  samplers (reference gibbs/logit.py:415-447, duplicated in
  gibbs/probit.py:109-142).
- ``verify_spatial_precision`` mirrors the singularity check at reference
  gibbs/base.py:166-170.

Everything returns numpy arrays; samplers move results to device once.
"""

import numpy as np
import scipy.sparse as sps
from scipy.sparse.linalg import eigsh


def lattice_precision(lat_row, lat_col, max_neighbors=8, rho=1.0):
    """Spatial precision matrix of a rectangular lattice, as scipy COO.

    ``max_neighbors=4`` uses the rook criterion (N/S/E/W adjacency),
    ``max_neighbors=8`` the queen criterion (plus diagonals). ``rho=1``
    gives the singular Intrinsic Autoregressive precision. Matches the
    output contract of reference utils.py:38-103 without libpysal.
    """
    if max_neighbors == 8:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1)]
    elif max_neighbors == 4:
        offsets = [(-1, 0), (0, -1)]
    else:
        raise ValueError(
            'Maximum number of neighbors should be one of {4, 8}'
        )

    rows_idx, cols_idx = [], []
    grid = np.arange(lat_row * lat_col).reshape(lat_row, lat_col)
    for dr, dc in offsets:
        r0 = max(0, -dr)
        r1 = lat_row - max(0, dr)
        c0 = max(0, -dc)
        c1 = lat_col - max(0, dc)
        a = grid[r0:r1, c0:c1].ravel()
        b = grid[r0 + dr:r1 + dr, c0 + dc:c1 + dc].ravel()
        rows_idx.append(a)
        cols_idx.append(b)
    i = np.concatenate(rows_idx)
    j = np.concatenate(cols_idx)
    # symmetric adjacency
    data = np.ones(i.size * 2, dtype=np.int64)
    adj = sps.coo_matrix(
        (data, (np.concatenate([i, j]), np.concatenate([j, i]))),
        shape=(lat_row * lat_col, lat_row * lat_col),
    ).tocsr()
    deg = np.asarray(adj.sum(axis=1)).ravel()
    q = sps.diags(deg, dtype=adj.dtype) - rho * adj
    return q.tocoo()


def to_dense(q):
    """Dense float64 view of a sparse-or-dense precision matrix."""
    if sps.issparse(q):
        return np.asarray(q.todense(), dtype=np.float64)
    return np.asarray(q, dtype=np.float64)


def verify_spatial_precision(q):
    """Raise unless Q is singular (an ICAR precision must be).

    Mirrors reference gibbs/base.py:166-170 (smallest-eigenvalue shift-
    invert check).
    """
    qc = sps.csc_matrix(q) if not sps.issparse(q) else q.tocsc()
    eig = eigsh(
        qc.astype(np.float64), k=1, which='SA',
        return_eigenvectors=False, sigma=0.001,
    )
    if eig[0] >= 1e-4:
        raise ValueError('Spatial precision matrix Q must be singular.')


def icar_spectral(q_dense):
    """One-time eigendecomposition bundle for the singular ICAR precision.

    Returns ``(eigvals, eigvecs, sqrt_factor)`` where eigvals are clipped
    nonnegative and ``sqrt_factor = U[:, 1:] * sqrt(s[1:])`` drops the
    (theoretically zero) smallest eigenvalue, exactly as reference
    gibbs/logit.py:66-67. The full (s, U) pair additionally powers the
    spectral CG preconditioner (ops/cg.py).
    """
    s, u = np.linalg.eigh(q_dense)
    s = np.clip(s, 0.0, None)
    return s, u, u[:, 1:] * np.sqrt(s[1:])


def icar_sqrt_factor(q_dense):
    """Eigenfactor B (n, n-1) with B B' = Q for the singular ICAR precision."""
    return icar_spectral(q_dense)[2]


def psd_sqrt_factor(q_dense):
    """Eigenfactor E with E E' = Q for a (nonsingular) PSD precision.

    Mirrors reference gibbs/logit.py:317-320 (``u * sqrt(s)``).
    """
    s, u = np.linalg.eigh(q_dense)
    s = np.clip(s, 0.0, None)
    return u * np.sqrt(s)


#: above this size a *sparse* Q routes the Moran eigenbasis through
#: matrix-free Lanczos instead of a dense O(n^3) eigh — the reference's
#: RSR construction (gibbs/logit.py:415-447) is dense-only and cannot
#: reach these sizes at all
_MORAN_LANCZOS_THRESHOLD = 2048


def moran_basis(x, q, r=0.5, num_eigs=None):
    """Moran-operator eigenbasis for Reduced Spatial Regression.

    Builds P = I - X (X'X)^{-1} X', the Moran operator
    M = n * P' A P / sum(A) with A = -offdiag(Q), eigendecomposes it and
    keeps the top-``num_eigs`` eigenvectors (or those with eigenvalue >= r
    when ``num_eigs`` is None). Mirrors reference gibbs/logit.py:415-447.

    For a scipy.sparse ``q`` at large n the operator is never assembled:
    its matvec is ``c * P(A(P v))`` — two thin projector corrections and
    one sparse product — and the top eigenpairs come from Lanczos
    (``eigsh(which='LA')``), making RSR usable at 10k+ sites.

    Returns (K, q_rsr) where K is (n, q) and q_rsr = K' Q K.
    """
    import scipy.sparse as sps

    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if num_eigs is None and not 0 <= r <= 1:
        raise ValueError('Threshold value needs to be in [0, 1]')
    # P = I - X (X'X)^{-1} X' via least-squares projector
    xtx_inv_xt = np.linalg.solve(x.T @ x, x.T)

    if sps.issparse(q) and n >= _MORAN_LANCZOS_THRESHOLD:
        return _moran_basis_lanczos(x, q.tocsr(), r, num_eigs,
                                    xtx_inv_xt)

    p = -(x @ xtx_inv_xt)
    p[np.diag_indices_from(p)] += 1.0

    q_dense = to_dense(q)
    a = -q_dense.copy()
    np.fill_diagonal(a, 0.0)
    moran = n * (p.T @ a @ p) / a.sum()

    w, v = np.linalg.eigh(moran)
    if num_eigs:
        q_dim = int(num_eigs)
    else:
        q_dim = int((w >= r).sum())
        if not q_dim:
            raise ValueError(
                'The Moran Operator Matrix of the data has no positive '
                'eigenvalues. Set threshold to a lower value'
            )
    k = v[:, -q_dim:]
    q_rsr = k.T @ q_dense @ k
    return k, q_rsr


def _moran_basis_lanczos(x, q_csr, r, num_eigs, xtx_inv_xt):
    """Matrix-free top-q Moran eigenbasis (sparse Q, large n).

    Threshold mode (``num_eigs=None``) cannot know the basis size up
    front, so the Lanczos block doubles until the smallest retrieved
    eigenvalue falls below ``r`` (every eigenvalue >= r is then in
    hand), capped at n/4 — past that a reduced basis is no reduction.
    """
    import scipy.sparse as sps
    from scipy.sparse.linalg import LinearOperator, eigsh

    n = x.shape[0]
    a = -(q_csr - sps.diags(q_csr.diagonal())).tocsr()
    scale = n / a.sum()

    def pmat(v):
        return v - x @ (xtx_inv_xt @ v)

    op = LinearOperator(
        (n, n), matvec=lambda v: scale * pmat(a @ pmat(v)),
        dtype=np.float64,
    )

    if num_eigs:
        k_want = int(num_eigs)
        w, v = eigsh(op, k=k_want, which='LA')
        order = np.argsort(w)
        w, v = w[order], v[:, order]
    else:
        k_try = 64
        while True:
            k_try = min(k_try, n - 2)
            w, v = eigsh(op, k=k_try, which='LA')
            order = np.argsort(w)
            w, v = w[order], v[:, order]
            if w[0] < r or k_try >= max(n // 4, 64):
                break
            k_try *= 2
        keep = w >= r
        if not keep.any():
            raise ValueError(
                'The Moran Operator Matrix of the data has no positive '
                'eigenvalues. Set threshold to a lower value'
            )
        w, v = w[keep], v[:, keep]
    q_rsr = v.T @ (q_csr @ v)
    # symmetrize: the Lanczos basis is orthonormal to machine precision
    # only; Q_rsr feeds a Cholesky-style sqrt factor downstream
    return v, 0.5 * (q_rsr + q_rsr.T)
