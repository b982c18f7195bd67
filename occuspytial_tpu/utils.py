"""Synthetic-data simulation and RNG helpers.

API-parity port of reference utils.py (``get_generator``,
``rand_precision_mat``, ``make_data``) with the libpysal lattice-weights
dependency replaced by the direct stencil assembly in
:mod:`occuspytial_tpu.ops.icar`. Simulation is host-side numpy (it runs
once, outside the hot loop); the samplers themselves consume the output via
:func:`occuspytial_tpu.data.pack_detection_data`.
"""

import numpy as np
from scipy.linalg import pinvh

from .ops.icar import lattice_precision


def get_generator(random_state=None):
    """numpy Generator over SFC64 (reference utils.py:7-35)."""
    return np.random.default_rng(np.random.SFC64(random_state))


def rand_precision_mat(lat_row, lat_col, max_neighbors=8, rho=1):
    """Random spatial precision matrix from a rectangular lattice.

    Same contract as reference utils.py:38-103: Q = diag(rowsums) - rho*A
    over a rook (4) or queen (8) adjacency; returns scipy COO.
    """
    return lattice_precision(lat_row, lat_col, max_neighbors, rho)


def make_data(
    n=150,
    min_v=None,
    max_v=None,
    ns=None,
    p=3,
    q=3,
    tau_range=(0.25, 1.5),
    max_neighbors=8,
    random_state=None,
):
    """Generate a random single-season occupancy dataset.

    Mirrors reference utils.py:106-294, including every ValueError branch
    and the returned tuple ``(Q, W, X, y, alpha, beta, tau, z)`` where W/y
    are dicts keyed by surveyed-site index.
    """
    rng = get_generator(random_state)

    if n < 150:
        raise ValueError('n cant be lower than 150')

    if min_v is None:
        min_v = 2
    elif min_v < 1:
        raise ValueError('min_v needs to be at least 1')

    if max_v is None:
        max_v = n // 10
    elif max_v < 2:
        raise ValueError('max_v is too small')
    elif max_v > n:
        raise ValueError('max_v cant be more than n')

    if ns is None:
        ns = n // 2
    elif ns == 0:
        raise ValueError('ns should be positive')
    elif ns > n:
        raise ValueError('ns cant be more than n')

    surveyed_sites = rng.choice(range(n), size=ns, replace=False)
    visits_per_site = rng.integers(min_v, max_v, size=ns, endpoint=True)

    alpha = rng.standard_normal(q)
    beta = rng.standard_normal(p)
    tau = rng.uniform(*tau_range)

    factors = [i for i in range(3, n) if (n % i) == 0]
    row = rng.choice(factors)
    col = n // row

    Q = rand_precision_mat(row, col, max_neighbors=max_neighbors).astype(float)
    # reference utils.py:277 uses cond=1e-5 (old scipy: relative cutoff)
    q_pinv = pinvh(Q.toarray(), rtol=1e-5)
    eta = rng.multivariate_normal(np.zeros(n), q_pinv / tau, method='eigh')

    X = rng.uniform(-2, 2, n * p).reshape(n, -1)
    X[:, 0] = 1

    psi = np.exp(-np.logaddexp(0, -X @ beta + eta))
    z = rng.binomial(1, p=psi, size=n)

    W, y = {}, {}
    for i, j in zip(surveyed_sites, visits_per_site):
        _W = rng.uniform(-2, 2, size=j * q).reshape(j, -1)
        _W[:, 0] = 1
        d = np.exp(-np.logaddexp(0, -_W @ alpha))
        W[int(i)] = _W
        y[int(i)] = rng.binomial(1, z[i] * d)

    return Q, W, X, y, alpha, beta, tau, z
