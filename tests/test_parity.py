"""Statistical parity: TPU sampler vs reference-equivalent CPU floor.

BASELINE.md's numerical acceptance is posterior-mean agreement with the
reference algorithm within Monte-Carlo tolerance. The reference itself
cannot run in this image, so the comparison target is the faithful numpy
implementation of its algorithm (benchmarks/reference_floor.py) — same
update order, same conditionals, independent code path.

The tolerance is a two-sample z-test per scalar parameter: the absolute
difference in posterior means must be below ``Z * sqrt(mcse_a^2 +
mcse_b^2)`` with a generous Z (MCMC mean estimates are noisy and the two
samplers use unrelated RNG streams).
"""

import numpy as np
import pytest

from benchmarks.reference_floor import (
    NumpyLogitICAR,
    NumpyLogitRSR,
    NumpyProbitRSR,
)
from occuspytial_tpu import (
    LogitICARGibbs,
    LogitRSRGibbs,
    ProbitRSRGibbs,
)
from occuspytial_tpu import diagnostics as dg
from occuspytial_tpu.utils import make_data

SIZE, BURNIN, CHAINS = 1500, 500, 4
Z_TOL = 6.0


@pytest.fixture(scope='module')
def dataset():
    return make_data(
        n=150, ns=100, p=3, q=2, min_v=2, max_v=10, random_state=10
    )


def _mean_and_mcse(arr):
    """arr: (chains, draws) -> (mean, mcse of the mean)."""
    ess = dg.ess_mean(arr)
    if not np.isfinite(ess) or ess < 10:
        ess = 10.0
    return arr.mean(), arr.std(ddof=1) / np.sqrt(ess)


@pytest.mark.slow
def test_logit_icar_posterior_means_match_floor(dataset):
    Q, W, X, y, alpha, beta, tau, z = dataset

    floor = NumpyLogitICAR(Q, W, X, y, random_state=3)
    out_floor = floor.run(SIZE, burnin=BURNIN)

    s = LogitICARGibbs(Q, W, X, y, random_state=4)
    post = s.sample(SIZE, burnin=BURNIN, chains=CHAINS, progressbar=False)

    _assert_mean_parity(post, out_floor)


def _assert_mean_parity(post, out_floor, floor_tol=0.05):
    for name, dim in (('alpha', 2), ('beta', 3)):
        for j in range(dim):
            ours = post[name][:, :, j]
            theirs = out_floor[name][None, :, j]
            m1, se1 = _mean_and_mcse(ours)
            m2, se2 = _mean_and_mcse(theirs)
            tol = Z_TOL * np.sqrt(se1**2 + se2**2)
            assert abs(m1 - m2) < max(tol, floor_tol), (
                f'{name}[{j}]: tpu {m1:.4f} vs floor {m2:.4f} '
                f'(tol {tol:.4f})'
            )


@pytest.mark.slow
def test_logit_icar_graph_banded_posterior_means_match_floor(dataset):
    """The matrix-free graph path (block-tridiagonal MXU layout) must
    hit the same posterior as the reference algorithm — this pins the
    banded CG statistically, not just against the ELL CG's solution."""
    import scipy.sparse as sps

    Q, W, X, y, *_ = dataset

    floor = NumpyLogitICAR(Q, W, X, y, random_state=3)
    out_floor = floor.run(SIZE, burnin=BURNIN)

    s = LogitICARGibbs(
        sps.csr_matrix(Q), W, X, y, random_state=4, solver='graph'
    )
    assert s.graph.block > 0, 'banded layout should engage at n=150'
    post = s.sample(SIZE, burnin=BURNIN, chains=CHAINS, progressbar=False)
    _assert_mean_parity(post, out_floor)


@pytest.mark.slow
def test_logit_rsr_posterior_means_match_floor(dataset):
    Q, W, X, y, *_ = dataset

    floor = NumpyLogitRSR(Q, W, X, y, random_state=3, q=15)
    out_floor = floor.run(SIZE, burnin=BURNIN)

    s = LogitRSRGibbs(Q, W, X, y, random_state=4, q=15)
    post = s.sample(SIZE, burnin=BURNIN, chains=CHAINS, progressbar=False)
    _assert_mean_parity(post, out_floor)


@pytest.mark.slow
def test_float64_lane_bounds_f32_bias():
    """End-to-end float64 run vs float32 on a headline-sized model
    (VERDICT r1 #6): bounds the bias of the f32 hot path and its spot
    clamps (quad-form clamp models/logit.py, saturating ndtri clamp
    ops/truncnorm.py) at n=1000. The two lanes use different RNG bit
    consumption, so agreement is a per-parameter z-test on posterior
    means, not a bitwise check."""
    from jax import enable_x64

    Qb, Wb, Xb, yb = make_data(
        n=1000, ns=500, p=3, q=3, min_v=2, max_v=10, random_state=7
    )[:4]
    size, burnin, chains = 700, 250, 2

    with enable_x64():
        s64 = LogitICARGibbs(
            Qb, Wb, Xb, yb, random_state=4, dtype='float64',
        )
        post64 = s64.sample(
            size, burnin=burnin, chains=chains, progressbar=False
        )
        assert post64['beta'].dtype == np.float64
    s32 = LogitICARGibbs(Qb, Wb, Xb, yb, random_state=4)
    post32 = s32.sample(
        size, burnin=burnin, chains=chains, progressbar=False
    )

    for name, dim in (('alpha', 3), ('beta', 3), ('tau', 0)):
        for j in range(max(dim, 1)):
            a = (post64[name][:, :, j] if dim else post64[name])
            b = (post32[name][:, :, j] if dim else post32[name])
            m1, se1 = _mean_and_mcse(np.asarray(a, np.float64))
            m2, se2 = _mean_and_mcse(np.asarray(b, np.float64))
            tol = Z_TOL * np.sqrt(se1**2 + se2**2)
            assert abs(m1 - m2) < max(tol, 0.05 * max(1.0, abs(m1))), (
                f'{name}[{j}]: f64 {m1:.4f} vs f32 {m2:.4f} '
                f'(tol {tol:.4f})'
            )


@pytest.mark.slow
def test_probit_icar_posterior_means_match_floor(dataset):
    """ProbitICARGibbs parity vs its independent CPU floor (VERDICT r2
    #3/#6).

    ``NumpyProbitICAR`` (benchmarks/reference_floor.py) implements the
    reference's probit algorithm family (gibbs/probit.py:27-270) with a
    full-rank constrained ICAR eta conditional — an independent numpy
    code path. Every eta regime of the rebuild must land on the same
    posterior: the collapsed (beta, eta, eps) ladder (the benchmark's
    config 2), the reference-ordered kernel, and both iterative solvers
    (stencil / banded graph CG). This replaces the self-referential
    spectral cross-check as the family's only statistical evidence.
    """
    import scipy.sparse as sps

    from occuspytial_tpu import ProbitICARGibbs
    from occuspytial_tpu.ops.icar import lattice_precision
    from benchmarks.reference_floor import NumpyProbitICAR

    Q, W, X, y, *_ = dataset

    floor = NumpyProbitICAR(Q, W, X, y, random_state=3)
    out_floor = floor.run(SIZE, burnin=BURNIN)

    # recover the dataset's lattice for the stencil regime (make_data
    # contract: Q is a queen lattice over a random factorization of n)
    qs = sps.csr_matrix(Q)
    n = X.shape[0]
    lat = next(
        (r_, n // r_, 8)
        for r_ in range(3, n + 1)
        if n % r_ == 0 and (
            sps.csr_matrix(lattice_precision(r_, n // r_, 8)) != qs
        ).nnz == 0
    )

    variants = [
        ('collapsed', dict(collapsed=True)),
        ('reference-ordered', dict(collapsed=False)),
        ('stencil', dict(lattice=lat)),
        ('graph', dict(solver='graph')),
    ]
    for label, kw in variants:
        q_in = sps.csr_matrix(Q) if kw.get('solver') == 'graph' else Q
        s = ProbitICARGibbs(q_in, W, X, y, random_state=4, **kw)
        post = s.sample(
            SIZE, burnin=BURNIN, chains=CHAINS, progressbar=False
        )
        try:
            _assert_mean_parity(post, out_floor, floor_tol=0.08)
        except AssertionError as exc:
            raise AssertionError(f'variant {label}: {exc}') from exc


@pytest.mark.slow
def test_probit_rsr_posterior_means_match_floor(dataset):
    """Probit parity vs the reference algorithm's floor.

    The reference marks its probit sampler xfail, so this asserts against
    the model math (the floor implements the reference's conditionals
    independently in numpy) — both the collapsed ladder and the
    reference-ordered kernel must land on the same posterior.
    """
    Q, W, X, y, *_ = dataset

    floor = NumpyProbitRSR(Q, W, X, y, random_state=3, q=15)
    out_floor = floor.run(SIZE, burnin=BURNIN)

    for collapsed in (True, False):
        s = ProbitRSRGibbs(
            Q, W, X, y, random_state=4, q=15, collapsed=collapsed,
        )
        post = s.sample(
            SIZE, burnin=BURNIN, chains=CHAINS, progressbar=False
        )
        _assert_mean_parity(post, out_floor, floor_tol=0.08)
