"""In-run solver health monitoring (VERDICT r3 next-round #5).

The reference raises on MINRES non-convergence on EVERY eta draw
(reference gibbs/logit.py:91-92). The rebuild's fixed-budget CG paths
instead carry each solve's final relative residual through the scan
(``state['solver_resid']``, a running max — ops/cg.py:pcg,
models/base.py:_track_resid) and check it against ``solver_check_tol``
when ``sample()`` returns. These tests pin the contract the cold-start
guardrail alone cannot: a starved budget is detected MID-RUN, from the
in-loop solves themselves.
"""

import pytest

from occuspytial_tpu import LogitICARGibbs, ProbitICARGibbs
from occuspytial_tpu.ops.icar import lattice_precision
from occuspytial_tpu.utils import make_data


@pytest.fixture(scope='module')
def dataset():
    Q, W, X, y, *_ = make_data(n=256, ns=150, p=3, q=2, random_state=5)
    return Q, W, X, y


@pytest.fixture(scope='module')
def lattice_dataset():
    # 16x16 queen lattice matching a 256-site survey design
    Q, W, X, y, *_ = make_data(n=256, ns=150, p=3, q=2, random_state=5)
    Qs = lattice_precision(16, 16, 8)
    return Qs, W, X, y


def test_healthy_budget_reports_small_residual(dataset):
    Q, W, X, y = dataset
    s = LogitICARGibbs(Q, W, X, y, random_state=5, solver='cg')
    s.sample(64, burnin=16, chains=2, progressbar=False)
    # the monitor ran and the default budget converges comfortably
    assert hasattr(s, 'last_solver_resid')
    assert s.last_solver_resid < s.solver_check_tol


def test_starved_budget_detected_mid_run(dataset):
    """A starved CG budget raises from the IN-RUN monitor, not only the
    cold-start guardrail (bypassed here)."""
    Q, W, X, y = dataset
    s = LogitICARGibbs(Q, W, X, y, random_state=5, solver='cg',
                       cg_iters=1)
    s._solver_checked = True  # disable the cold-start check
    with pytest.raises(RuntimeError, match='during the run'):
        s.sample(64, burnin=16, chains=2, progressbar=False)
    # the measured residual is preserved for inspection, and the run
    # stays resumable
    assert s.last_solver_resid > s.solver_check_tol
    assert s.final_carry is not None


def test_bypass_with_none_tol(dataset):
    Q, W, X, y = dataset
    s = LogitICARGibbs(Q, W, X, y, random_state=5, solver='cg',
                       cg_iters=1, solver_check_tol=None)
    post = s.sample(32, burnin=8, chains=2, progressbar=False)
    assert post['beta'].shape == (2, 24, 3)


def test_stencil_path_monitored(lattice_dataset):
    Qs, W, X, y = lattice_dataset
    s = LogitICARGibbs(Qs, W, X, y, random_state=5,
                       lattice=(16, 16, 8))
    s.sample(48, burnin=16, chains=2, progressbar=False)
    assert s.last_solver_resid < s.solver_check_tol


def test_graph_path_starved_detected(lattice_dataset):
    import scipy.sparse as sps

    Qs, W, X, y = lattice_dataset
    s = LogitICARGibbs(sps.csr_matrix(Qs), W, X, y, random_state=5,
                       solver='graph', cg_iters=1, graph_rank=0)
    s._solver_checked = True
    with pytest.raises(RuntimeError, match='during the run'):
        s.sample(48, burnin=16, chains=2, progressbar=False)


def test_probit_iterative_path_monitored(lattice_dataset):
    Qs, W, X, y = lattice_dataset
    s = ProbitICARGibbs(Qs, W, X, y, random_state=5,
                        lattice=(16, 16, 8))
    s.sample(48, burnin=16, chains=2, progressbar=False)
    assert s.last_solver_resid < s.solver_check_tol


def test_residual_max_accumulates_across_resume(dataset):
    """The running max rides the carry: resuming continues accumulation
    instead of resetting."""
    Q, W, X, y = dataset
    s = LogitICARGibbs(Q, W, X, y, random_state=5, solver='cg')
    s.sample(32, burnin=8, chains=2, progressbar=False)
    first = s.last_solver_resid
    s.sample(32, burnin=8, chains=2, progressbar=False,
             resume_from=s.final_carry)
    assert s.last_solver_resid >= first


def test_chol_solver_not_monitored(dataset):
    """The exact dense-Cholesky path has no fixed budget to starve; no
    monitor state is carried and sample() never raises."""
    Q, W, X, y = dataset
    s = LogitICARGibbs(Q, W, X, y, random_state=5, solver='chol')
    carry = s.init_carry(chains=2)
    assert 'solver_resid' not in carry[1]


def test_auto_graph_rank_policy():
    """Rank-scaled deflation: ~4% of sites, floored 64, capped 384
    (measured policy — see models/logit.py:auto_graph_rank)."""
    from occuspytial_tpu.models.logit import auto_graph_rank

    assert auto_graph_rank(256) == 64        # floor
    assert auto_graph_rank(2600) == 192      # ~5%, 64-rounded (130->192)
    assert auto_graph_rank(10000) == 512     # cap (10000 // 20 = 500)
    assert auto_graph_rank(100000) == 512    # cap


def test_explicit_graph_rank_zero_disables(dataset):
    import scipy.sparse as sps

    from occuspytial_tpu.ops.icar import lattice_precision

    Qs = sps.csr_matrix(lattice_precision(16, 16, 8))
    _, W, X, y = dataset
    s = LogitICARGibbs(Qs, W, X, y, random_state=5, solver='graph',
                       graph_rank=0, cg_iters=40)
    assert s.graph.deflate == 0
