"""Checkpoint/resume tests: carry save/load and exact continuation."""

import numpy as np

from occuspytial_tpu import LogitRSRGibbs
from occuspytial_tpu.utils import make_data

Q, W, X, y, *_ = make_data(n=150, ns=100, p=3, q=2, random_state=10)


def test_resume_is_exact_continuation(tmp_path):
    s = LogitRSRGibbs(Q, W, X, y, random_state=10)

    # one uninterrupted run
    full = s.sample(64, chains=2, progressbar=False)

    # the same run split in two, checkpointed to disk in between
    first = s.sample(32, chains=2, progressbar=False)
    path = tmp_path / 'carry.npz'
    s.save_carry(path, s.final_carry)
    carry = s.load_carry(path)
    second = s.sample(32, chains=2, progressbar=False, resume_from=carry)

    np.testing.assert_allclose(
        np.concatenate([first['alpha'], second['alpha']], axis=1),
        full['alpha'], rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.concatenate([first['tau'], second['tau']], axis=1),
        full['tau'], rtol=1e-5, atol=1e-6,
    )


def test_init_carry_with_start():
    s = LogitRSRGibbs(Q, W, X, y, random_state=10)
    start = {
        'alpha': np.ones(2), 'beta': np.zeros(3), 'tau': 2.0,
        'eta': np.zeros(s.q_dim),
    }
    keys, states = s.init_carry(chains=3, start=start)
    assert states['alpha'].shape == (3, 2)
    np.testing.assert_allclose(np.asarray(states['alpha']), 1.0)


def test_resume_probit_iterative_carries_warm_start(tmp_path):
    """The probit graph solver's CG warm-start rides the carry: a
    checkpointed split run must continue the uninterrupted run exactly
    (warm starts affect only solver convergence, but a dropped or
    mis-restored eta_warm key would break the carry pytree contract)."""
    import scipy.sparse as sps

    from occuspytial_tpu import ProbitICARGibbs

    s = ProbitICARGibbs(
        sps.csr_matrix(Q), W, X, y, random_state=3, solver='graph'
    )
    full = s.sample(48, chains=2, progressbar=False)

    first = s.sample(24, chains=2, progressbar=False)
    path = tmp_path / 'carry_probit.npz'
    s.save_carry(path, s.final_carry)
    carry = s.load_carry(path)
    assert 'eta_warm' in carry[1]
    second = s.sample(24, chains=2, progressbar=False, resume_from=carry)

    np.testing.assert_allclose(
        np.concatenate([first['beta'], second['beta']], axis=1),
        full['beta'], rtol=1e-5, atol=1e-6,
    )
