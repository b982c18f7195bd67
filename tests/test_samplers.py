"""Behavioral contracts of the four Gibbs samplers.

Coverage model follows the reference's sampler test strategy (SURVEY.md
§4: shape contracts, seeded reproducibility, start overrides, input
validation) but exercises all four rebuild samplers — including the
probit family the reference marks xfail — plus rebuild-specific behavior
(copy-stream independence, alternate PG backends).
"""

import numpy as np
import pytest

from occuspytial_tpu import (
    LogitICARGibbs,
    LogitRSRGibbs,
    ProbitICARGibbs,
    ProbitRSRGibbs,
)
from occuspytial_tpu.models.base import GibbsBase
from occuspytial_tpu.utils import get_generator, make_data

# one shared 150-site dataset for every test in the module (n=150 is the
# simulator minimum; 90 surveyed sites, 1-8 visits, 3 occupancy and 2
# detection covariates)
Q, W, X, y = make_data(
    n=150, ns=90, p=3, q=2, min_v=1, max_v=8, random_state=42,
)[:4]


def alternate_hyperparams():
    """A full non-default hyperparameter set (every key differs from the
    defaults of models/base.py:_set_hyperparams)."""
    gen = get_generator(5)
    return {
        'tau_rate': 2.0,
        'tau_shape': 4.0,
        'a_mu': gen.standard_normal(2),
        'a_prec': 2.0 * np.eye(2),
        'b_mu': gen.standard_normal(3),
        'b_prec': 0.5 * np.eye(3),
    }


rng = get_generator(random_state=10)
hypers = alternate_hyperparams()

SAMPLERS = [LogitRSRGibbs, LogitICARGibbs, ProbitRSRGibbs, ProbitICARGibbs]

parametrized_samplers = pytest.mark.parametrize('sampler_class', SAMPLERS)


@parametrized_samplers
def test_gibbs_samplers(sampler_class):
    s = sampler_class(Q, W, X, y, random_state=10)
    samples = s.sample(5, chains=1, progressbar=False)
    assert samples['alpha'].shape == (1, 5, 2)
    assert samples['beta'].shape == (1, 5, 3)
    assert samples['tau'].shape == (1, 5)

    # reproducibility through random_state
    s = sampler_class(Q, W, X, y, random_state=10)
    samples2 = s.sample(5, chains=1, progressbar=False)
    assert np.allclose(samples2['alpha'], samples['alpha'])
    assert np.allclose(samples2['beta'], samples['beta'])
    assert np.allclose(samples2['tau'], samples['tau'])

    # copy: same model, new stream
    s_copy = s.copy()
    assert isinstance(s_copy, sampler_class)
    samples3 = s_copy.sample(5, chains=1, progressbar=False)
    assert not np.allclose(samples3['alpha'], samples['alpha'])

    with pytest.raises(ValueError, match='burnin value cannot be larger'):
        s.sample(10, burnin=11)
    samples = s.sample(10, burnin=3, chains=1, progressbar=False)
    assert samples['alpha'].shape == (1, 7, 2)
    assert samples['beta'].shape == (1, 7, 3)
    assert samples['tau'].shape == (1, 7)

    with pytest.raises(ValueError, match='chains must a positive integer'):
        s.sample(10, chains=0)
    samples = s.sample(5, chains=3, progressbar=False)
    assert samples['alpha'].shape == (3, 5, 2)
    assert samples['beta'].shape == (3, 5, 3)
    assert samples['tau'].shape == (3, 5)
    # chains differ from one another
    assert not np.allclose(samples['alpha'][0], samples['alpha'][1])


@parametrized_samplers
def test_sampler_start_parameter(sampler_class):
    kwargs = {}
    if sampler_class in (LogitRSRGibbs, ProbitRSRGibbs):
        kwargs['q'] = 10
    s = sampler_class(Q, W, X, y, random_state=10, **kwargs)
    eta_dim = getattr(s, 'q_dim', 150)
    samples = s.sample(5, chains=1, progressbar=False)

    start = {
        'alpha': rng.random(2),
        'beta': rng.random(3),
        'tau': 2.0,
        'eta': rng.random(eta_dim),
        'eps': rng.standard_normal(150),
    }
    samples2 = s.sample(5, chains=1, start=start, progressbar=False)
    assert not np.allclose(samples2['alpha'][0, 0], samples['alpha'][0, 0])
    assert not np.allclose(samples2['beta'][0, 0], samples['beta'][0, 0])
    assert not np.allclose(samples2['tau'][0, 0], samples['tau'][0, 0])


@pytest.mark.parametrize('sampler_class', [LogitRSRGibbs, ProbitRSRGibbs])
def test_rsr_sampler_threshold_parameter(sampler_class):
    with pytest.raises(ValueError, match='Threshold value needs to be in'):
        sampler_class(Q, W, X, y, r=1.1)


@parametrized_samplers
def test_hyperameter_input(sampler_class):
    s1 = sampler_class(Q, W, X, y)
    s2 = sampler_class(Q, W, X, y, hparams=hypers)

    assert float(s1.fixed['tau_shape']) != float(s2.fixed['tau_shape'])
    assert float(s1.fixed['tau_rate']) != float(s2.fixed['tau_rate'])
    assert not np.allclose(s1.fixed['a_mu'], s2.fixed['a_mu'])
    assert not np.allclose(s1.fixed['b_mu'], s2.fixed['b_mu'])
    assert not np.allclose(s1.fixed['a_prec'], s2.fixed['a_prec'])
    assert not np.allclose(s1.fixed['b_prec'], s2.fixed['b_prec'])


@pytest.fixture
def nonsingular_mat():
    from scipy.sparse import rand

    mat = rand(150, 150, density=0.9, format='csc', random_state=10)
    return (mat.T * mat).tocsc()


@parametrized_samplers
def test_nonsingular_spatial_precision_matrix(sampler_class, nonsingular_mat):
    with pytest.raises(ValueError, match='Spatial precision matrix Q must'):
        sampler_class(nonsingular_mat, W, X, y)


def test_sampler_with_no_step_method():
    class FakeSampler(GibbsBase):
        pass

    msg = 'FakeSampler must implement a `_step` method.'
    with pytest.raises(NotImplementedError, match=msg):
        FakeSampler(Q, W, X, y).sample(5, progressbar=False)


def test_progressbar_output(capfd):
    s = LogitRSRGibbs(Q, W, X, y, random_state=1)
    s.sample(10, chains=1)
    captured = capfd.readouterr()
    assert '10/10' in captured.err


def test_per_chain_progressbar_rows(capfd):
    """progressbar='per-chain' renders one positioned row per chain
    (reference gibbs/parallel.py:38-41), ticking in lockstep."""
    s = LogitRSRGibbs(Q, W, X, y, random_state=1)
    s.sample(10, chains=3, progressbar='per-chain')
    captured = capfd.readouterr()
    for i in range(3):
        assert f'chain {i}' in captured.err
    assert captured.err.count('10/10') >= 3


def test_turning_off_progressbar(capfd):
    s = LogitRSRGibbs(Q, W, X, y, random_state=1)
    s.sample(10, chains=1, progressbar=False)
    captured = capfd.readouterr()
    assert '10/10' not in captured.err


def test_pg_gamma_method_runs():
    s = LogitRSRGibbs(Q, W, X, y, random_state=3, pg_method='gamma')
    samples = s.sample(5, chains=1, progressbar=False)
    assert np.isfinite(samples['alpha']).all()


def test_successive_copies_get_distinct_streams():
    # regression (ADVICE r1): two copies of one sampler must not share a
    # seed, nor collide with a sampler constructed at seed+1
    s = LogitICARGibbs(Q, W, X, y, random_state=10)
    copies = [s.copy() for _ in range(3)]
    seeds = {c._seed for c in copies}
    assert len(seeds) == 3
    assert s._seed not in seeds
    assert 11 not in seeds
    d0 = copies[0].sample(3, chains=1, progressbar=False)
    d1 = copies[1].sample(3, chains=1, progressbar=False)
    assert not np.allclose(d0['alpha'], d1['alpha'])


def test_copy_of_copy_is_also_distinct():
    s = LogitICARGibbs(Q, W, X, y, random_state=10)
    c1 = s.copy()
    c2 = c1.copy()
    assert len({s._seed, c1._seed, c2._seed}) == 3


def test_solver_residual_diagnostic():
    # the diagnostic distinguishes a converged solver from a starved one
    exact = LogitICARGibbs(Q, W, X, y, random_state=0)  # chol at n=150
    r_exact = exact.solver_residual()
    assert r_exact < 1e-3
    cg = LogitICARGibbs(Q, W, X, y, random_state=0, solver='cg')
    r_cg = cg.solver_residual()
    assert r_cg < 1e-2
    starved = LogitICARGibbs(
        Q, W, X, y, random_state=0, solver='cg', cg_iters=1,
        solver_check_tol=None,  # measuring, not sampling: skip the raise
    )
    assert starved.solver_residual() > r_cg


def test_solver_guardrail_in_sampling_path():
    """The in-run analog of the reference's MINRES non-convergence raise
    (reference gibbs/logit.py:91-92): building the first carry with a
    starved fixed-budget CG must fail loudly, while the default budget
    passes (VERDICT r1 #2)."""
    Qb, Wb, Xb, yb = make_data(n=1000, ns=400, random_state=8)[:4]

    ok = LogitICARGibbs(Qb, Wb, Xb, yb, random_state=0)  # auto -> cg
    assert ok.solver == 'cg'
    d = ok.sample(3, chains=1, progressbar=False)  # no raise
    assert np.isfinite(d['tau']).all()

    starved = LogitICARGibbs(
        Qb, Wb, Xb, yb, random_state=0, solver='cg', cg_iters=1,
    )
    with pytest.raises(RuntimeError, match='did not converge'):
        starved.sample(3, chains=1, progressbar=False)

    # escape hatch: explicit opt-out skips the check
    bypass = LogitICARGibbs(
        Qb, Wb, Xb, yb, random_state=0, solver='cg', cg_iters=1,
        solver_check_tol=None,
    )
    bypass.sample(3, chains=1, progressbar=False)

    # RSR never routes eta through the iterative solver; its carry must
    # build without touching the guardrail even at auto-cg site counts
    rsr = LogitRSRGibbs(Qb, Wb, Xb, yb, random_state=0, q=10)
    rsr.init_carry(chains=1)


def test_rsr_samplers_forward_kernel_kwargs():
    # regression (ADVICE r1): the RSR subclasses dropped the kernel
    # kwargs of their bases, so asis/px could not be disabled on them
    s = LogitRSRGibbs(Q, W, X, y, random_state=2, asis=False)
    assert s.asis is False
    d = s.sample(4, chains=1, progressbar=False)
    assert np.isfinite(d['tau']).all()

    p = ProbitRSRGibbs(
        Q, W, X, y, random_state=2, asis=False, px=False, collapsed=False,
    )
    assert p.asis is False and p.px is False
    d = p.sample(4, chains=1, progressbar=False)
    assert np.isfinite(d['tau']).all()

    tuned = LogitRSRGibbs(
        Q, W, X, y, random_state=2, asis_sd=0.7, asis_steps=3,
    )
    assert tuned.asis_sd == 0.7 and tuned.asis_steps == 3


def test_asis_slice_method_runs_and_matches():
    """asis_method='slice' smoke + short-run agreement with the mh
    kernel (full invariance is pinned by tests/test_interweave.py and
    the asis on/off z-test below)."""
    s_slice = LogitICARGibbs(
        Q, W, X, y, random_state=5, asis_method='slice',
    )
    d = s_slice.sample(200, burnin=50, chains=2, progressbar=False)
    assert np.isfinite(d['tau']).all()
    assert (np.asarray(d['tau']) > 0).all()

    with pytest.raises(ValueError, match='unknown asis_method'):
        LogitICARGibbs(Q, W, X, y, asis_method='hmc')


def test_asis_same_posterior_logit():
    """The ASIS tau interweave must leave the posterior invariant:
    on/off runs agree on posterior means within combined MC error
    (z-test with per-component MCSE — the plain kernel's intercept
    mixes slowly on this small dataset, so a fixed tolerance would
    really be testing its ESS, not the ASIS math)."""
    import numpy as np

    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.diagnostics import ess_bulk

    on = LogitICARGibbs(Q, W, X, y, random_state=5, asis=True)
    off = LogitICARGibbs(Q, W, X, y, random_state=5, asis=False)
    po = on.sample(2000, burnin=600, chains=4, progressbar=False)
    pf = off.sample(2000, burnin=600, chains=4, progressbar=False)
    for name in ('alpha', 'beta'):
        a = np.asarray(po[name], np.float64)
        b = np.asarray(pf[name], np.float64)
        for j in range(a.shape[2]):
            ea = max(float(ess_bulk(a[:, :, j])), 4.0)
            eb = max(float(ess_bulk(b[:, :, j])), 4.0)
            se = np.sqrt(
                a[:, :, j].std() ** 2 / ea + b[:, :, j].std() ** 2 / eb
            )
            diff = abs(a[:, :, j].mean() - b[:, :, j].mean())
            assert diff < 5.0 * se + 0.05, (name, j, diff, se)
    # tau mixing must improve, not degrade, under the interweave
    assert float(ess_bulk(np.asarray(po['tau'], np.float64))) > 0.5 * \
        float(ess_bulk(np.asarray(pf['tau'], np.float64)))


def test_spatial_sweeps_same_posterior_logit():
    """Repeating the (tau, beta/eta, ASIS) block per PG draw composes
    exact conditional moves, so sweeps=1 and the default sweeps=2 must
    target the same posterior (z-test on means within combined MC
    error) while tau mixing must not degrade."""
    from occuspytial_tpu.diagnostics import ess_bulk

    one = LogitICARGibbs(Q, W, X, y, random_state=5, spatial_sweeps=1)
    two = LogitICARGibbs(Q, W, X, y, random_state=5)
    assert two.spatial_sweeps == 2
    p1 = one.sample(2000, burnin=600, chains=4, progressbar=False)
    p2 = two.sample(2000, burnin=600, chains=4, progressbar=False)
    for name in ('alpha', 'beta'):
        a = np.asarray(p1[name], np.float64)
        b = np.asarray(p2[name], np.float64)
        for j in range(a.shape[2]):
            ea = max(float(ess_bulk(a[:, :, j])), 4.0)
            eb = max(float(ess_bulk(b[:, :, j])), 4.0)
            se = np.sqrt(
                a[:, :, j].std() ** 2 / ea + b[:, :, j].std() ** 2 / eb
            )
            diff = abs(a[:, :, j].mean() - b[:, :, j].mean())
            assert diff < 5.0 * se + 0.05, (name, j, diff, se)
    assert float(ess_bulk(np.asarray(p2['tau'], np.float64))) > 0.5 * \
        float(ess_bulk(np.asarray(p1['tau'], np.float64)))

    with pytest.raises(ValueError, match='spatial_sweeps'):
        LogitICARGibbs(Q, W, X, y, spatial_sweeps=0)


def test_probit_icar_iterative_solver_regimes():
    """The probit ICAR eta draw has three solver regimes (spectral /
    stencil / graph); the iterative ones must target the same posterior
    as the closed-form spectral draw (z-test on posterior means), trip
    the accuracy guardrail when starved, and reject the collapsed
    ladder (it needs the eigenbasis)."""
    import scipy.sparse as sps

    from occuspytial_tpu import ProbitICARGibbs
    from occuspytial_tpu.diagnostics import ess_bulk

    ref = ProbitICARGibbs(Q, W, X, y, random_state=5)
    assert ref.solver == 'spectral' and ref.collapsed
    pr = ref.sample(1500, burnin=500, chains=4, progressbar=False)

    it = ProbitICARGibbs(
        sps.csr_matrix(Q), W, X, y, random_state=6, solver='graph'
    )
    assert not it.collapsed and it.graph is not None
    pi = it.sample(1500, burnin=500, chains=4, progressbar=False)
    assert it.solver_residual() < 1e-2

    # the dataset's Q is a queen lattice with a random factorization of
    # n=150 (make_data contract): recover it, then run the stencil
    # regime on the identical model through the O(n) operators
    from occuspytial_tpu.ops.icar import lattice_precision

    qs = sps.csr_matrix(Q)
    lat = next(
        (r_, 150 // r_, 8)
        for r_ in range(3, 151)
        if 150 % r_ == 0 and (
            sps.csr_matrix(lattice_precision(r_, 150 // r_, 8)) != qs
        ).nnz == 0
    )
    st = ProbitICARGibbs(Q, W, X, y, random_state=7, lattice=lat)
    assert st.solver == 'stencil' and not st.collapsed
    ps = st.sample(1500, burnin=500, chains=4, progressbar=False)
    assert st.solver_residual() < 1e-2

    for name in ('alpha', 'beta'):
        a = np.asarray(pr[name], np.float64)
        for other in (pi, ps):
            b = np.asarray(other[name], np.float64)
            for j in range(a.shape[2]):
                ea = max(float(ess_bulk(a[:, :, j])), 4.0)
                eb = max(float(ess_bulk(b[:, :, j])), 4.0)
                se = np.sqrt(
                    a[:, :, j].std() ** 2 / ea
                    + b[:, :, j].std() ** 2 / eb
                )
                diff = abs(a[:, :, j].mean() - b[:, :, j].mean())
                assert diff < 6.0 * se + 0.05, (name, j, diff, se)

    with pytest.raises(ValueError, match='collapsed'):
        ProbitICARGibbs(
            sps.csr_matrix(Q), W, X, y, solver='graph', collapsed=True
        )

    bad = ProbitICARGibbs(
        sps.csr_matrix(Q), W, X, y, random_state=5, solver='graph',
        cg_iters=1, graph_rank=0,
    )
    with pytest.raises(RuntimeError, match='did not converge'):
        bad.init_carry(chains=1)


def test_track_latent_fields():
    """sampler.track records extra state entries (e.g. posterior
    occupancy maps) through the same compiled scan."""
    s = LogitICARGibbs(Q, W, X, y, random_state=10)
    s.track = ('z', 'eta')
    post = s.sample(12, burnin=4, chains=2, progressbar=False)
    z = np.asarray(post['z'])
    eta = np.asarray(post['eta'])
    assert z.shape == (2, 8, 150) and eta.shape == (2, 8, 150)
    assert set(np.unique(z)) <= {0.0, 1.0}
    # observed sites are forced occupied in every retained draw
    obs = np.asarray(s.fixed['obs']) > 0
    assert z[:, :, obs].min() == 1.0
    # the ICAR field satisfies its sum-to-zero constraint per draw
    assert np.abs(eta.sum(axis=-1)).max() < 1e-2

    bad = LogitICARGibbs(Q, W, X, y, random_state=10)
    bad.track = ('not_a_state',)
    with pytest.raises(ValueError, match='not state entries'):
        bad.sample(4, chains=2, progressbar=False)


def test_sample_until_converges_and_raises():
    """Adaptive run length: extends the run in resumed compiled-scan
    blocks until split-R-hat/ESS criteria hold on the retained window,
    and raises naming the worst parameter when max_size hits first."""
    from occuspytial_tpu import diagnostics as dg

    s = LogitRSRGibbs(Q, W, X, y, random_state=10)
    post = s.sample_until(
        rhat_tol=1.05, min_ess=200, chains=4, check_every=256,
    )
    assert post['alpha'].shape[0] == 4
    worst = max(float(dg.rhat(a)) for _, a in post._iter_scalars())
    assert worst <= 1.05
    assert min(
        float(dg.ess_bulk(a)) for _, a in post._iter_scalars()
    ) >= 200

    s2 = LogitRSRGibbs(Q, W, X, y, random_state=10)
    with pytest.raises(RuntimeError, match='no convergence'):
        s2.sample_until(
            rhat_tol=1.0 + 1e-9, chains=2, check_every=64, max_size=128,
        )


def test_auto_scan_chunk_policy(monkeypatch):
    """scan_chunk=None resolves per backend: 64 on CPU (one executable
    shared across sample sizes), a single whole-run dispatch on
    accelerators (dispatch round-trips through a tunneled TPU runtime
    are the scarce resource — docs/design.md), re-chunked only for
    progress-bar ticks or to bound track-ed per-dispatch output."""
    import jax

    from occuspytial_tpu.models import base as base_mod

    s = LogitICARGibbs(Q, W, X, y, random_state=1)
    assert s.scan_chunk is None  # library default is auto
    assert s._resolve_chunk(1000, False, {}) == 64  # CPU backend

    s.scan_chunk = 17  # explicit override wins on any backend
    assert s._resolve_chunk(1000, False, {}) == 17
    s.scan_chunk = None

    monkeypatch.setattr(
        base_mod.jax, 'default_backend', lambda: 'tpu'
    )
    assert s._resolve_chunk(3008, False, {}) == 3008  # one dispatch
    assert s._resolve_chunk(3008, True, {}) == 188  # ~16 bar ticks
    assert s._resolve_chunk(100, True, {}) == 64  # floor, capped to size

    # track-ed fields: chunk * per-draw-bytes stays under the budget
    s.track = ('eta',)
    state0 = {'eta': np.zeros((64, 1000), np.float32)}
    budget = base_mod.GibbsBase._auto_chunk_output_budget
    expect = budget // (64 * 1000 * 4)
    assert s._resolve_chunk(100000, False, state0) == expect
    del jax


@parametrized_samplers
def test_chain0_invariant_to_chain_count(sampler_class):
    """A seeded run's chain-0 draws are unchanged when the chain count
    grows (VERDICT r4 next-round #6): per-chain keys come from a
    prefix-stable split and every per-chain kernel (including the
    TPU-default packed PG, tested on the hardware lane) draws from that
    chain's key alone."""
    a = sampler_class(Q, W, X, y, random_state=11).sample(
        6, chains=2, progressbar=False
    )
    b = sampler_class(Q, W, X, y, random_state=11).sample(
        6, chains=3, progressbar=False
    )
    for name in ('alpha', 'beta', 'tau'):
        np.testing.assert_array_equal(
            np.asarray(a[name])[:2], np.asarray(b[name])[:2]
        )
