"""Diagnostics estimator tests (ESS / R-hat / MCSE / HDI)."""

import numpy as np
import pytest

from occuspytial_tpu import diagnostics as dg


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 2000))
    n = x.size
    assert 0.75 * n < dg.ess_bulk(x) < 1.35 * n
    assert 0.5 * n < dg.ess_tail(x) < 1.5 * n


def test_ess_correlated_much_smaller():
    rng = np.random.default_rng(1)
    # AR(1) with phi=0.95: ESS ~ n * (1-phi)/(1+phi) ~ n/39
    phi = 0.95
    m, n = 4, 4000
    x = np.zeros((m, n))
    innov = rng.normal(size=(m, n))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + innov[:, t]
    ess = dg.ess_bulk(x)
    assert ess < 0.12 * m * n
    assert ess > 50


def test_rhat_mixed_vs_diverged():
    rng = np.random.default_rng(2)
    good = rng.normal(size=(4, 1000))
    assert dg.rhat(good) < 1.01
    bad = good + np.arange(4)[:, None] * 3.0
    assert dg.rhat(bad) > 1.5


def test_rhat_single_chain_nan():
    assert np.isnan(dg.rhat(np.random.default_rng(3).normal(size=(1, 100))))


def test_mcse_mean_scales():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 5000))
    se = dg.mcse_mean(x)
    assert 0.7 / np.sqrt(x.size) < se < 1.4 / np.sqrt(x.size)
    assert dg.mcse_sd(x) > 0


def test_hdi_normal():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 50000))
    lo, hi = dg.hdi(x, prob=0.94)
    assert lo == pytest.approx(-1.88, abs=0.08)
    assert hi == pytest.approx(1.88, abs=0.08)


def test_summary_stats_contract():
    rng = np.random.default_rng(6)
    row = dg.summary_stats(rng.normal(size=(4, 500)))
    assert set(row) == {
        'mean', 'sd', 'hdi_3%', 'hdi_97%', 'mcse_mean', 'mcse_sd',
        'ess_bulk', 'ess_tail', 'r_hat',
    }
    assert abs(row['mean']) < 0.1
    assert 0.9 < row['sd'] < 1.1
