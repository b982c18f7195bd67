"""PosteriorParameter container tests (mirrors reference
tests/test_posterior.py but asserts real outputs instead of mocking
arviz)."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

from occuspytial_tpu import Chain, PosteriorParameter


@pytest.fixture
def post():
    rng = np.random.default_rng(0)
    return PosteriorParameter({
        'alpha': rng.normal(size=(2, 100, 2)),
        'beta': rng.normal(size=(2, 100, 3)),
        'tau': rng.gamma(2.0, size=(2, 100)),
    })


def test_getitem_shapes(post):
    assert post['alpha'].shape == (2, 100, 2)
    assert post['tau'].shape == (2, 100)


def test_summary_rows_and_columns(post):
    sm = post.summary
    assert list(sm.index) == [
        'alpha[0]', 'alpha[1]', 'beta[0]', 'beta[1]', 'beta[2]', 'tau',
    ]
    for col in ('mean', 'sd', 'hdi_3%', 'hdi_97%', 'mcse_mean', 'mcse_sd',
                'ess_bulk', 'ess_tail', 'r_hat'):
        assert col in sm.columns
    assert np.isfinite(sm['mean']).all()


def test_plots(post):
    assert post.plot_trace().shape == (6, 2)
    assert post.plot_auto_corr().shape == (1, 6)
    assert post.plot_pair().shape == (5, 5)
    assert post.plot_density().shape == (1, 6)
    assert post.plot_ess().shape == (1, 6)


def test_from_chains():
    chains = []
    for c in range(2):
        ch = Chain({'alpha': 2, 'tau': 1}, 5)
        for i in range(5):
            ch.append({'alpha': np.array([c, i]), 'tau': float(i)})
        chains.append(ch)
    post = PosteriorParameter(*chains)
    assert post['alpha'].shape == (2, 5, 2)
    assert post['tau'].shape == (2, 5)
    assert post['alpha'][1, 3, 0] == 1


def test_to_inference_data_bridge(post, monkeypatch):
    """The lazy arviz bridge delegates to convert_to_inference_data with
    the raw sample dict (arviz is absent from this image, so a stub
    module stands in — the reference's own posterior test mocks arviz
    the same way)."""
    import sys
    import types

    captured = {}
    stub = types.ModuleType('arviz')

    def convert(obj):
        captured['arg'] = obj
        return 'IDATA'

    stub.convert_to_inference_data = convert
    monkeypatch.setitem(sys.modules, 'arviz', stub)
    assert post.to_inference_data() == 'IDATA'
    assert captured['arg'] is post.data


def test_to_inference_data_without_arviz(post, monkeypatch):
    import builtins
    import sys

    monkeypatch.delitem(sys.modules, 'arviz', raising=False)
    real_import = builtins.__import__

    def no_arviz(name, *args, **kwargs):
        if name == 'arviz':
            raise ImportError('No module named arviz')
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, '__import__', no_arviz)
    with pytest.raises(ImportError, match='requires the optional arviz'):
        post.to_inference_data()
