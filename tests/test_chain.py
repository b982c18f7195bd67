"""Chain container tests (mirrors reference tests/test_chain.py)."""

import numpy as np
import pytest

from occuspytial_tpu import Chain


def test_append_and_getitem():
    c = Chain({'alpha': 2, 'tau': 1}, 3)
    assert len(c) == 0
    c.append({'alpha': np.array([1.0, 2.0]), 'tau': 0.5})
    c.append({'alpha': np.array([3.0, 4.0]), 'tau': 1.5})
    assert len(c) == 2
    np.testing.assert_array_equal(c['alpha'], [[1, 2], [3, 4]])
    np.testing.assert_array_equal(c['tau'], [0.5, 1.5])


def test_full_concatenates():
    c = Chain({'alpha': 2, 'tau': 1}, 3)
    c.append({'alpha': np.array([1.0, 2.0]), 'tau': 0.5})
    full = c.full
    assert full.shape == (1, 3)
    np.testing.assert_array_equal(full, [[1.0, 2.0, 0.5]])


def test_overflow_raises():
    c = Chain({'tau': 1}, 1)
    c.append({'tau': 1.0})
    with pytest.raises(ValueError, match='Chain is full'):
        c.append({'tau': 2.0})


def test_expand():
    c = Chain({'alpha': 2, 'tau': 1}, 1)
    c.append({'alpha': np.array([1.0, 2.0]), 'tau': 0.5})
    c.expand(2)
    assert c.size == 3
    c.append({'alpha': np.array([3.0, 4.0]), 'tau': 1.5})
    np.testing.assert_array_equal(c['alpha'], [[1, 2], [3, 4]])


def test_extend_block():
    c = Chain({'alpha': 2, 'tau': 1}, 5)
    c.extend({
        'alpha': np.arange(6, dtype=float).reshape(3, 2),
        'tau': np.arange(3, dtype=float),
    })
    assert len(c) == 3
    np.testing.assert_array_equal(c['tau'], [0, 1, 2])
    with pytest.raises(ValueError, match='Chain is full'):
        c.extend({'alpha': np.zeros((3, 2)), 'tau': np.zeros(3)})


def test_repr():
    c = Chain({'tau': 1}, 2)
    assert 'tau' in repr(c)


def test_extend_validates_before_writing():
    # regression (ADVICE r1): a failing extend must not partially write
    c = Chain({'alpha': 2, 'tau': 1}, 4)
    c.extend({'alpha': np.ones((2, 2)), 'tau': np.ones(2)})
    with pytest.raises(ValueError, match='Chain is full'):
        c.extend({'alpha': np.zeros((3, 2)), 'tau': np.zeros(3)})
    assert len(c) == 2
    np.testing.assert_array_equal(c['alpha'], np.ones((2, 2)))
    with pytest.raises(ValueError, match='share one leading length'):
        c.extend({'alpha': np.zeros((2, 2)), 'tau': np.zeros(1)})
    assert len(c) == 2
    np.testing.assert_array_equal(c['tau'], np.ones(2))
