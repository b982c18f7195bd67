"""State container tests (mirrors reference gibbs/tests/test_state.py)."""

import pytest

from occuspytial_tpu.models.state import FixedState, State


def test_state_attribute_and_item_access():
    s = State()
    s.alpha = 1.5
    assert s.alpha == 1.5
    assert s['alpha'] == 1.5
    s.alpha = 2.0  # mutable
    assert s.alpha == 2.0
    assert list(iter(s)) == ['alpha']
    assert s.as_dict() == {'alpha': 2.0}


def test_fixed_state_write_once():
    f = FixedState()
    f.Q = 'matrix'
    assert f['Q'] == 'matrix'
    with pytest.raises(KeyError, match='cannot change attributes'):
        f.Q = 'other'
