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


def test_state_pickle_and_deepcopy_roundtrip():
    """The containers are user-facing (e.g. held in checkpoints), so the
    copy/pickle protocols must not trip __getattr__ while _entries does
    not exist yet (regression: RecursionError during reconstruction)."""
    import copy
    import pickle

    s = State(alpha=1.5, beta=[1, 2])
    assert pickle.loads(pickle.dumps(s)) == s
    assert copy.deepcopy(s) == s

    f = FixedState(Q='matrix')
    f2 = pickle.loads(pickle.dumps(f))
    assert f2 == f
    with pytest.raises(KeyError, match='cannot change attributes'):
        f2.Q = 'other'  # the write-once contract survives the roundtrip
    assert copy.deepcopy(f).Q == 'matrix'

    with pytest.raises(AttributeError):
        s.not_there
