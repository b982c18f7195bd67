"""Simulator tests (mirrors reference tests/test_utils.py)."""

import numpy as np
import pytest

from occuspytial_tpu.utils import get_generator, make_data, rand_precision_mat


def test_get_generator():
    rng = get_generator(0)
    assert isinstance(rng, np.random.Generator)
    assert isinstance(rng.bit_generator, np.random.SFC64)
    rng2 = get_generator(0)
    assert np.all(
        rng2.bit_generator.state['state']['state']
        == rng.bit_generator.state['state']['state']
    )


def test_random_precision_mat():
    mat = rand_precision_mat(2, 4, max_neighbors=4)
    assert mat.diagonal().max() == 3
    mat = rand_precision_mat(2, 4, max_neighbors=8)
    assert mat.diagonal().max() == 5
    with pytest.raises(ValueError, match='neighbors should be one of'):
        rand_precision_mat(2, 4, max_neighbors=9)
    assert np.linalg.matrix_rank(mat.toarray()) == 7
    assert np.linalg.matrix_rank(
        rand_precision_mat(2, 4, 8, rho=0.5).toarray()
    ) == 8
    assert np.linalg.matrix_rank(
        rand_precision_mat(2, 4, 8, rho=0).toarray()
    ) == 8


def test_make_data():
    data = make_data(n=150, p=3, q=2, ns=65, random_state=10)
    assert data[0].shape[0] == 150
    assert data[4].shape[0] == 2
    assert data[5].shape[0] == 3
    some_site = next(iter(data[1]))
    assert data[1][some_site].shape[1] == 2
    assert data[2].shape[1] == 3
    assert len(data[1]) == 65
    # y values are 0/1 and W/y lengths agree per site
    for site, w in data[1].items():
        assert w.shape[0] == data[3][site].shape[0]
        assert set(np.unique(data[3][site])).issubset({0, 1})

    data = make_data(n=150, p=3, q=2, random_state=10)
    assert len(data[1]) == 150 // 2

    with pytest.raises(ValueError, match='n cant be lower than'):
        make_data(n=149)
    with pytest.raises(ValueError, match='min_v needs to be at least'):
        make_data(min_v=0)
    with pytest.raises(ValueError, match='max_v is too small'):
        make_data(n=150, max_v=1)
    with pytest.raises(ValueError, match='max_v cant be more than n'):
        make_data(n=150, max_v=151)
    with pytest.raises(ValueError, match='ns should be positive'):
        make_data(ns=0)
    with pytest.raises(ValueError, match='ns cant be more than n'):
        make_data(n=150, ns=151)
