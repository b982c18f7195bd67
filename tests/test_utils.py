"""Tests for the RNG policy and the synthetic-data simulator.

The behavioral contracts come from reference utils.py (SFC64 generator,
lattice precision construction, ``make_data``'s shapes and error
branches); the assertions here are organized around the rebuild's
invariants — structural properties first, the input-validation matrix as
one parametrized table.
"""

import numpy as np
import pytest

from occuspytial_tpu.utils import (
    get_generator,
    make_data,
    rand_precision_mat,
)


class TestGetGenerator:
    def test_uses_sfc64(self):
        rng = get_generator(123)
        assert isinstance(rng, np.random.Generator)
        assert isinstance(rng.bit_generator, np.random.SFC64)

    def test_seeded_streams_are_deterministic(self):
        a = get_generator(7).standard_normal(16)
        b = get_generator(7).standard_normal(16)
        c = get_generator(8).standard_normal(16)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestLatticePrecision:
    @pytest.mark.parametrize(
        'neighbors,max_degree', [(4, 3), (8, 5)],
        ids=['rook', 'queen'],
    )
    def test_degree_bound_on_2x4_lattice(self, neighbors, max_degree):
        q = rand_precision_mat(2, 4, max_neighbors=neighbors)
        assert q.diagonal().max() == max_degree

    def test_icar_precision_is_singular_with_zero_rowsums(self):
        q = rand_precision_mat(3, 5, max_neighbors=8).toarray()
        np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
        np.testing.assert_allclose(q, q.T)
        assert np.linalg.matrix_rank(q) == q.shape[0] - 1

    @pytest.mark.parametrize('rho', [0.0, 0.5])
    def test_proper_car_is_full_rank(self, rho):
        q = rand_precision_mat(3, 5, max_neighbors=8, rho=rho).toarray()
        assert np.linalg.matrix_rank(q) == q.shape[0]

    def test_rejects_unknown_neighborhood(self):
        with pytest.raises(ValueError, match='neighbors should be one of'):
            rand_precision_mat(3, 5, max_neighbors=6)


@pytest.fixture(scope='module')
def dataset():
    return make_data(n=160, ns=40, p=4, q=3, min_v=2, max_v=6,
                     random_state=99)


class TestMakeData:
    def test_global_shapes(self, dataset):
        q_mat, w, x, y, alpha, beta, tau, z = dataset
        n = 160
        assert q_mat.shape == (n, n)
        assert x.shape == (n, 4)
        np.testing.assert_array_equal(x[:, 0], 1.0)
        assert alpha.shape == (3,)
        assert beta.shape == (4,)
        assert np.isscalar(tau) or np.ndim(tau) == 0
        assert z.shape == (n,)
        assert set(np.unique(z)).issubset({0, 1})

    def test_survey_structure(self, dataset):
        _, w, _, y, *_ , z = dataset
        assert len(w) == len(y) == 40
        for site, w_s in w.items():
            v = w_s.shape[0]
            assert 2 <= v <= 6
            assert w_s.shape[1] == 3
            np.testing.assert_array_equal(w_s[:, 0], 1.0)
            assert y[site].shape == (v,)
            assert set(np.unique(y[site])).issubset({0, 1})
            if z[site] == 0:  # detection requires occupancy
                assert not y[site].any()

    def test_default_survey_fraction_is_half(self):
        _, w, *_ = make_data(n=150, random_state=1)
        assert len(w) == 75

    @pytest.mark.parametrize(
        'kwargs,message',
        [
            ({'n': 149}, 'need n >= 150'),
            ({'min_v': 0}, 'need min_v >= 1'),
            ({'n': 150, 'max_v': 1}, 'need max_v >= 2'),
            ({'n': 150, 'max_v': 151}, 'need max_v <= n'),
            ({'ns': 0}, 'positive number of surveyed sites'),
            ({'n': 150, 'ns': 151}, 'need ns <= n'),
        ],
        ids=['n-too-small', 'min_v-zero', 'max_v-small', 'max_v-large',
             'ns-zero', 'ns-large'],
    )
    def test_input_validation(self, kwargs, message):
        with pytest.raises(ValueError, match=message):
            make_data(**kwargs)
