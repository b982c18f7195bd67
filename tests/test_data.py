"""OccupancyData packing tests (static-shape analog of reference
tests/test_data.py's ragged-container contracts)."""

import numpy as np
import pytest

from occuspytial_tpu.data import OccupancyData, pack_detection_data


def _toy():
    W = {
        0: np.arange(6, dtype=float).reshape(3, 2),
        2: np.arange(4, dtype=float).reshape(2, 2),
    }
    y = {0: np.array([0.0, 1.0, 0.0]), 2: np.array([0.0, 0.0])}
    return W, y


def test_pack_shapes_and_masks():
    W, y = _toy()
    d = pack_detection_data(W, y, n_sites=4)
    # compact layout: detection arrays cover only the 2 surveyed sites
    assert d.W.shape == (2, 3, 2)
    assert d.y.shape == (2, 3)
    assert d.visit_mask.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(d.site_idx), [0, 2])
    np.testing.assert_array_equal(
        np.asarray(d.surveyed), [True, False, True, False]
    )
    np.testing.assert_array_equal(
        np.asarray(d.obs), [True, False, False, False]
    )
    np.testing.assert_array_equal(d.visits(), [3, 0, 2, 0])
    # padded visit cells are zero
    assert float(np.asarray(d.W)[1, 2].sum()) == 0.0
    # real cells round-trip
    np.testing.assert_array_equal(np.asarray(d.W)[0, :3], W[0])
    np.testing.assert_array_equal(np.asarray(d.W)[1, :2], W[2])


def test_pack_errors():
    W, y = _toy()
    with pytest.raises(ValueError, match='same site keys'):
        pack_detection_data(W, {0: y[0]}, n_sites=4)
    with pytest.raises(ValueError, match='site keys must lie'):
        pack_detection_data({9: W[0]}, {9: y[0]}, n_sites=4)
    bad_y = {0: np.array([1.0]), 2: y[2]}
    with pytest.raises(ValueError, match='visits but y has'):
        pack_detection_data(W, bad_y, n_sites=4)
    bad_w = dict(W)
    bad_w[2] = np.ones((2, 3))
    with pytest.raises(ValueError, match='detection covariates'):
        pack_detection_data(bad_w, y, n_sites=4)


def test_properties():
    W, y = _toy()
    d = pack_detection_data(W, y, n_sites=4)
    assert d.n_sites == 4
    assert d.max_visits == 3
    assert d.n_alpha == 2
    assert isinstance(d, OccupancyData)


def test_pytree_roundtrip():
    import jax

    W, y = _toy()
    d = pack_detection_data(W, y, n_sites=4)
    leaves, treedef = jax.tree_util.tree_flatten(d)
    d2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(d2.W), np.asarray(d.W))


def test_compat_data_container():
    """Reference Data API parity (reference tests/test_data.py)."""
    import pytest
    from occuspytial_tpu import Data

    W, y = _toy()
    d = Data(W)
    assert sorted(d.surveyed) == [0, 2]
    assert len(d) == 2
    assert d.visits(0) == 3
    assert d.visits([0, 2]) == (3, 2)
    np.testing.assert_array_equal(d[0], W[0])
    cat = d[[0, 2]]
    assert cat.shape == (5, 2)
    np.testing.assert_array_equal(cat, np.vstack([W[0], W[2]]))
    with pytest.raises(TypeError, match='dict'):
        Data([1, 2])
    # picklable (reference data.pyx:146-147)
    import pickle

    d2 = pickle.loads(pickle.dumps(d))
    assert sorted(d2.surveyed) == [0, 2]

    # samplers accept Data-wrapped input
    from occuspytial_tpu.data import as_occupancy_data

    occ = as_occupancy_data(Data(W), Data(y), n_sites=4)
    assert occ.W.shape == (2, 3, 2)
