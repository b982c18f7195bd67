"""Sharded multi-device chain execution tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

from occuspytial_tpu import LogitRSRGibbs
from occuspytial_tpu.parallel import chain_mesh, sample_parallel
from occuspytial_tpu.utils import make_data

Q, W, X, y, *_ = make_data(n=150, ns=100, p=3, q=2, random_state=10)


@pytest.fixture(scope='module')
def sampler():
    return LogitRSRGibbs(Q, W, X, y, random_state=10)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_chains_shapes(sampler):
    mesh = chain_mesh()
    post = sample_parallel(sampler, size=6, burnin=2, chains=8, mesh=mesh)
    assert post['alpha'].shape == (8, 4, 2)
    assert post['tau'].shape == (8, 4)
    # chains produce distinct draws
    assert not np.allclose(post['alpha'][0], post['alpha'][1])


def test_sharded_matches_single_device(sampler):
    """Sharding chains over devices must not change the draws."""
    mesh = chain_mesh()
    post_sharded = sample_parallel(sampler, size=6, chains=8, mesh=mesh)
    post_local = sampler.sample(6, chains=8, progressbar=False)
    np.testing.assert_allclose(
        post_sharded['alpha'], post_local['alpha'], rtol=2e-4, atol=1e-5
    )


def test_chain_count_must_divide(sampler):
    with pytest.raises(ValueError, match='multiple of the mesh size'):
        sample_parallel(sampler, size=4, chains=3, mesh=chain_mesh())


def test_submesh(sampler):
    mesh = chain_mesh(n_devices=4)
    post = sample_parallel(sampler, size=4, chains=4, mesh=mesh)
    assert post['alpha'].shape == (4, 4, 2)
