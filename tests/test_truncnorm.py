"""One-sided truncated-normal sampler tests against scipy.stats.truncnorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from occuspytial_tpu.ops.truncnorm import (
    truncnorm_negative,
    truncnorm_positive,
    truncnorm_sign,
)

N = 100_000


@pytest.mark.parametrize('loc', [-3.0, -1.0, 0.0, 1.0, 3.0])
def test_positive_tail_moments(loc):
    key = jax.random.key(int(loc * 10) % 97)
    draws = np.asarray(
        truncnorm_positive(key, jnp.full((N,), loc, jnp.float32)),
        dtype=np.float64,
    )
    assert draws.min() >= 0.0
    ref = stats.truncnorm(-loc, np.inf, loc=loc, scale=1.0)
    assert abs(draws.mean() - ref.mean()) < 6 * ref.std() / np.sqrt(N)
    assert abs(draws.std() - ref.std()) < 0.03 * ref.std() + 1e-3


@pytest.mark.parametrize('loc', [-3.0, 0.0, 2.0])
def test_negative_tail_moments(loc):
    key = jax.random.key(int(loc * 7) % 89 + 1)
    draws = np.asarray(
        truncnorm_negative(key, jnp.full((N,), loc, jnp.float32)),
        dtype=np.float64,
    )
    assert draws.max() <= 0.0
    ref = stats.truncnorm(-np.inf, -loc, loc=loc, scale=1.0)
    assert abs(draws.mean() - ref.mean()) < 6 * ref.std() / np.sqrt(N)
    assert abs(draws.std() - ref.std()) < 0.03 * ref.std() + 1e-3


def test_sign_dispatch():
    key = jax.random.key(11)
    loc = jnp.zeros(1000)
    positive = jnp.arange(1000) % 2 == 0
    draws = np.asarray(truncnorm_sign(key, loc, positive))
    pos_mask = np.asarray(positive)
    assert (draws[pos_mask] >= 0).all()
    assert (draws[~pos_mask] <= 0).all()


def test_extreme_locations_stay_finite():
    """f32 saturation guard: |loc| far beyond the CDF resolution must not
    produce inf/NaN (the failure mode found during the probit bring-up)."""
    key = jax.random.key(12)
    loc = jnp.asarray([-30.0, -10.0, 10.0, 30.0] * 250, jnp.float32)
    for positive in (loc > 0, loc < 0):
        draws = truncnorm_sign(key, loc, positive)
        assert bool(jnp.isfinite(draws).all())
