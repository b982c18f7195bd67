"""Pólya-Gamma sampler tests: exact moments, reproducibility, jit/vmap.

Mirrors SURVEY.md §7 stage 2: PG moments are checked against the analytic
E[PG(1,z)] = tanh(z/2)/(2z) and Var[PG(1,z)] — a stronger contract than
the reference has for its external C dependency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occuspytial_tpu.ops.polyagamma import (
    pg_devroye,
    pg_gamma,
    pg_mean,
    pg_var,
    random_polyagamma,
)

N = 150_000
Z_GRID = [0.0, 0.1, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0]


@pytest.mark.parametrize('method', ['devroye', 'gamma'])
@pytest.mark.parametrize('z', Z_GRID)
def test_moments(method, z):
    key = jax.random.key(hash((method, z)) % (2**31))
    draws = random_polyagamma(key, jnp.full((N,), z), method=method)
    m, v = float(pg_mean(z)), float(pg_var(z))
    se_mean = np.sqrt(v / N)
    assert abs(float(draws.mean()) - m) < 5 * se_mean
    # variance within 5% relative tolerance at this sample size
    assert abs(float(draws.var()) - v) < 0.05 * v + 5e-5


def test_positive_support():
    key = jax.random.key(0)
    z = jax.random.normal(key, (10_000,)) * 5
    for fn in (pg_devroye, pg_gamma):
        draws = fn(key, z)
        assert bool((draws > 0).all())
        assert bool(jnp.isfinite(draws).all())


def test_reproducible():
    key = jax.random.key(42)
    z = jnp.linspace(0, 5, 1000)
    a = pg_devroye(key, z)
    b = pg_devroye(key, z)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_symmetric_in_z():
    """PG(1, z) depends on z only through |z|: same key -> same draws."""
    key = jax.random.key(3)
    z = jnp.linspace(0.1, 5, 100)
    np.testing.assert_allclose(
        np.asarray(pg_devroye(key, z)), np.asarray(pg_devroye(key, -z))
    )


def test_vmap_and_scan_composable():
    def draw(key):
        return pg_devroye(key, jnp.linspace(0, 3, 16))

    keys = jax.random.split(jax.random.key(1), 4)
    batched = jax.jit(jax.vmap(draw))(keys)
    assert batched.shape == (4, 16)

    def body(carry, _):
        k, acc = carry
        k, sub = jax.random.split(k)
        return (k, acc + pg_devroye(sub, jnp.zeros(8))), None

    (_, total), _ = jax.lax.scan(
        body, (jax.random.key(2), jnp.zeros(8)), None, length=5
    )
    assert bool(jnp.isfinite(total).all())


def test_unknown_method_raises():
    with pytest.raises(ValueError, match='unknown PG sampling method'):
        random_polyagamma(jax.random.key(0), jnp.zeros(3), method='nope')
