"""Pallas PG kernel tests (run only on a real TPU backend).

The CI/test environment forces the CPU backend (conftest.py), where the
fused Mosaic kernel cannot run — the moment/reproducibility contracts are
then validated on TPU by the benchmark pipeline and by running this file
with JAX_ALLOW_TPU=1 on TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu = jax.default_backend() == 'tpu'

pytestmark = pytest.mark.skipif(not tpu, reason='requires TPU backend')


def test_moments():
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas
    from occuspytial_tpu.ops.polyagamma import pg_mean, pg_var

    key = jax.random.key(0)
    for z in (0.0, 1.0, 4.0, 16.0):
        zs = jnp.full((200_000,), z)
        d = pg_devroye_pallas(key, zs)
        m, v = float(pg_mean(z)), float(pg_var(z))
        assert abs(float(d.mean()) - m) < 5 * np.sqrt(v / zs.size)
        assert abs(float(d.var()) - v) < 0.05 * v + 5e-5


def test_reproducible_and_vmap():
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas

    key = jax.random.key(1)
    z = jnp.linspace(0, 5, 777)
    a = pg_devroye_pallas(key, z)
    b = pg_devroye_pallas(key, z)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    keys = jax.random.split(key, 4)
    out = jax.jit(jax.vmap(pg_devroye_pallas))(keys, jnp.zeros((4, 500)))
    assert out.shape == (4, 500)
    assert bool(jnp.isfinite(out).all())
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_per_chain_key_contract():
    """Each vmapped chain's draws are a function of its own key alone
    (regression: round-1 XOR-mixed all chains' key material)."""
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas

    z = jnp.linspace(-2.0, 2.0, 1000)
    f = jax.jit(jax.vmap(pg_devroye_pallas, in_axes=(0, None)))
    keys = jax.random.split(jax.random.key(3), 4)
    a = np.asarray(f(keys, z))
    b = np.asarray(f(keys.at[2].set(jax.random.key(77)), z))
    # only chain 2 changes
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[3], b[3])
    assert not np.allclose(a[2], b[2])


def test_xor_colliding_key_sets_differ():
    """Two key sets with identical XOR-reduction must not produce
    identical omega fields (round-1 failure mode)."""
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas

    z = jnp.linspace(-2.0, 2.0, 640)
    f = jax.jit(jax.vmap(pg_devroye_pallas, in_axes=(0, None)))
    keys = jax.random.split(jax.random.key(5), 2)
    kd = jax.random.key_data(keys)
    delta = jnp.asarray([0xDEADBEEF, 0x12345678], dtype=kd.dtype)
    keys_xored = jax.random.wrap_key_data(kd ^ delta[None, :])
    a = np.asarray(f(keys, z))
    b = np.asarray(f(keys_xored, z))
    assert not np.allclose(a, b)


def test_packed_moments_and_determinism():
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas_packed
    from occuspytial_tpu.ops.polyagamma import pg_mean, pg_var

    keys = jax.random.split(jax.random.key(3), 32)
    for z in (0.0, 1.5, 6.0):
        zs = jnp.full((32, 8192), z)
        d = jax.vmap(pg_devroye_pallas_packed)(keys, zs)
        m, v = float(pg_mean(z)), float(pg_var(z))
        assert abs(float(d.mean()) - m) < 5 * np.sqrt(v / d.size)
        assert abs(float(d.var()) - v) < 0.05 * v + 5e-5
    a = jax.vmap(pg_devroye_pallas_packed)(keys, jnp.ones((32, 512)))
    b = jax.vmap(pg_devroye_pallas_packed)(keys, jnp.ones((32, 512)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_key_batch_sensitivity():
    """Packed draws are a function of the whole key batch: changing ANY
    chain's key, or permuting the batch, changes the draws; XOR-colliding
    batches do not alias (the block seeds mix per-chain hashes, not raw
    XORs)."""
    from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas_packed

    z = jnp.ones((8, 640))
    keys = jax.random.split(jax.random.key(5), 8)
    base = np.asarray(jax.vmap(pg_devroye_pallas_packed)(keys, z))

    # change one chain's key
    keys2 = keys.at[3].set(jax.random.key(999))
    d2 = np.asarray(jax.vmap(pg_devroye_pallas_packed)(keys2, z))
    assert not np.array_equal(base, d2)

    # permute the batch
    d3 = np.asarray(jax.vmap(pg_devroye_pallas_packed)(keys[::-1], z))
    assert not np.array_equal(base, d3)

    # XOR-colliding pair batches: {a, b} vs {a^x, b^x} share the raw
    # XOR of key words; mixed seeds must still differ
    import jax.random as jr

    ka, kb = jr.key_data(keys[0]), jr.key_data(keys[1])
    x = np.uint32(0xDEADBEEF)
    kc = jr.wrap_key_data((ka ^ x).astype(ka.dtype))
    kd = jr.wrap_key_data((kb ^ x).astype(kb.dtype))
    pair1 = jnp.stack([keys[0], keys[1]])
    pair2 = jnp.stack([kc, kd])
    z2 = jnp.ones((2, 640))
    p1 = np.asarray(jax.vmap(pg_devroye_pallas_packed)(pair1, z2))
    p2 = np.asarray(jax.vmap(pg_devroye_pallas_packed)(pair2, z2))
    assert not np.array_equal(p1, p2)
