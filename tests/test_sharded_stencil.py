"""Site-sharded lattice operator tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from occuspytial_tpu.ops import stencil
from occuspytial_tpu.ops.icar import lattice_precision
from occuspytial_tpu.parallel.sharded_stencil import (
    cg_solve_sharded,
    matvec_sharded,
)

SHARDS = 4
ROWS, COLS = 16, 20  # 16 rows over 4 shards -> 4-row bands


@pytest.fixture(scope='module')
def mesh():
    return Mesh(np.asarray(jax.devices()[:SHARDS]), axis_names=('sites',))


@pytest.mark.parametrize('neighbors', [4, 8])
def test_sharded_matvec_matches_dense(mesh, neighbors):
    spec = stencil.LatticeSpec(ROWS, COLS, neighbors, 1.0)
    q = lattice_precision(ROWS, COLS, neighbors).toarray().astype(float)
    deg = stencil.degree_grid(spec).astype(np.float32)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((ROWS, COLS)).astype(np.float32)

    fn = jax.shard_map(
        lambda d, vv: matvec_sharded(spec, d, vv),
        mesh=mesh,
        in_specs=(P('sites', None), P('sites', None)),
        out_specs=P('sites', None),
    )
    out = np.asarray(fn(jnp.asarray(deg), jnp.asarray(v))).reshape(-1)
    np.testing.assert_allclose(out, q @ v.reshape(-1), atol=1e-4)


def test_sharded_cg_solves(mesh):
    spec = stencil.LatticeSpec(ROWS, COLS, 8, 1.0)
    q = lattice_precision(ROWS, COLS, 8).toarray().astype(float)
    deg = stencil.degree_grid(spec).astype(np.float32)
    n = spec.n
    rng = np.random.default_rng(1)
    omega = rng.uniform(0.05, 0.3, n).astype(np.float32)
    tau = 2.1
    rhs = rng.standard_normal((3, n)).astype(np.float32)

    def solve(d, r_, o):
        return cg_solve_sharded(
            spec, d, r_, jnp.zeros_like(r_), o,
            jnp.asarray(tau, jnp.float32), 300,
        )

    fn = jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(
            P('sites', None),          # deg (rows, cols)
            P(None, 'sites'),          # rhs (3, n) split over sites
            P('sites',),               # omega (n,)
        ),
        out_specs=P(None, 'sites'),
    )
    out = np.asarray(fn(
        jnp.asarray(deg), jnp.asarray(rhs), jnp.asarray(omega),
    ))
    lam = tau * q + np.diag(omega)
    expected = np.linalg.solve(lam, rhs.T.astype(float)).T
    np.testing.assert_allclose(out, expected, atol=5e-3)
