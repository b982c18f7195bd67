"""Site-sharded banded graph operator tests on the 8-device CPU mesh.

The irregular-graph counterpart of test_sharded_stencil.py: the
block-tridiagonal layout built by ops/graph.build is split into
contiguous block runs across a ``sites`` mesh axis, and both the halo
matvec and the full deflated CG must reproduce the single-device graph
operators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from occuspytial_tpu.ops import graph
from occuspytial_tpu.parallel.sharded_graph import (
    banded_matvec_sharded,
    cg_solve_sharded,
)
from test_graph import delaunay_precision

SHARDS = 4


@pytest.fixture(scope='module')
def mesh():
    return Mesh(np.asarray(jax.devices()[:SHARDS]), axis_names=('sites',))


@pytest.fixture(scope='module')
def built():
    # 900 sites, forced 128-tiles -> n_pad=1024, nb=8 = 2 blocks/shard
    q = delaunay_precision(900, seed=9)
    spec, arrs = graph.build(q, deflate=24, block=128)
    assert spec.n_pad // spec.block % SHARDS == 0
    return q, spec, arrs


def test_sharded_banded_matvec_matches_dense(mesh, built):
    q, spec, arrs = built
    qd = q.toarray().astype(float)
    nb, bs = spec.n_pad // spec.block, spec.block
    rng = np.random.default_rng(0)
    v = rng.standard_normal((2, spec.n))
    v_pad = np.zeros((2, spec.n_pad), np.float32)
    v_pad[:, : spec.n] = v[:, arrs['gr_perm']]

    fn = jax.shard_map(
        lambda d, s, u, vv: banded_matvec_sharded(d, s, u, vv),
        mesh=mesh,
        in_specs=(
            P('sites', None, None),
            P('sites', None, None),
            P('sites', None, None),
            P(None, 'sites', None),
        ),
        out_specs=P(None, 'sites', None),
    )
    out_p = np.asarray(
        fn(
            jnp.asarray(arrs['gr_bd_diag']),
            jnp.asarray(arrs['gr_bd_sub']),
            jnp.asarray(arrs['gr_bd_sup']),
            jnp.asarray(v_pad.reshape(2, nb, bs)),
        )
    ).reshape(2, spec.n_pad)
    out = out_p[:, : spec.n][:, arrs['gr_iperm']]
    np.testing.assert_allclose(out, v @ qd.T, atol=1e-4)


@pytest.mark.parametrize('deflate', [False, True])
def test_sharded_banded_cg_matches_single_device(mesh, built, deflate):
    q, spec, arrs = built
    fixed = {k: jnp.asarray(v) for k, v in arrs.items()}
    nb, bs = spec.n_pad // spec.block, spec.block
    rng = np.random.default_rng(1)
    omega = rng.uniform(0.05, 0.3, spec.n).astype(np.float32)
    tau = jnp.asarray(3.1, jnp.float32)
    rhs = rng.standard_normal((2, spec.n)).astype(np.float32)

    # single-device truth through the same banded layout
    import dataclasses

    ref_spec = spec if deflate else dataclasses.replace(spec, deflate=0)
    sol_ref = np.asarray(
        graph.cg_solve(
            ref_spec, fixed, jnp.asarray(rhs),
            jnp.zeros_like(jnp.asarray(rhs)),
            jnp.asarray(omega), tau, 64,
        )
    )

    # shard: permute/pad on the host exactly as graph.cg_solve does
    perm = arrs['gr_perm']
    pad = spec.n_pad - spec.n
    rhs_p = np.pad(rhs[:, perm], ((0, 0), (0, pad))).astype(np.float32)
    omega_p = np.pad(
        omega[perm], (0, pad), constant_values=1.0
    ).astype(np.float32)

    defl_vecs = arrs['gr_defl_vecs_p'] if deflate else None
    defl_vals = jnp.asarray(arrs['gr_defl_vals']) if deflate else None

    def solve(d, s, u, r_, o, uv=None):
        return cg_solve_sharded(
            (d, s, u), r_, jnp.zeros_like(r_), o, tau, 64,
            defl_vecs_local=uv, defl_vals=defl_vals,
        )

    panel_specs = (
        P('sites', None, None),
        P('sites', None, None),
        P('sites', None, None),
        P(None, 'sites'),
        P('sites'),
    )
    args = [
        jnp.asarray(arrs['gr_bd_diag']),
        jnp.asarray(arrs['gr_bd_sub']),
        jnp.asarray(arrs['gr_bd_sup']),
        jnp.asarray(rhs_p),
        jnp.asarray(omega_p),
    ]
    if deflate:
        panel_specs = panel_specs + (P('sites', None),)
        args.append(jnp.asarray(defl_vecs))

    # rhs rows replicated over blocks: reshape (r, n_pad) -> block-major
    # sharding happens on the flat padded axis, which IS block-major
    fn = jax.shard_map(
        solve, mesh=mesh, in_specs=panel_specs,
        out_specs=P(None, 'sites'),
    )
    sol_p = np.asarray(fn(*args))
    sol = sol_p[:, : spec.n][:, arrs['gr_iperm']]
    np.testing.assert_allclose(sol, sol_ref, atol=3e-4)

    # and against the dense solve, to be sure both agree with truth
    qd = q.toarray().astype(np.float64)
    lam = 3.1 * qd + np.diag(omega.astype(np.float64))
    expected = np.linalg.solve(lam, rhs.astype(np.float64).T).T
    np.testing.assert_allclose(sol, expected, atol=5e-3)
