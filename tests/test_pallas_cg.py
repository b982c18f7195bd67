"""Fused Pallas CG tests (run only on a real TPU backend).

Validates the VMEM-resident spectral CG (ops/pallas_cg.py) against the
XLA reference implementation on identical inputs. The default test
configuration forces CPU, where Mosaic cannot run; the TPU lane
(scripts/tpu_check.py) executes this file on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu = jax.default_backend() == 'tpu'

pytestmark = pytest.mark.skipif(not tpu, reason='requires TPU backend')


def _problem(n=1000, b=8, rows=6, seed=0):
    from occuspytial_tpu.ops import icar
    from occuspytial_tpu.utils import make_data

    Q, W, X, y, *_ = make_data(n=n, ns=n // 2, random_state=7)
    qd = jnp.asarray(icar.to_dense(Q), jnp.float32)
    s_eig, u_eig, _ = icar.icar_spectral(np.asarray(qd))
    rng = np.random.default_rng(seed)
    rhs = jnp.asarray(rng.standard_normal((b, rows, n)), jnp.float32)
    omega = jnp.asarray(rng.uniform(0.02, 0.3, (b, n)), jnp.float32)
    tau = jnp.asarray(rng.uniform(1.0, 5.0, (b,)), jnp.float32)
    return (qd, jnp.asarray(u_eig, jnp.float32),
            jnp.asarray(s_eig, jnp.float32), rhs, omega, tau)


def test_fused_cg_matches_xla():
    from occuspytial_tpu.ops.cg import icar_cg_solve
    from occuspytial_tpu.ops.pallas_cg import icar_cg_solve_fused

    qd, u, s, rhs, omega, tau = _problem()
    x0 = jnp.zeros_like(rhs)
    a = jax.jit(jax.vmap(
        lambda r, x, o, t: icar_cg_solve(r, x, o, t, qd, u, s, 15)
    ))(rhs, x0, omega, tau)
    b = jax.jit(jax.vmap(
        lambda r, x, o, t: icar_cg_solve_fused(r, x, o, t, u, s, 15)
    ))(rhs, x0, omega, tau)
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    # both run MXU matmuls at default (bf16) precision; they agree up
    # to that rounding
    assert np.abs(a - b).max() / np.abs(a).max() < 2e-2


def test_fused_cg_unbatched():
    from occuspytial_tpu.ops.pallas_cg import icar_cg_solve_fused

    qd, u, s, rhs, omega, tau = _problem(b=1)
    out = icar_cg_solve_fused(
        rhs[0], jnp.zeros_like(rhs[0]), omega[0], tau[0], u, s, 15
    )
    assert out.shape == rhs[0].shape
    assert bool(jnp.isfinite(out).all())
