"""Fused VMEM-resident CG solve for the dense spectral ICAR path.

The XLA CG (ops/cg.py) executes ~10 small ops per iteration inside the
sampling scan; at 15 iterations that is ~150 sequentially-launched ops
whose fixed launch latency — not their compute — dominates the eta solve
on TPU. This kernel runs the whole preconditioned CG loop in one Pallas
program: the eigenvector basis stays resident in VMEM across grid steps
(constant block index), every basis transform is an MXU ``dot`` against
it, and nothing touches HBM between iterations.

Every row of the batch is an *independent* linear system (CG's alpha and
beta are per-row scalars), so all chains' right-hand sides flatten into
one row-batch with per-row operator data — which also feeds the 128x128
MXU full-height operands instead of one chain's handful of rows.

The iteration runs in Q's EIGENBASIS, exactly like the XLA path
(ops/cg.py:icar_cg_solve_spectral): with ``Q = U S U'`` the operator
conjugates to

    A_spec v = tau * S * v + U' diag(omega) U v
    M^{-1} r = r / (tau S + mean(omega))        (exactly diagonal, free)

so the stiff ``tau*S`` term is applied as an elementwise scale — EXACT
at any tau — and only the bounded ``omega`` deviation term goes through
the two per-iteration MXU matmuls. An earlier revision of this kernel
iterated in the *site* basis (``tau * U S U' v`` as matmuls): its
recursive residual converged while its true residual grew like
O(eps_bf16 * tau) — at the sampler's cold-start tau ~ 1e2 the one-pass
bf16 rounding of the tau term swamped diag(omega) entirely (measured
true relative residual 19 at tau=400 vs 0.39 for the eigenbasis form on
the same system). The eigenbasis form matches the XLA path's numerics
by construction and does 2 matmuls per iteration instead of 3.

Numerics: MXU matmuls at the default one-pass bf16 precision (see
ops/cg.py for why that is statistically sufficient and 2.5x cheaper
than full-f32 emulation).

Kept as a validated alternative (``LogitICARGibbs(cg_impl='pallas')``);
the default is 'xla' (measured round 2, site-basis kernel: 844 vs 774
it/s — see docs/design.md for the current comparison).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8
_BLOCK_ROWS = 128


def _cg_kernel(u_ref, taus_ref, pinv_ref, rhs_ref, x0_ref,
               omega_ref, out_ref, spec_ref, res_ref, *, iters):
    u = u_ref[:]
    tau_s = taus_ref[:]     # (rows, n) per-row tau * eigvals
    pinv = pinv_ref[:]      # (rows, n) per-row 1 / (tau*S + mean(omega))
    omega = omega_ref[:]    # (rows, n) site-basis omega
    tiny = jnp.float32(1e-30)

    def _dot_ut(v):
        # v @ U' via dot_general contracting U's second dim: avoids a
        # resident transposed copy of U (VMEM budget)
        return lax.dot_general(
            v, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def matvec(v):
        # eigenbasis operator: exact diagonal tau term + transformed
        # omega term (one round trip to site basis and back)
        v_site = _dot_ut(v)
        return tau_s * v + jnp.dot(
            omega * v_site, u, preferred_element_type=jnp.float32
        )

    def precond(r):
        return pinv * r

    # rhs arrives in the site basis; one in-transform, like the XLA path
    b_spec = jnp.dot(rhs_ref[:], u, preferred_element_type=jnp.float32)
    x0 = x0_ref[:]          # warm start, already in the eigenbasis
    r0 = b_spec - matvec(x0)
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0, axis=-1, keepdims=True)

    def body(_, carry):
        x, r, p, rz = carry
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=-1, keepdims=True)
        alpha = rz / jnp.maximum(denom, tiny)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
        beta = rz_new / jnp.maximum(rz, tiny)
        return x, r, z + beta * p, rz_new

    x, r, _, _ = lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
    out_ref[:] = _dot_ut(x)     # site-basis solution
    spec_ref[:] = x             # eigenbasis solution (warm-start carry)
    # final recursively-updated residual (eigenbasis — identical to
    # site-basis norms up to the orthogonal transform's rounding), for
    # the sampler's in-run health monitor (same metric as
    # ops/cg.py:pcg return_resid=True); padded rows carry r = 0 exactly
    res_ref[:] = r


def _pad_rows(x, rows, value=0.0):
    if x.shape[0] == rows:
        return x
    return jnp.pad(
        x, ((0, rows - x.shape[0]), (0, 0)), constant_values=value
    )


@functools.partial(jax.jit, static_argnames=('iters',))
def _cg_batched(rhs, x0, omega, tau, eigvecs, eigvals, iters):
    """(B, r, n) fused CG over a flattened (B*r)-row batch.

    ``rhs`` is in the site basis, ``x0`` in the eigenbasis. Padded
    rows/sites stay exactly zero through the iteration: padded eigvals
    are 0, padded U rows/cols are 0 and padded omega is 1, so the
    padded components never mix with real ones and the alpha/beta
    denominators are clamped away from 0/0.
    """
    b, r_rows, n = rhs.shape
    total = b * r_rows
    np_ = -(-n // _LANE) * _LANE
    block = min(_BLOCK_ROWS, -(-total // _SUB) * _SUB)
    tp = -(-total // block) * block

    def flat(x, value=0.0):
        x = x.reshape(total, n)
        x = jnp.pad(x, ((0, 0), (0, np_ - n)), constant_values=value)
        return _pad_rows(x, tp, value)

    rhs_p = flat(rhs)
    x0_p = flat(x0)
    eig_p = jnp.pad(eigvals, (0, np_ - n))[None, :]          # (1, np_)
    omega_p = jnp.pad(
        omega, ((0, 0), (0, np_ - n)), constant_values=1.0
    )
    omega_f = _pad_rows(
        jnp.repeat(omega_p, r_rows, axis=0), tp, value=1.0
    )
    tau_f = jnp.repeat(
        jnp.broadcast_to(tau, (b,)).astype(jnp.float32), r_rows
    )
    cbar_f = jnp.repeat(jnp.mean(omega, axis=-1), r_rows)
    tau_s = _pad_rows(tau_f[:, None] * eig_p, tp)
    pinv = _pad_rows(
        1.0 / (tau_f[:, None] * eig_p + cbar_f[:, None]), tp, value=1.0
    )
    u_p = jnp.pad(eigvecs, ((0, np_ - n), (0, np_ - n)))

    const = pl.BlockSpec(
        (np_, np_), lambda i: (0, 0), memory_space=pltpu.VMEM,
    )
    rows = pl.BlockSpec(
        (block, np_), lambda i: (i, 0), memory_space=pltpu.VMEM,
    )

    out, spec, res = pl.pallas_call(
        functools.partial(_cg_kernel, iters=iters),
        grid=(tp // block,),
        in_specs=[const, rows, rows, rows, rows, rows],
        out_specs=(rows, rows, rows),
        out_shape=(
            jax.ShapeDtypeStruct((tp, np_), jnp.float32),
            jax.ShapeDtypeStruct((tp, np_), jnp.float32),
            jax.ShapeDtypeStruct((tp, np_), jnp.float32),
        ),
        name=f'icar_cg_{tp}x{block}x{np_}x{iters}',
    )(u_p, tau_s, pinv, rhs_p, x0_p, omega_f)
    sol = out[:total, :n].reshape(b, r_rows, n)
    sol_spec = spec[:total, :n].reshape(b, r_rows, n)
    # per-batch-element relative residual: max over that element's rows
    # of ||r_k|| / ||rhs|| (ops/cg.py:pcg's metric, one value per chain
    # under vmap)
    r_fin = res[:total, :n].reshape(b, r_rows, n)
    tiny = jnp.float32(1e-30)
    rel = jnp.sqrt(jnp.max(
        jnp.sum(r_fin * r_fin, axis=-1)
        / jnp.maximum(jnp.sum(rhs * rhs, axis=-1), tiny),
        axis=-1,
    ))
    return sol, sol_spec, rel


@functools.lru_cache(maxsize=None)
def _make_fused(iters):
    @jax.custom_batching.custom_vmap
    def solve(rhs, x0, omega, tau, eigvecs, eigvals):
        sol, spec, rel = _cg_batched(
            rhs[None], x0[None], omega[None],
            jnp.reshape(tau, (1,)), eigvecs, eigvals, iters,
        )
        return sol[0], spec[0], rel[0]

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, rhs, x0, omega, tau, eigvecs,
                   eigvals):
        rb, xb, ob, tb, eb, evb = in_batched
        if eb or evb:
            raise NotImplementedError(
                'the eigenbasis must be chain-invariant'
            )

        def bcast(v, batched):
            if batched:
                return v
            return jnp.broadcast_to(v, (axis_size,) + jnp.shape(v))

        sol, spec, rel = _cg_batched(
            bcast(rhs, rb), bcast(x0, xb), bcast(omega, ob),
            bcast(tau, tb), eigvecs, eigvals, iters,
        )
        return (sol, spec, rel), (True, True, True)

    return solve


def icar_cg_solve_fused(rhs, x0, omega, tau, eigvecs, eigvals, iters,
                        return_resid=False):
    """Fused-kernel analog of :func:`ops.cg.icar_cg_solve_spectral`.

    Same return contract as the XLA spectral CG: ``(x_site, x_spec)``
    — the site-basis solutions plus the eigenbasis solutions to carry
    as the next call's warm start ``x0`` — or ``(x_site, x_spec,
    rel_resid)`` with ``return_resid=True``, where ``rel_resid`` is the
    per-call relative residual scalar (``max_rows ||r_k|| / ||rhs||``,
    the metric of :func:`ops.cg.pcg`) feeding the sampler's in-run
    solver health monitor — previously selecting ``cg_impl='pallas'``
    silently disabled that guardrail. Requires a TPU backend (Mosaic);
    ``iters`` must be a Python int.
    """
    sol, spec, rel = _make_fused(int(iters))(
        rhs, x0, omega, tau, eigvecs, eigvals
    )
    if return_resid:
        return sol, spec, rel
    return sol, spec
