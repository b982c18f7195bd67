"""Fused VMEM-resident CG solve for the dense spectral ICAR path.

The XLA CG (ops/cg.py) executes ~10 small ops per iteration inside the
sampling scan; at 15 iterations that is ~150 sequentially-launched ops
whose fixed launch latency — not their compute — dominates the eta solve
on TPU. This kernel runs the whole preconditioned CG loop in one Pallas
program: the eigenvector basis stays resident in VMEM across grid steps
(constant block index), every matvec/preconditioner transform is an MXU
``dot`` against it, and nothing touches HBM between iterations.

Every row of the batch is an *independent* linear system (CG's alpha and
beta are per-row scalars), so all chains' right-hand sides flatten into
one row-batch with per-row operator data — which also feeds the 128x128
MXU full-height operands instead of one chain's handful of rows.

The operator is applied spectrally: with ``Q = U S U'``,

    Lambda v = tau * ((v U) * S) U' + omega * v
    M^{-1} r = ((r U) / (tau S + mean(omega))) U'

so only ``U`` (and its transpose) is needed — Q itself is never read.
Numerics match the XLA path: MXU matmuls at the default one-pass bf16
precision (see ops/cg.py for why that is statistically sufficient and
2.5x cheaper than full-f32 emulation).

Measured result (TPU v5e, headline config, in-scan, same process): the
XLA loop reaches 844 it/s vs 774 it/s for this kernel — XLA pipelines
the small per-iteration ops well enough that fusing buys nothing, and
both are MXU-bound on the same spectral matmuls. Kept as a validated
alternative (``LogitICARGibbs(cg_impl='pallas')``); the default is
'xla'.
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
               omega_ref, out_ref, *, iters):
    u = u_ref[:]
    tau_s = taus_ref[:]     # (rows, n) per-row operator data
    pinv = pinv_ref[:]
    omega = omega_ref[:]
    tiny = jnp.float32(1e-30)

    def _dot_ut(v):
        # v @ U' via dot_general contracting U's second dim: avoids a
        # resident transposed copy of U (VMEM budget)
        return lax.dot_general(
            v, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def matvec(v):
        vu = jnp.dot(v, u, preferred_element_type=jnp.float32)
        return _dot_ut(vu * tau_s) + omega * v

    def precond(r):
        ru = jnp.dot(r, u, preferred_element_type=jnp.float32)
        return _dot_ut(ru * pinv)

    x0 = x0_ref[:]
    r0 = rhs_ref[:] - matvec(x0)
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

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
    out_ref[:] = x


def _pad_rows(x, rows, value=0.0):
    if x.shape[0] == rows:
        return x
    return jnp.pad(
        x, ((0, rows - x.shape[0]), (0, 0)), constant_values=value
    )


@functools.partial(jax.jit, static_argnames=('iters',))
def _cg_batched(rhs, x0, omega, tau, eigvecs, eigvals, iters):
    """(B, r, n) fused CG over a flattened (B*r)-row batch.

    Padded rows/sites stay exactly zero through the iteration: padded
    eigvals are 0 and padded omega is 1, so Lambda acts as the identity
    on the all-zero padded components, and the alpha/beta denominators
    are clamped away from 0/0.
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

    out = pl.pallas_call(
        functools.partial(_cg_kernel, iters=iters),
        grid=(tp // block,),
        in_specs=[const, rows, rows, rows, rows, rows],
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((tp, np_), jnp.float32),
        name=f'icar_cg_{tp}x{block}x{np_}x{iters}',
    )(u_p, tau_s, pinv, rhs_p, x0_p, omega_f)
    return out[:total, :n].reshape(b, r_rows, n)


@functools.lru_cache(maxsize=None)
def _make_fused(iters):
    @jax.custom_batching.custom_vmap
    def solve(rhs, x0, omega, tau, eigvecs, eigvals):
        out = _cg_batched(
            rhs[None], x0[None], omega[None],
            jnp.reshape(tau, (1,)), eigvecs, eigvals, iters,
        )
        return out[0]

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

        out = _cg_batched(
            bcast(rhs, rb), bcast(x0, xb), bcast(omega, ob),
            bcast(tau, tb), eigvecs, eigvals, iters,
        )
        return out, True

    return solve


def icar_cg_solve_fused(rhs, x0, omega, tau, eigvecs, eigvals, iters):
    """Fused-kernel analog of :func:`ops.cg.icar_cg_solve`.

    Same distribution of CG iterates up to matmul rounding; requires a
    TPU backend (Mosaic). ``iters`` must be a Python int.
    """
    return _make_fused(int(iters))(rhs, x0, omega, tau, eigvecs, eigvals)
