"""Batched preconditioned conjugate-gradient solver for the eta draw.

The reference solves its per-iteration SPD system ``Lambda x = y``
(``Lambda = tau*Q + diag(omega)``) with a warm-started MINRES on a sparse
block system (reference gibbs/logit.py:80-92). The TPU analog keeps the
warm start but expresses every matvec as a dense batched matmul — a
(rhs, n) x (n, n) contraction that runs on the MXU — and preconditions
*spectrally*: with the one-time eigendecomposition ``Q = U S U'`` (already
computed for the perturbation sqrt-factor, reference gibbs/logit.py:66-67)
the preconditioner ``M = tau*Q + mean(omega)*I`` is applied exactly as

    M^{-1} r = U ((U' r) / (tau*S + mean(omega)))

i.e. two more MXU matmuls per iteration. The preconditioned operator is
``I + (D(omega) - mean(omega) I) M^{-1}``, whose condition number is
bounded by roughly ``max(omega)/min(omega)`` *independently of tau and
n* — CG converges in ~15-25 iterations to far below float32 resolution.

A *fixed* iteration count keeps the program shape-static and the per-step
cost deterministic (no data-dependent while loop in the hot path);
accuracy at the default budget is validated in tests against the exact
dense-Cholesky draw with identical random inputs.
"""

import jax.numpy as jnp
from jax import lax


def pcg(matvec, precond, b, x0, iters, return_resid=False):
    """Preconditioned CG: solve ``A x = b`` for each row of ``b``.

    Shapes: ``b``/``x0`` are (..., n); ``matvec``/``precond`` map
    (..., n) -> (..., n). Runs exactly ``iters`` iterations (static), with
    denominators clamped so converged systems stay frozen.

    With ``return_resid=True`` also returns the final *relative residual*
    scalar ``max_rows ||r_k|| / ||b||`` (recursively-updated residual —
    the standard CG health metric; one extra reduction, no extra
    matvec). The sampler carries a running max of this over the whole
    run, restoring the reference's per-draw MINRES convergence guarantee
    (reference gibbs/logit.py:91-92) for the fixed-budget solvers.
    """
    tiny = jnp.asarray(1e-30, b.dtype)

    # a while_loop (dynamic trip count) rather than fori_loop: the XLA TPU
    # backend aggressively unrolls counted loops nested inside the outer
    # sampling scan, which explodes compile time; a while loop compiles
    # its body exactly once.
    def cond(carry):
        return carry[0] < iters

    def body(carry):
        k, x, r, p, rz = carry
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=-1, keepdims=True)
        alpha = rz / jnp.maximum(denom, tiny)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
        beta = rz_new / jnp.maximum(rz, tiny)
        p = z + beta * p
        return k + 1, x, r, p, rz_new

    r0 = b - matvec(x0)
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0, axis=-1, keepdims=True)
    _, x, r, _, _ = lax.while_loop(
        cond, body, (jnp.asarray(0), x0, r0, z0, rz0)
    )
    if not return_resid:
        return x
    rel = jnp.sqrt(jnp.max(
        jnp.sum(r * r, axis=-1)
        / jnp.maximum(jnp.sum(b * b, axis=-1), tiny)
    ))
    return x, rel


def icar_cg_solve(rhs, x0, omega, tau, q_dense, eigvecs, eigvals, iters):
    """Solve ``(tau*Q + diag(omega)) x = rhs`` for stacked right-hand sides.

    ``rhs``/``x0``: (r, n); ``omega``: (n,); ``tau``: scalar;
    ``eigvecs``/``eigvals``: one-time eigendecomposition of Q. All three
    matmuls per iteration (operator + two-sided preconditioner transform)
    are plain (r, n) x (n, n) contractions; vmapping over chains batches
    them into single MXU calls.
    """
    cbar = jnp.mean(omega)
    pinv = 1.0 / (tau * eigvals + cbar)

    # default (one-pass bf16) matmul precision: measured on the headline
    # config, full-f32 emulation here costs 2.5x the whole Gibbs step,
    # while the bf16 matvec noise does not move the posterior (config-4
    # beta means identical at both precisions) — CG's iteration is
    # self-correcting against unbiased matvec rounding. Residual
    # *evaluation* (solver_residual) does use full precision, since the
    # exact cancellation in Q makes a bf16-evaluated residual look O(1)
    # even for an exact solution.
    def matvec(v):
        return tau * (v @ q_dense) + omega * v

    def precond(r):
        return ((r @ eigvecs) * pinv) @ eigvecs.T

    return pcg(matvec, precond, rhs, x0, iters)


def _mm(v, mat):
    """``v @ mat`` with the vector side cast to the matrix dtype and a
    float32 accumulator.

    When ``mat`` is stored bfloat16 this is numerically identical to the
    float32 matmul under the TPU's default (one-pass bf16) precision —
    both round each operand to bfloat16 per pass and accumulate f32 on
    the MXU — but the HBM read of the matrix is HALF the bytes. The
    spectral CG is HBM-bound on exactly those reads (~100 re-streams of
    the n x n eigenbasis per Gibbs step at the headline size), so the
    storage dtype, not the math, is the lever. With an f32 ``mat`` this
    reduces to the plain matmul.
    """
    return jnp.matmul(
        v.astype(mat.dtype), mat, preferred_element_type=v.dtype
    )


def icar_cg_solve_spectral(
    rhs, warm_spec, omega, tau, eigvecs, eigvals, iters,
    return_resid=False,
):
    """Eigenbasis variant of :func:`icar_cg_solve`: 2 matmuls/iteration.

    The same preconditioned Krylov iteration conjugated by the orthogonal
    eigenbasis ``Q = U S U'``: the operator becomes ``tau*S + U'DU``
    (one round trip to site basis and back per application) and the
    spectral preconditioner ``tau*Q + mean(omega)*I`` becomes an exactly
    diagonal — free — rescale. That drops the per-iteration matmul count
    from 3 to 2 at identical iterates (in exact arithmetic the two
    solvers generate the same Krylov sequence), which is a ~30% cut of
    the solver cost that dominates the large-n Gibbs step.

    ``warm_spec`` is the previous call's solution *in the eigenbasis*
    (second element of the return), so warm starts add no transforms:
    per solve the only extras are one in-transform of ``rhs`` and one
    out-transform of the solution.

    ``eigvecs`` may be stored bfloat16 (see :func:`_mm`): same per-pass
    rounding as the default TPU matmul precision, half the HBM traffic.

    Returns ``(x_site, x_spec)``, or ``(x_site, x_spec, rel_resid)``
    with ``return_resid=True`` (residual norms are measured in the
    eigenbasis — identical to site-basis norms up to the orthogonal
    transform's rounding).
    """
    cbar = jnp.mean(omega)
    dinv = 1.0 / (tau * eigvals + cbar)
    b_spec = _mm(rhs, eigvecs)

    def matvec(v):
        return tau * eigvals * v + _mm(omega * _mm(v, eigvecs.T), eigvecs)

    def precond(r):
        return dinv * r

    out = pcg(matvec, precond, b_spec, warm_spec, iters,
              return_resid=return_resid)
    if return_resid:
        x_spec, rel = out
        return _mm(x_spec, eigvecs.T), x_spec, rel
    x_spec = out
    return _mm(x_spec, eigvecs.T), x_spec
