"""Logit-link Gibbs samplers with ICAR / RSR spatial random effects.

TPU-native re-design of reference gibbs/logit.py (Clark & Altwegg 2019,
Pólya-Gamma augmentation). Every update of the reference's mutable
``step()`` (reference gibbs/logit.py:254-266) becomes a segment of one pure
transition function over static-shape arrays:

- the ragged per-site gathers of ``_update_omega_a`` / ``_update_z``
  (reference gibbs/logit.py:180-193, 234-252: Python site lists,
  ``Data`` concatenation, ``np.multiply.reduceat``) are replaced by masked
  dense reductions over the padded (n_sites, v_max) visit grid;
- the Pólya-Gamma C library draws (reference gibbs/logit.py:191, 202)
  are replaced by the vectorized Devroye sampler in
  :mod:`occuspytial_tpu.ops.polyagamma`;
- the warm-started MINRES eta draw (reference gibbs/logit.py:73-99) is
  replaced by an exact Cholesky factor-and-solve with kriging projection
  (:func:`occuspytial_tpu.ops.mvnorm.constrained_icar_mvnorm`);
- the Cython LAPACK ``precision_mvnorm`` (reference distributions.pyx)
  is replaced by its jitted analog.

The update order matches reference gibbs/logit.py:254-266 exactly:
omega_b -> tau -> eta -> beta -> omega_a -> alpha -> z.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import icar
from ..ops.mvnorm import (
    constrained_icar_mvnorm,
    precision_mvnorm,
    rsr_mvnorm,
    sum_to_zero,
)
from ..ops.polyagamma import pg_devroye, pg_gamma
from ..ops.stencil import LatticeSpec
from ..ops import stencil
from ..ops import graph as graph_ops
from . import etasetup
from .base import GibbsBase
from .interweave import log_tau_move

#: below this site count the dense Cholesky eta draw wins; above it the
#: warm-started CG draw does (batched matmuls on the MXU instead of the
#: sequential batched factorization)
_CG_AUTO_THRESHOLD = 512

#: above this site count a *sparse* Q auto-selects the matrix-free graph
#: path ('cg' would dense-eigendecompose Q at O(n^3) setup cost)
_GRAPH_AUTO_THRESHOLD = 4096


def auto_graph_rank(n_sites):
    """Default deflation-basis rank for the graph solver: ~5% of the
    site count rounded to a 64 multiple, floored at 64, capped at 512.

    Measured policy (2026-08-20 sweeps on the 10k-site lattice-as-graph
    problem, scripts/graph_sweep.py): the thin deflation matmuls cost
    ~nothing through rank 512 while each step up in rank cuts the
    fixed-budget CG residual severalfold — rank buys iteration budget.
    The round-5 sweep moved the optimum from (384, 10) to (512, 7):
    326.7 it/s vs 300 on the 10k config at in-run residual max 0.066
    (3x under the guardrail; 384 needs 10 iters to reach 0.018, and
    (512, 6)'s 0.151 leaves too little margin for harder seeds).
    Shared by the logit and probit graph regimes; the basis is stored
    bfloat16 on TPU (preconditioner-only rounding, halves its HBM
    footprint — measured speed-neutral).
    """
    raw = max(64, int(n_sites) // 20)
    return min(512, ((raw + 63) // 64) * 64)


class LogitICARGibbs(GibbsBase):
    """Gibbs sampler using logit link and the ICAR spatial model.

    Parity target: reference gibbs/logit.py:102-266. The eta conditional is
    the hyperplane-truncated MVN of reference gibbs/logit.py:16-99.

    TPU extras: ``pg_method`` selects the Pólya-Gamma sampler
    ('devroye' = exact rejection, 'gamma' = truncated-series with exact
    tail-mean correction, 'pallas' = exact rejection as a fused on-core
    TPU kernel, 'pallas_packed' = the same kernel with several chains
    grouped per grid block — fastest on TPU; both Pallas variants keep
    the per-chain key contract: a chain's draws are a function of its
    own key alone, invariant to batch size/order; see
    ops/polyagamma.py, ops/pallas_pg.py);
    ``solver`` selects the eta linear solver ('chol' = exact dense
    Cholesky, 'cg' = warm-started spectrally-preconditioned CG — the TPU
    analog of the reference's warm-started MINRES, gibbs/logit.py:80-92,
    running entirely on MXU matmuls; 'stencil' = the O(n) matrix-free
    lattice path; 'graph' = the matrix-free path for ARBITRARY sparse
    adjacency graphs — padded neighbor-list gathers with a deflated-
    Jacobi preconditioner (ops/graph.py), covering the irregular
    county/region graphs the reference's sparse MINRES handles; None =
    automatic by problem size and sparsity) and ``cg_iters`` its fixed
    iteration budget. ``graph_rank`` sets the deflation basis size for
    ``solver='graph'`` (bottom eigenmodes of Q, one-time host Lanczos).
    """

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None,
        dtype=jnp.float32, pg_method=None, solver=None, cg_iters=None,
        lattice=None, blocked=True, cg_impl=None, asis=True,
        asis_sd=1.2, asis_steps=12, asis_method='mh',
        solver_check_tol=0.2, graph_rank=None, graph_block='auto',
        spatial_sweeps=None, eig_dtype=None,
    ):
        if eig_dtype is None:
            # storage dtype of the spectral-CG eigenbasis. The CG's
            # matmuls already run at the TPU default one-pass-bf16
            # precision (ops/cg.py), so bfloat16 STORAGE is numerically
            # the same rounding — but the solver is HBM-bound on
            # re-streaming this n x n matrix (~100x per Gibbs step at
            # n=1000), so halving its bytes buys real wall time
            # (measured: see ops/cg.py:_mm). On CPU (the test lane)
            # matmuls are genuine f32, so keep full precision there.
            eig_dtype = (
                jnp.bfloat16 if jax.default_backend() == 'tpu'
                and dtype == jnp.float32 else dtype
            )
        self.eig_dtype = jnp.dtype(eig_dtype)
        if asis_method not in ('mh', 'slice'):
            raise ValueError(f'unknown asis_method: {asis_method!r}')
        self.asis_method = asis_method
        if spatial_sweeps is not None:
            spatial_sweeps = int(spatial_sweeps)
            if spatial_sweeps < 1:
                raise ValueError('spatial_sweeps must be >= 1')
        self.spatial_sweeps = spatial_sweeps
        self.blocked = bool(blocked)
        self.solver_check_tol = (
            None if solver_check_tol is None else float(solver_check_tol)
        )
        self._solver_checked = False
        self.asis = bool(asis)
        self.asis_sd = float(asis_sd)
        self.asis_steps = int(asis_steps)
        if cg_impl is None:
            # measured on the headline config: the XLA loop pipelines
            # better than the fused Pallas kernel (844 vs 774 it/s),
            # so 'xla' is the default on every backend; 'pallas'
            # (ops/pallas_cg.py) is kept as a validated alternative
            cg_impl = 'xla'
        if cg_impl not in ('xla', 'pallas'):
            raise ValueError(f'unknown cg_impl: {cg_impl!r}')
        self.cg_impl = cg_impl
        if pg_method is None:
            # fused on-core kernel on TPU (chains grouped per grid
            # block with per-chain seeding — the packing perf without
            # the old whole-batch key coupling, see
            # ops/pallas_pg.py:_pg_kernel_grouped); portable sampler
            # elsewhere
            pg_method = (
                'pallas_packed' if jax.default_backend() == 'tpu'
                else 'devroye'
            )
        if pg_method not in (
            'devroye', 'gamma', 'pallas', 'pallas_packed'
        ):
            raise ValueError(f'unknown PG sampling method: {pg_method!r}')
        if solver not in (None, 'chol', 'cg', 'stencil', 'graph'):
            raise ValueError(f'unknown eta solver: {solver!r}')
        self.pg_method = pg_method
        self.lattice = None
        if lattice is not None:
            self.lattice = (
                lattice if isinstance(lattice, LatticeSpec)
                else LatticeSpec(*lattice)
            )
            if solver in (None, 'stencil'):
                solver = 'stencil'
        if solver == 'stencil' and self.lattice is None:
            raise ValueError(
                "solver='stencil' requires the `lattice` argument"
            )
        n_sites = np.asarray(X).shape[0]
        if graph_rank is None:
            graph_rank = auto_graph_rank(n_sites)
        self.graph_rank = int(graph_rank)
        self.graph_block = graph_block
        self.graph = None
        if solver is None:
            import scipy.sparse as sps

            if sps.issparse(Q) and n_sites >= _GRAPH_AUTO_THRESHOLD:
                # a dense eigendecomposition of Q (the 'cg' setup cost)
                # stops being a sane default here; the matrix-free
                # graph path needs only a one-time sparse Lanczos
                solver = 'graph'
            else:
                solver = 'cg' if n_sites >= _CG_AUTO_THRESHOLD else 'chol'
        self.solver = solver
        if cg_iters is None:
            # measured per-regime budgets:
            # - 'cg' (spectral preconditioner, exact in Q's eigenbasis):
            #   the COLD residual saturates at the f32 floor by 6
            #   iterations at the headline size (1.0e-3 for budgets
            #   6/8/10/15 alike), warm in-loop solves only do better,
            #   and the 2026-08-20 seed sweep shows cg8 posterior means
            #   z-identical to cg15 with +15-26% ESS/s (mean over seeds
            #   7-9: 5462 vs 4736); 8 keeps a 2-iteration margin over
            #   the measured knee.
            # - 'stencil' (DCT preconditioner): stationary residual
            #   2.4e-6 at 12 iterations on the 10k lattice; 15 has
            #   margin.
            # - 'graph' (deflated Jacobi + rank-scaled deflation): the
            #   2026-08-20 (rank, iters) sweeps at 10k sites show
            #   ESS/s is ~pure iteration count while the deflation rank
            #   sets the residual, so the budget is paired with the
            #   RESOLVED rank (auto or caller-passed): rank 512 at 7
            #   iters measures in-run residual max 0.066 (3x under the
            #   0.2 guardrail) and 314.5 ESS/s; rank 384 needs 10 iters
            #   for residual 0.018 (301 ESS/s); a weak basis (rank <
            #   256, e.g. the old default 64) keeps the conservative
            #   24-iteration budget that holds its residual near
            #   8.7e-4. Harder graphs that starve any budget trip the
            #   cold-start check or the in-run monitor loudly.
            if self.solver == 'graph':
                if self.graph_rank >= 512:
                    cg_iters = 7
                elif self.graph_rank >= 256:
                    cg_iters = 10
                else:
                    cg_iters = 24
            else:
                cg_iters = {'cg': 8}.get(self.solver, 15)
        self.cg_iters = int(cg_iters)
        if self.spatial_sweeps is None:
            # measured policy (TPU), per solver regime. 'cg' (mid-size
            # n, tau-binding): 3 sub-sweeps — seed-robust optimum on the
            # headline n=1000 config (M=2/3/4 mean ESS/s 4190/4860/4264
            # over seeds 7-9; M=3 wins every seed). 'chol' (small n):
            # 2 — the binding parameter there is on the detection side,
            # so a third spatial sweep only pays cost (n=100 single
            # chain: M=2 176 ESS/s, M=3 106-117). Matrix-free large-n
            # paths ('stencil'/'graph', eta solve dominates): 1 — extra
            # sweeps halve it/s for no worst-parameter gain (10k-site
            # stencil: 341 -> 192 ESS/s, beta-binding).
            self.spatial_sweeps = {'cg': 3, 'chol': 2}.get(
                self.solver, 1
            )
        self._needs_dense_q = self.solver not in ('stencil', 'graph')
        super().__init__(
            Q, W, X, y, hparams, random_state, dtype=dtype,
        )

    def _static_config(self):
        return super()._static_config() + (
            ('pg_method', self.pg_method),
            ('solver', self.solver),
            ('cg_iters', self.cg_iters),
            ('cg_impl', self.cg_impl),
            ('lattice', self.lattice),
            ('graph', self.graph),
            ('_needs_dense_q', self._needs_dense_q),
            ('blocked', self.blocked),
            ('asis', self.asis),
            ('asis_sd', self.asis_sd),
            ('asis_steps', self.asis_steps),
            ('asis_method', self.asis_method),
            ('spatial_sweeps', self.spatial_sweeps),
        )

    def _configure(self, Q, x_np, hparams):
        super()._configure(Q, x_np, hparams)
        if self.solver == 'stencil':
            self.fixed.update(etasetup.setup_stencil(self.lattice, Q,
                                                     self.n))
            return
        if self.solver == 'graph':
            # NB the banded CG panels stay float32 even on TPU — unlike
            # the spectral eigenbasis (eig_dtype), elementwise rounding
            # of Q's entries destroys the ICAR zero-row-sum cancellation
            # (Qv ~ 0 for smooth v needs exact diag/neighbor
            # cancellation): measured cold residual 2.3 with bf16 panels
            # vs 8.7e-4 with f32 on a 20x20 lattice, i.e. the CG stops
            # converging outright. See docs/design.md "10k-site
            # configs".
            # the deflation BASIS shares eig_dtype's storage policy
            # (bf16 on TPU): it only shapes the preconditioner, so
            # rounding it is safe where rounding the panels is not
            self.graph, arrays = etasetup.setup_graph(
                Q, self.n, self.graph_rank, self.graph_block,
                basis_dtype=self.eig_dtype,
            )
            self.fixed.update(arrays)
            return
        # one-time dense eigendecomposition of the singular ICAR precision
        # (reference gibbs/logit.py:64-67); also powers the spectral CG
        # preconditioner when solver='cg'
        s_eig, u_eig, sqrt_factor = icar.icar_spectral(self.fixed['Q'])
        self.fixed['sqrt_factor'] = sqrt_factor
        if self.solver == 'cg':
            self.fixed['q_eigvals'] = s_eig
            self.fixed['q_eigvecs'] = jnp.asarray(u_eig, self.eig_dtype)

    def _pg(self, key, z):
        if self.pg_method == 'gamma':
            return pg_gamma(key, z)
        if self.pg_method == 'pallas':
            from ..ops.pallas_pg import pg_devroye_pallas

            return pg_devroye_pallas(key, z)
        if self.pg_method == 'pallas_packed':
            from ..ops.pallas_pg import pg_devroye_pallas_packed

            return pg_devroye_pallas_packed(key, z)
        return pg_devroye(key, z)

    def _init_state(self, key, fixed):
        state = self._init_common(key, fixed)
        if self.solver in ('cg', 'stencil', 'graph'):
            # CG warm-start carries: solutions of Lambda^{-1} against the
            # per-iteration right-hand sides ([y, 1] unblocked;
            # [Omega X cols, k, 1, y] blocked)
            rows = (self.n_beta + 3) if self.blocked else 2
            state['eta_warm'] = jnp.zeros((rows, self.n), self.dtype)
            # running max of per-solve relative residuals (see
            # _track_resid); checked on sample() return
            state['solver_resid'] = jnp.zeros((), self.dtype)
        return state

    # ----------------- shared Lambda = tau*Q + diag(omega) ------------- #

    def _lambda_solve(self, rhs, warm, omega, tau, fixed,
                      return_resid=False):
        """Solve Lambda X = rhs for stacked rows.

        Returns ``(sol, warm_next)``: the site-basis solutions plus the
        carry to seed the next iteration's solve. Iterative paths
        warm-start from ``warm``; for the default XLA CG the carry lives
        in Q's eigenbasis (see ops/cg.py:icar_cg_solve_spectral — same
        shape, two matmuls per iteration instead of three), for every
        other path it is the site-basis solution itself.

        ``return_resid=True`` appends the solve's final relative
        residual (scalar) for in-run health monitoring — see
        :meth:`_track_resid`. Every iterative path (including the fused
        Pallas CG) reports its true residual; only the exact Cholesky
        path reports 0.0, i.e. "exact, nothing to monitor"."""
        if self.solver == 'stencil':
            out = stencil.cg_solve(
                self.lattice, fixed, rhs, warm, omega, tau,
                self.cg_iters, return_resid=return_resid,
            )
            if return_resid:
                return out[0], out[0], out[1]
            return out, out
        if self.solver == 'graph':
            out = graph_ops.cg_solve(
                self.graph, fixed, rhs, warm, omega, tau, self.cg_iters,
                return_resid=return_resid,
            )
            if return_resid:
                return out[0], out[0], out[1]
            return out, out
        if self.solver == 'cg':
            if self.cg_impl == 'pallas':
                from ..ops.pallas_cg import icar_cg_solve_fused

                # same warm-start contract as the XLA spectral path:
                # the carry is the solution in Q's eigenbasis
                return icar_cg_solve_fused(
                    rhs, warm, omega, tau,
                    fixed['q_eigvecs'].astype(self.dtype),
                    fixed['q_eigvals'], self.cg_iters,
                    return_resid=return_resid,
                )
            from ..ops.cg import icar_cg_solve_spectral

            return icar_cg_solve_spectral(
                rhs, warm, omega, tau,
                fixed['q_eigvecs'], fixed['q_eigvals'], self.cg_iters,
                return_resid=return_resid,
            )
        lam = tau * fixed['Q'] + jnp.diag(omega)
        chol = jnp.linalg.cholesky(lam)
        sol = jax.scipy.linalg.cho_solve((chol, True), rhs.T).T
        if return_resid:
            return sol, sol, jnp.zeros((), self.dtype)
        return sol, sol


    def _lambda_noise(self, key, tau, fixed):
        """sqrt(tau) * B eps with B B' = Q, per the configured solver."""
        if self.solver == 'stencil':
            return jnp.sqrt(tau) * stencil.noise(
                self.lattice, fixed['lat_deg'], key, self.dtype
            )
        if self.solver == 'graph':
            return jnp.sqrt(tau) * graph_ops.noise(
                self.graph, fixed, key, self.dtype
            )
        sf = fixed['sqrt_factor']
        eps = jax.random.normal(key, (sf.shape[1],), self.dtype)
        return jnp.sqrt(tau) * (sf @ eps)

    def solver_residual(self, carry=None):
        """Max relative residual of the configured eta solver (diagnostic).

        Builds the blocked update's right-hand sides at a representative
        state (the initial carry, or a supplied one), runs the configured
        solver *cold* (no warm start — in-loop solves only do better), and
        returns ``max_i ||Lambda x_i - b_i|| / ||b_i||``. Use this to
        detect an under-budgeted fixed-iteration CG at scale: the exact
        Cholesky path reports ~1e-6, a converged CG <1e-3, and a starved
        CG orders of magnitude more. (The reference's MINRES raised on
        non-convergence, gibbs/logit.py:91-92; the fixed-budget TPU solver
        trades that for this explicit check.)
        """
        if carry is None:
            carry = self.init_carry(chains=1)
        _, states = carry

        # one jitted program with states/fixed as ARGUMENTS: tracing
        # them eagerly would embed the operator arrays (e.g. the banded
        # tile panels) as HLO constants, which XLA then constant-folds
        # at enormous compile cost (measured 110s vs 9s at 10k sites)
        # and outside the persistent compilation cache. The chain-0
        # slicing also happens INSIDE the program: dispatching ~8 eager
        # slice programs first left the final readback waiting on them
        # for 20-400s (variable) on the tunneled TPU runtime.
        def resid_fn(states, fixed):
            state = {k: v[0] for k, v in states.items()}
            lin_b = fixed['X'] @ state['beta'] + state['spatial']
            omega = pg_devroye(jax.random.key(0), lin_b)
            tau = jnp.asarray(state['tau'], self.dtype)
            k_vec = state['z'] - 0.5
            x = fixed['X']
            rhs = jnp.concatenate(
                [
                    omega * x.T,
                    k_vec[None, :],
                    jnp.ones((1, self.n), self.dtype),
                ],
                0,
            )
            sol, _ = self._lambda_solve(
                rhs, jnp.zeros_like(rhs), omega, tau, fixed
            )
            if self.solver == 'stencil':
                qsol = jax.vmap(
                    lambda v: stencil.matvec(
                        self.lattice, fixed['lat_deg'], v
                    )
                )(sol)
            elif self.solver == 'graph':
                # gather-based matvec: exact f32, no precision caveat
                qsol = graph_ops.matvec(fixed, sol)
            else:
                # full-precision evaluation: the default one-pass-bf16
                # TPU matmul cannot measure a small residual through the
                # exact cancellation in Q (zero row sums)
                qsol = jnp.matmul(sol, fixed['Q'].T, precision='highest')
            resid = tau * qsol + omega * sol - rhs
            rel = (
                jnp.linalg.norm(resid, axis=1)
                / jnp.linalg.norm(rhs, axis=1)
            )
            return jnp.max(rel)

        # AOT lower/compile/call rather than a plain jit(...)(...) call:
        # on the tunneled TPU runtime the one-shot dispatch path for this
        # program stalls pathologically (measured 42s->10min+, high
        # variance) while the identical AOT-compiled executable runs in
        # milliseconds; the scan runner is unaffected, only this one-off
        # diagnostic program hit it
        fixed = dict(self.fixed)
        states = dict(states)
        compiled = jax.jit(resid_fn).lower(states, fixed).compile()
        return float(compiled(states, fixed))

    def init_carry(self, chains=2, start=None):
        """Build the resumable carry, then run the one-time solver
        accuracy check (see :meth:`_check_solver_accuracy`)."""
        carry = super().init_carry(chains, start)
        self._check_solver_accuracy(carry)
        return carry

    def _check_solver_accuracy(self, carry):
        """In-run guardrail for the fixed-budget iterative solvers.

        The reference raises when its MINRES eta solve fails to converge
        (reference gibbs/logit.py:91-92); the rebuild's CG/stencil paths
        run a *fixed* iteration budget inside the compiled scan, so a
        mis-budgeted ``cg_iters`` at a new problem size would silently
        bias the posterior instead. This runs :meth:`solver_residual`
        once per sampler instance when the first carry is built and
        raises above ``solver_check_tol`` (set it to None to skip, e.g.
        for deliberate low-accuracy experiments).

        Threshold calibration (measured, n=1000 headline): a converged
        spectral CG reports ~5e-4 cold on CPU and ~4e-2 on TPU (the
        one-pass-bf16 matmul floor); a starved budget (cg_iters=1)
        reports ~1. The default 0.2 sits an order of magnitude from
        both sides.
        """
        if (
            self.solver not in ('cg', 'stencil', 'graph')
            or self.solver_check_tol is None
            or self._solver_checked
            # subclasses that override the eta conditional (RSR: dense
            # q-dim draw) never route through _lambda_solve
            or type(self)._update_eta is not LogitICARGibbs._update_eta
        ):
            return
        self._solver_checked = True
        resid = self.solver_residual(carry)
        if resid > self.solver_check_tol:
            raise RuntimeError(
                f'eta solver ({self.solver!r}, cg_iters={self.cg_iters}) '
                f'did not converge: cold-start relative residual '
                f'{resid:.2e} exceeds solver_check_tol='
                f'{self.solver_check_tol:.0e}. Increase cg_iters (or '
                f'pass solver_check_tol=None to bypass this check).'
            )

    def _update_beta_eta_blocked(self, key, state, omega_b, tau, fixed):
        """Collapsed beta draw + conditional eta draw (rebuild addition).

        The reference updates beta | eta and eta | beta separately
        (gibbs/logit.py:211-232); their strong posterior correlation —
        the intercept is confounded with the spatial field level — makes
        the intercept the worst-mixing parameter. Drawing beta from its
        *marginal* conditional (eta integrated out over the constrained
        ICAR Gaussian) removes that correlation from the kernel while
        leaving the stationary distribution untouched:

            S    = X'OX + B - (OX)' C (OX)
            beta ~ N(S^{-1} (X'k + B mu - (OX)' C k), S^{-1})
            eta | beta as before,

        with O = diag(omega_b) and C the hyperplane-constrained
        covariance C v = L^{-1}v - h (1'L^{-1}v)/(1'h), h = L^{-1}1.
        All pieces come from p+2 solves against Lambda (plus one for the
        eta perturbation), batched into the same CG/Cholesky machinery
        as the unblocked path.
        """
        k_beta, k_eps1, k_noise = jax.random.split(key, 3)
        x = fixed['X']
        p = self.n_beta
        k_vec = state['k']
        a_t = omega_b * x.T  # (p, n): rows are columns of Omega X

        # ONE batched solve serves both draws: the eta solve's right-hand
        # side is y = k - Omega X beta + pert, and Lambda^{-1} is linear,
        # so Lambda^{-1} y = gk - sum_j beta_j g_j + Lambda^{-1} pert —
        # every piece except the beta-independent perturbation row is
        # already needed for the collapsed beta draw. The solver is the
        # whole step cost at large n (overhead-bound CG iterations), and
        # this halves it.
        eps1 = jax.random.normal(k_eps1, (self.n,), self.dtype)
        pert = jnp.sqrt(omega_b) * eps1 + self._lambda_noise(
            k_noise, tau, fixed
        )
        rhs = jnp.concatenate(
            [
                a_t,
                k_vec[None, :],
                jnp.ones((1, self.n), self.dtype),
                pert[None, :],
            ],
            0,
        )
        warm = state.get('eta_warm')
        if warm is None:
            warm = jnp.zeros_like(rhs)
        sol, warm_next, rel = self._lambda_solve(
            rhs, warm, omega_b, tau, fixed, return_resid=True
        )
        self._track_resid(state, rel)
        g, gk, h, gp = sol[:p], sol[p], sol[p + 1], sol[p + 2]
        hsum = jnp.sum(h)

        ca = g - (jnp.sum(g, axis=1, keepdims=True) / hsum) * h[None, :]
        ck = gk - (jnp.sum(gk) / hsum) * h

        # Schur complement: difference of two nearly-equal p x p forms —
        # compute both at full f32 (default TPU matmul is one-pass bf16)
        s_mat = (
            jnp.matmul(x.T * omega_b, x, precision='highest')
            + fixed['b_prec']
            - jnp.matmul(a_t, ca.T, precision='highest')
        )
        s_mat = 0.5 * (s_mat + s_mat.T)
        l_vec = x.T @ k_vec + fixed['b_prec_by_mu'] - a_t @ ck
        beta = precision_mvnorm(k_beta, l_vec, s_mat)

        # eta | beta by linearity of the solves, with the kriging
        # projection through h = Lambda^{-1} 1
        eta = sum_to_zero(gk - beta @ g + gp, h)
        if 'eta_warm' in state:
            state['eta_warm'] = warm_next
        return beta, eta

    #: dimension of the spatial field under scaling (ICAR eta lives on
    #: the sum-to-zero subspace; the RSR subclass overrides with q)
    @property
    def _eta_scale_dim(self):
        return self.n - 1

    def _asis_tau(self, key, s, omega_b, fixed):
        """Sufficient/ancillary tau interweave (Yu & Meng 2011 ASIS).

        The sufficient-parameterization conditional tau | eta (the
        reference's only tau update, gibbs/logit.py:206-209) mixes
        through the narrow Gamma(shape + dim/2, .) window around the
        current field's roughness, which couples (tau, eta level,
        intercept) into the chain's slowest mode — measured worst-case
        beta[0] ESS 484 of 127k headline draws. This move reparameterizes
        to the ancillary field ``eta_a = sqrt(tau) * eta`` (whose prior
        N(0, Q^+) is tau-free, so tau's ancillary conditional sees the
        *likelihood*, not the prior) and takes one MH step in log tau:

            log f(log t) = a0*log t - b0*t + A/sqrt(t) - C/t
            A = (k - omega*Xb)' spatial_a,  C = 0.5 sum omega spatial_a^2

        with ``a0 = tau_shape - dim/2`` the implied Gamma hyperprior
        shape (the stored shape is the full-conditional's, reference
        gibbs/base.py:177-186) and spatial_a the ancillary spatial term.
        Composing both parameterizations' exact conditional moves leaves
        the posterior invariant; measured at the headline config it
        lifts beta[0] ESS 28x and tau ESS 69x at unchanged it/s, with
        posterior means z-test-identical to the plain kernel.

        The 1-D move on log tau is delegated to
        :mod:`occuspytial_tpu.models.interweave`. ``asis_method='mh'``
        (default) composes ``asis_steps`` tuned random-walk sub-steps —
        measured lag-1 autocorrelation ~0.005 at the defaults, i.e. an
        effectively exact conditional draw, which is why more sub-steps
        plateau (the residual tau autocorrelation is the cross-sweep
        eta coupling, not this move). ``'slice'`` is an exact
        Neal-style slice sampler: one draw per iteration, self-tuning —
        the robust choice when the problem's tau scale is far from the
        tuned ``asis_sd``. Either way the move is a handful of scalar
        ops per chain, free next to the PG kernel.
        """
        tau = s['tau']
        rt = jnp.sqrt(tau)
        spatial_a = rt * s['spatial']
        xb = fixed['X'] @ s['beta']
        a_lin = jnp.sum((s['k'] - omega_b * xb) * spatial_a)
        c_quad = 0.5 * jnp.sum(omega_b * spatial_a * spatial_a)
        a0 = fixed['tau_shape'] - 0.5 * self._eta_scale_dim
        b0 = fixed['tau_rate']

        def logf(log_t):
            t = jnp.exp(log_t)
            return (
                a0 * log_t - b0 * t
                + a_lin * jax.lax.rsqrt(t) - c_quad / t
            )

        lt = log_tau_move(
            key, jnp.log(tau), logf, self.asis_method,
            self.asis_sd, self.asis_steps, self.dtype,
        )
        new_t = jnp.exp(lt)
        inv_rt = jax.lax.rsqrt(new_t)
        s['tau'] = new_t
        s['eta'] = (rt * s['eta']) * inv_rt
        s['spatial'] = spatial_a * inv_rt
        return s

    # -------------------------- update segments ----------------------- #

    def _update_tau(self, key, eta, fixed):
        """tau ~ Gamma(shape, 0.5 eta'Q eta + rate)
        (reference gibbs/logit.py:206-209)."""
        if self.solver == 'stencil':
            quad = stencil.quad_form(self.lattice, fixed['lat_deg'], eta)
        elif self.solver == 'graph':
            quad = graph_ops.quad_form(fixed, eta)
        else:
            quad = eta @ (fixed['Q'] @ eta)
        # clamp: f32 cancellation can push the PSD quad form slightly
        # negative for smooth fields, flipping the Gamma rate sign
        rate = 0.5 * jnp.maximum(quad, 0.0) + fixed['tau_rate']
        g = jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype)
        return g / rate

    def _update_eta(self, key, state, omega_b, tau, fixed):
        """Constrained ICAR draw (reference gibbs/logit.py:211-217)."""
        xb = fixed['X'] @ state['beta']
        b = state['k'] - omega_b * xb
        if self.solver == 'stencil':
            eta, warm, rel = stencil.constrained_mvnorm(
                self.lattice, fixed, key, b, omega_b, tau,
                state['eta_warm'], self.cg_iters, return_resid=True,
            )
            state['eta_warm'] = warm
            self._track_resid(state, rel)
        elif self.solver == 'graph':
            eta, warm, rel = graph_ops.constrained_mvnorm(
                self.graph, fixed, key, b, omega_b, tau,
                state['eta_warm'], self.cg_iters, return_resid=True,
            )
            state['eta_warm'] = warm
            self._track_resid(state, rel)
        elif self.solver == 'cg':
            # perturbed RHS y ~ N(b, Lambda) plus the constraint column,
            # solved through the shared dispatch (same math as
            # ops/mvnorm.py:constrained_icar_mvnorm_cg, but routed via
            # _lambda_solve so the default impl runs the 2-matmul
            # eigenbasis CG with its spectral warm carry)
            k1, k2 = jax.random.split(key)
            eps1 = jax.random.normal(k1, (self.n,), self.dtype)
            y = b + jnp.sqrt(omega_b) * eps1 + self._lambda_noise(
                k2, tau, fixed
            )
            rhs = jnp.stack([y, jnp.ones_like(y)])
            sol, warm, rel = self._lambda_solve(
                rhs, state['eta_warm'], omega_b, tau, fixed,
                return_resid=True,
            )
            eta = sum_to_zero(sol[0], sol[1])
            state['eta_warm'] = warm
            self._track_resid(state, rel)
        else:
            eta = constrained_icar_mvnorm(
                key, b, omega_b, tau, fixed['Q'], fixed['sqrt_factor']
            )
        return eta, eta  # (eta, spatial)

    def _update_beta(self, key, state, omega_b, spatial, fixed):
        """beta ~ precision MVN (reference gibbs/logit.py:226-232)."""
        x = fixed['X']
        a = (x.T * omega_b) @ x + fixed['b_prec']
        b = x.T @ (state['k'] - omega_b * spatial) + fixed['b_prec_by_mu']
        return precision_mvnorm(key, b, a)

    def _update_alpha(self, key, state, omega_a, fixed):
        """alpha update over currently-occupied surveyed sites.

        Flat-visits version of reference gibbs/logit.py:180-193, 219-224:
        the dynamic ``exists`` site list becomes the per-visit weight
        ``z[visit_site]`` over the flat (total_visits,) layout and the
        stacked-design-matrix products become one (total_visits, n_alpha)
        matmul on the MXU — no padded lanes.
        """
        w = fixed['W_flat']  # (tv, qa)
        wt = state['z'][fixed['visit_site']]  # (tv,)
        a = w.T @ ((wt * omega_a)[:, None] * w) + fixed['a_prec']
        b = w.T @ (wt * (fixed['y_flat'] - 0.5)) + fixed['a_prec_by_mu']
        return precision_mvnorm(key, b, a)

    def _update_z(self, key, state, alpha, beta, spatial, fixed):
        """Masked occupancy update (reference gibbs/logit.py:234-252).

        For surveyed-but-never-observed sites the conditional is
        psi * prod_v (1 - d_v) / (1 - psi + psi * prod_v (1 - d_v));
        with zero visits the product is empty (=1) and the expression
        degenerates to psi — exactly the reference's unsurveyed branch —
        so one fused formula covers both site classes.
        """
        logit_psi = fixed['X'] @ beta + spatial
        # log prod_v sigmoid(-w_v @ alpha) = -sum_v softplus(w_v @ alpha),
        # segment-summed from the flat visit rows to full sites
        # (unsurveyed sites get 0 = empty product)
        lin_a = fixed['W_flat'] @ alpha
        log_prod = jnp.zeros(self.n, lin_a.dtype).at[
            fixed['visit_site']
        ].add(-jax.nn.softplus(lin_a))
        # p = psi*prod / (1 - psi + psi*prod) == sigmoid(logit_psi +
        # log_prod) exactly — the ratio form is 0/0 once psi saturates
        # to 1.0 in float32 under strong non-detection evidence
        p = jax.nn.sigmoid(logit_psi + log_prod)
        draw = (
            jax.random.uniform(key, (self.n,), self.dtype) < p
        ).astype(self.dtype)
        z = jnp.where(fixed['obs'] > 0, jnp.ones((), self.dtype), draw)
        return z, z - 0.5

    # ----------------------------- transition ------------------------- #

    def _step(self, key, state, fixed):
        """One Gibbs iteration (reference gibbs/logit.py:254-266; with
        ``blocked=True`` the separate eta and beta draws are replaced by
        the collapsed update, same stationary distribution).

        The (tau, beta/eta, ASIS) block repeats ``spatial_sweeps`` times
        per Pólya-Gamma draw. Each repeat composes exact conditional
        moves of the same joint (omega is an auxiliary coordinate — its
        conditional does not need refreshing between them), so the
        kernel stays invariant. tau is the chain's worst-mixing
        parameter and the PG kernel ~45% of the step cost, so extra
        nearly-free sub-sweeps buy disproportionate tau decorrelation.
        The default is a measured per-regime policy — see the
        ``spatial_sweeps`` parameter documentation in ``__init__`` (the
        single source of truth): cg 3 (4190/4860/4264 ESS/s for M=2/3/4,
        M=3 wins every seed), chol 2.
        """
        m = self.spatial_sweeps
        keys = jax.random.split(key, 3 + 4 * m)
        s = dict(state)

        # both Pólya-Gamma fields in ONE kernel call: omega_b conditions
        # on the previous (beta, spatial) and omega_a on the previous
        # alpha (it is drawn before alpha updates, reference
        # logit.py:180-193), so both linear predictors are known at step
        # start — fusing them halves the per-step PG launch cost, which
        # dominates the headline config's step time
        lin_b = fixed['X'] @ s['beta'] + s['spatial']
        lin_a = fixed['W_flat'] @ s['alpha']
        omega = self._pg(keys[0], jnp.concatenate([lin_b, lin_a]))
        omega_b, omega_a = omega[: self.n], omega[self.n:]

        for i in range(m):
            tau = self._update_tau(keys[1 + 4 * i], s['eta'], fixed)
            if self.blocked and type(self)._update_eta is \
                    LogitICARGibbs._update_eta:
                beta, eta = self._update_beta_eta_blocked(
                    keys[2 + 4 * i], s, omega_b, tau, fixed
                )
                spatial = eta
                s['tau'], s['eta'], s['spatial'] = tau, eta, spatial
                s['beta'] = beta
            else:
                eta, spatial = self._update_eta(
                    keys[2 + 4 * i], s, omega_b, tau, fixed
                )
                s['tau'], s['eta'], s['spatial'] = tau, eta, spatial
                s['beta'] = self._update_beta(
                    keys[3 + 4 * i], s, omega_b, spatial, fixed
                )
            if self.asis:
                s = self._asis_tau(keys[4 + 4 * i], s, omega_b, fixed)

        s['alpha'] = self._update_alpha(keys[1 + 4 * m], s, omega_a, fixed)
        # condition z on s['spatial'], not the pre-ASIS local: the ASIS
        # move rescales (tau, eta, spatial) jointly, and drawing z against
        # the stale field would break exact invariance of the composed
        # kernel
        s['z'], s['k'] = self._update_z(
            keys[2 + 4 * m], s, s['alpha'], s['beta'], s['spatial'], fixed
        )
        return s


class LogitRSRGibbs(LogitICARGibbs):
    """Logit sampler with Reduced Spatial Regression (Moran basis).

    Parity target: reference gibbs/logit.py:340-485. The Moran-operator
    construction runs once on host (ops/icar.py:moran_basis); eta lives in
    the reduced q-dimensional basis and ``spatial = K @ eta``.
    """

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None, r=0.5, q=None,
        dtype=jnp.float32, pg_method=None, **kwargs,
    ):
        # pg_method=None auto-selects like the ICAR sampler (fused Pallas
        # kernel on TPU): the PG rejection rounds dominate the RSR step,
        # so this is exactly the config where the fused kernel matters.
        # Remaining keyword options (asis, asis_sd, asis_steps, ...) pass
        # straight through to LogitICARGibbs.
        self._rsr_r = r
        self._rsr_q = q
        # the RSR eta draw is a dense q-dimensional MVN — always cheap
        # next to the PG kernel, so the sub-sweep default is 2
        # regardless of what `solver` resolved to (that attribute
        # reflects the never-used full-rank path here). Unlike the
        # full-rank cg regime (auto 3), a third sweep does NOT pay in
        # the reduced basis: measured n=1000/q=100/64 chains, M=2
        # 4810 ESS/s vs M=3 3388 with min pooled ESS flat (36.1k vs
        # 35.8k) — the binding parameter is not tau here
        kwargs.setdefault('spatial_sweeps', 2)
        super().__init__(
            Q, W, X, y, hparams, random_state, dtype=dtype,
            pg_method=pg_method, **kwargs,
        )

    def _static_config(self):
        return super()._static_config() + (('q_dim', self.q_dim),)

    def _configure(self, Q, x_np, hparams):
        # eta lives in the reduced basis: the dense Q is never needed
        # (K and Q_rsr = K'QK are the only spatial operators downstream),
        # and moran_basis takes sparse Q matrix-free at large n
        self._needs_dense_q = False
        GibbsBase._configure(self, Q, x_np, hparams)
        # Moran basis (reference gibbs/logit.py:415-460)
        k_basis, q_rsr = icar.moran_basis(
            x_np, Q, r=self._rsr_r, num_eigs=self._rsr_q
        )
        self.q_dim = q_rsr.shape[0]
        self.fixed['K'] = k_basis
        self.fixed['Q_rsr'] = q_rsr
        self.fixed['sqrt_factor'] = icar.psd_sqrt_factor(q_rsr)
        if not self.hparams_given:
            # reference gibbs/logit.py:454-457
            self.fixed['tau_shape'] = 0.5 + 0.5 * self.q_dim

    def _init_state(self, key, fixed):
        state = self._init_common(key, fixed)
        k_eta = jax.random.fold_in(key, 100)
        # reference gibbs/logit.py:462-466: eta ~ N(0, 5^2) in the basis
        state['eta'] = 5.0 * jax.random.normal(
            k_eta, (self.q_dim,), self.dtype
        )
        state['spatial'] = fixed['K'] @ state['eta']
        return state

    def _spatial_from_eta(self, eta):
        return self.fixed['K'] @ eta

    @property
    def _eta_scale_dim(self):
        return self.q_dim

    def _update_tau(self, key, eta, fixed):
        rate = 0.5 * jnp.maximum(
            eta @ (fixed['Q_rsr'] @ eta), 0.0
        ) + fixed['tau_rate']
        g = jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype)
        return g / rate

    def _update_eta(self, key, state, omega_b, tau, fixed):
        """Reduced-basis eta draw (reference gibbs/logit.py:478-485)."""
        xb = fixed['X'] @ state['beta']
        b = fixed['K'].T @ (state['k'] - omega_b * xb)
        eta = rsr_mvnorm(
            key, b, omega_b, tau, fixed['Q_rsr'], fixed['K'],
            fixed['sqrt_factor'],
        )
        return eta, fixed['K'] @ eta
