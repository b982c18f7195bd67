"""Probit-link Gibbs samplers (Albert–Chib truncated-normal augmentation).

TPU-native re-design of reference gibbs/probit.py:27-270. The model adds a
heteroskedastic site random effect ``eps`` (reference gibbs/probit.py:
216-221) on top of the RSR spatial term; the latent-utility updates use
one-sided truncated normals drawn by the fused inverse-CDF sampler in
:mod:`occuspytial_tpu.ops.truncnorm` instead of the reference's boolean
gather/scatter pair (reference gibbs/probit.py:186-194, 202-209).

Note the reference's probit sampler is marked xfail in its own tests
(reference gibbs/tests/test_samplers.py:33); this implementation follows
the conditional distributions implied by the model (validated against the
augmentation math, not the reference's output) and passes the same-shape /
reproducibility tests the logit samplers do.

``ProbitICARGibbs`` (full-rank ICAR spatial term, no basis reduction) is a
rebuild addition with no reference counterpart: its eta conditional is
``N(Lambda^{-1} b, Lambda^{-1})`` with ``Lambda = tau*Q + I`` restricted to
the sum-to-zero hyperplane, reusing the constrained ICAR draw.

Kernel structure (defaults; see ``_ProbitBase`` for the math):

- ``collapsed=True``: the (beta, eta, eps) block is drawn *jointly* from
  its exact conditional given the latent utilities — beta with eta and
  eps integrated out, eta with eps integrated out, then eps — instead of
  the reference's three single-site conditionals;
- ``px=True``: a generalized-Gibbs scale move over the multiplicative
  group orbit g * (u, beta, eta, eps) per iteration, which removes the
  radial random walk the probit chain suffers under quasi-separation.

``collapsed=False, px=False`` reproduces the reference's update order
(gibbs/probit.py:262-270): omega_b -> tau -> eps -> eta -> beta ->
omega_a -> alpha -> z. All variants target the identical posterior
(enforced by tests/test_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr

from ..ops import icar
from ..ops import graph as graph_ops
from ..ops import stencil
from ..ops.mvnorm import (
    constrained_icar_mvnorm_unit,
    precision_mvnorm,
)
from ..ops.stencil import LatticeSpec
from ..ops.truncnorm import truncnorm_sign
from . import etasetup
from .base import GibbsBase
from .interweave import log_tau_move


class _ProbitBase(GibbsBase):
    """Shared probit machinery (latent utilities, eps, alpha, beta, z).

    ``collapsed=True`` (default, rebuild addition) replaces the
    reference's sequential eps -> eta -> beta conditionals with a
    partially-collapsed ladder: beta is drawn with *both* eps and eta
    integrated out of the latent-utility likelihood
    (``u = X beta + spatial + eps + e`` with ``eps, e ~ N(0, 1)``, so
    marginally ``u ~ N(X beta, 2 I + Cov(spatial))``), then eta given
    (u, beta) with eps still integrated (observation precision 1/2),
    then eps from its full conditional. Marginalized variables are
    redrawn after every update that integrated them out, so the
    stationary distribution is exactly the reference model's (Van Dyk &
    Park 2008); what changes is mixing — the intercept/field/eps
    confounding that dominates worst-parameter ESS is removed from the
    kernel. ``collapsed=False`` reproduces the reference's update order
    (gibbs/probit.py:262-270).
    """

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None,
        dtype=jnp.float32, collapsed=True, px=True, px_sd=0.3,
        asis=True, asis_sd=1.0, asis_steps=12, asis_method='mh',
        spatial_sweeps=None,
    ):
        if asis_method not in ('mh', 'slice'):
            raise ValueError(f'unknown asis_method: {asis_method!r}')
        self.asis_method = asis_method
        # None = auto. Measured policy: sub-sweeps pay only where tau
        # binds the worst-parameter ESS and the block is cheap — the
        # small-n spectral ICAR regime (ProbitICARGibbs resolves that
        # case to 6 before reaching here; bench config 2: 2932 -> 7732+
        # ESS/s). For RSR the binding parameter is beta, whose
        # autocorrelation flows through the utility draw, not the block
        # (measured M=2: beta ESS flat, it/s down), so auto stays 1.
        if spatial_sweeps is None:
            spatial_sweeps = 1
        self.spatial_sweeps = int(spatial_sweeps)
        if self.spatial_sweeps < 1:
            raise ValueError('spatial_sweeps must be >= 1')
        self.collapsed = bool(collapsed)
        self.px = bool(px)
        self.px_sd = float(px_sd)
        self.asis = bool(asis)
        self.asis_sd = float(asis_sd)
        self.asis_steps = int(asis_steps)
        super().__init__(Q, W, X, y, hparams, random_state, dtype=dtype)
        # exact orbit draw requires a zero-mean beta prior (else MH)
        self._px_exact = bool(
            np.allclose(np.asarray(self.fixed['b_mu']), 0.0)
        )

    def _static_config(self):
        return super()._static_config() + (
            ('collapsed', self.collapsed),
            ('px', self.px),
            ('px_sd', self.px_sd),
            ('_px_exact', self._px_exact),
            ('asis', self.asis),
            ('asis_sd', self.asis_sd),
            ('asis_steps', self.asis_steps),
            ('asis_method', self.asis_method),
            ('spatial_sweeps', self.spatial_sweeps),
        )

    def _eta_quad(self, eta, fixed):
        raise NotImplementedError

    #: effective dimension of eta under scaling (subspace dim for ICAR)
    _eta_dim = None

    def _px_scale_move(self, key, s, fixed, marginal=False):
        """Group scale move ``(u, beta, eta, eps) -> g * (...)`` (MH).

        Parameter-expansion flavored booster (PX-DA direction, Liu & Wu
        1999): the probit chain's slow manifold under quasi-separation is
        a ray through the origin in (beta, eta, eps) space, which
        coordinate-wise Gibbs crosses in tiny steps but a scale move
        traverses in one. The acceptance ratio is exact — the occupancy
        indicators constrain u only through its sign, which g > 0
        preserves — so the move composes with the Gibbs kernel without
        changing the stationary distribution:

            log a = -(g^2-1)/2 * (||u - m||^2 + ||eps||^2
                                  + tau eta'Q eta)
                    - (prior(g beta) - prior(beta)) + d log g

        with ``d = dim(u) + dim(beta) + dim_eff(eta) + dim(eps)`` the
        Jacobian dimension and ``log g ~ N(0, px_sd^2)`` symmetric.

        With the default zero prior mean for beta the orbit density is
        ``p(g) dg ∝ g^(d-1) exp(-g^2 S / 2)`` — a chi distribution — so
        the radial coordinate is drawn *exactly* (``g^2 ~ Gamma(d/2,
        S/2)``; Liu & Sabatti 2000 generalized Gibbs over the
        multiplicative group), eliminating radial autocorrelation
        entirely. The MH form above is kept for nonzero ``b_mu``.
        """
        k1, k2 = jax.random.split(key)
        beta, eta, eps = s['beta'], s['eta'], s['eps']
        u = s['omega_b']
        if marginal:
            # eps-marginal orbit: u ~ N(X beta + spatial, 2I); used in
            # the PCG window where eps is integrated out (stale), so
            # the move must not condition on it
            r = u - fixed['X'] @ beta - s['spatial']
            rss = 0.5 * (r @ r) + s['tau'] * self._eta_quad(eta, fixed)
            d = self.n + self.n_beta + self._eta_dim
        else:
            r = u - fixed['X'] @ beta - s['spatial'] - eps
            rss = r @ r + eps @ eps + s['tau'] * self._eta_quad(
                eta, fixed
            )
            d = 2 * self.n + self.n_beta + self._eta_dim
        if self._px_exact:
            # exact chi draw on the orbit (zero-mean beta prior)
            s_tot = rss + beta @ (fixed['b_prec'] @ beta)
            g2 = 2.0 * jax.random.gamma(
                k1, 0.5 * d, dtype=self.dtype
            ) / s_tot
            gg = jnp.sqrt(g2)
        else:
            g = jnp.exp(
                self.px_sd * jax.random.normal(k1, (), self.dtype)
            )
            bmu = beta - fixed['b_mu']
            gbmu = g * beta - fixed['b_mu']
            prior_diff = gbmu @ (fixed['b_prec'] @ gbmu) - bmu @ (
                fixed['b_prec'] @ bmu
            )
            log_a = (
                -0.5 * (g * g - 1.0) * rss - 0.5 * prior_diff
                + d * jnp.log(g)
            )
            accept = jnp.log(
                jax.random.uniform(k2, (), self.dtype)
            ) < log_a
            gg = jnp.where(accept, g, jnp.ones((), self.dtype))
        s['omega_b'] = gg * u
        s['beta'] = gg * beta
        s['eta'] = gg * eta
        if not marginal:  # eps is not part of the marginal orbit
            s['eps'] = gg * eps
        s['spatial'] = gg * s['spatial']
        return s

    def _asis_tau(self, key, s, fixed):
        """Sufficient/ancillary tau interweave (probit analog of
        logit.py:_asis_tau — same derivation with the Gaussian utility
        likelihood u ~ N(Xb + spatial + eps, 1) replacing the
        Polya-Gamma quadratic):

            log f(log t) = a0*log t - b0*t + A/sqrt(t) - C/t
            A = (u - Xb - eps)' spatial_a,  C = 0.5 ||spatial_a||^2
        """
        tau = s['tau']
        rt = jnp.sqrt(tau)
        spatial_a = rt * s['spatial']
        d = s['omega_b'] - fixed['X'] @ s['beta'] - s['eps']
        a_lin = jnp.sum(d * spatial_a)
        c_quad = 0.5 * jnp.sum(spatial_a * spatial_a)
        a0 = fixed['tau_shape'] - 0.5 * self._eta_dim
        b0 = fixed['tau_rate']

        def logf(log_t):
            t = jnp.exp(log_t)
            return (
                a0 * log_t - b0 * t
                + a_lin * jax.lax.rsqrt(t) - c_quad / t
            )

        new_t = jnp.exp(log_tau_move(
            key, jnp.log(tau), logf, self.asis_method,
            self.asis_sd, self.asis_steps, self.dtype,
        ))
        inv_rt = jax.lax.rsqrt(new_t)
        s['tau'] = new_t
        s['eta'] = (rt * s['eta']) * inv_rt
        s['spatial'] = spatial_a * inv_rt
        return s

    def _init_state(self, key, fixed):
        state = self._init_common(key, fixed)
        k_eps = jax.random.fold_in(key, 101)
        state['eps'] = jax.random.normal(k_eps, (self.n,), self.dtype)
        state['omega_b'] = jnp.zeros(self.n, self.dtype)
        return state

    def _apply_start(self, state, start):
        out = super()._apply_start(state, start)
        if 'eps' in start:
            out['eps'] = jnp.asarray(start['eps'], dtype=self.dtype)
        return out

    def _update_omega_b(self, key, state, fixed):
        """Latent occupancy utilities, truncated by the current z
        (reference gibbs/probit.py:196-209). Under the collapsed kernel
        eps is integrated out here too — u ~ N(X beta + spatial, 2)
        truncated — so the whole block operates in the eps-marginal
        model and eps is imputed once at the end of the ladder."""
        if self.collapsed:
            root2 = jnp.sqrt(jnp.asarray(2.0, self.dtype))
            loc = fixed['X'] @ state['beta'] + state['spatial']
            return root2 * truncnorm_sign(
                key, loc / root2, state['z'] > 0.5
            )
        loc = (
            fixed['X'] @ state['beta'] + state['spatial'] + state['eps']
        )
        return truncnorm_sign(key, loc, state['z'] > 0.5)

    def _update_eps(self, key, state, omega_b, fixed):
        """eps | omega_b ~ N(0.5*(omega_b - Xb - spatial), 1/2)
        (reference gibbs/probit.py:216-221)."""
        mean = 0.5 * (
            omega_b - fixed['X'] @ state['beta'] - state['spatial']
        )
        std = jax.random.normal(key, (self.n,), self.dtype)
        return mean + std / jnp.sqrt(jnp.asarray(2.0, self.dtype))

    def _update_beta(self, key, state, omega_b, fixed):
        """beta ~ MVN with fixed precision X'X + b_prec
        (reference gibbs/probit.py:237-243)."""
        b = fixed['b_prec_by_mu'] + fixed['X'].T @ (
            omega_b - state['spatial'] - state['eps']
        )
        return precision_mvnorm(key, b, fixed['XTX_plus_bprec'])

    def _update_omega_a(self, key, state, fixed):
        """Latent detection utilities over the flat visit rows, truncated
        by the observation indicator (reference gibbs/probit.py:173-194)."""
        loc = fixed['W_flat'] @ state['alpha']
        return truncnorm_sign(key, loc, fixed['y_flat'] > 0.5)

    def _update_alpha(self, key, state, omega_a, fixed):
        """alpha ~ MVN with precision W'W + a_prec over occupied sites
        (reference gibbs/probit.py:231-235), flat-visits layout."""
        w = fixed['W_flat']
        wt = state['z'][fixed['visit_site']]
        a = w.T @ (wt[:, None] * w) + fixed['a_prec']
        b = fixed['a_prec_by_mu'] + w.T @ (wt * omega_a)
        return precision_mvnorm(key, b, a)

    def _update_z(self, key, state, fixed):
        """Masked occupancy update (reference gibbs/probit.py:245-260).

        As in the logit case, the empty-product degeneracy makes one fused
        expression cover surveyed-unobserved and unsurveyed sites.
        """
        lin = fixed['X'] @ state['beta'] + state['spatial'] + state['eps']
        lin_a = fixed['W_flat'] @ state['alpha']
        # prod_v (1 - Phi(w_v a)) = exp(sum_v log Phi(-w_v a)),
        # segment-summed from the flat visit rows to full sites
        log_prod = jnp.zeros(self.n, lin_a.dtype).at[
            fixed['visit_site']
        ].add(log_ndtr(-lin_a))
        # p = psi*prod / (1-psi + psi*prod) in stable log-odds form:
        # sigmoid(log psi + log_prod - log(1-psi)); the ratio form is
        # 0/0 once ndtr saturates to 1.0 in float32 (the round-1 legacy
        # NaN at long runs)
        p = jax.nn.sigmoid(log_ndtr(lin) + log_prod - log_ndtr(-lin))
        draw = (
            jax.random.uniform(key, (self.n,), self.dtype) < p
        ).astype(self.dtype)
        z = jnp.where(fixed['obs'] > 0, jnp.ones((), self.dtype), draw)
        return z

    def _update_tau(self, key, eta, fixed):
        raise NotImplementedError

    def _update_eta(self, key, state, omega_b, tau, fixed):
        raise NotImplementedError

    def _update_beta_collapsed(self, key, state, omega_b, tau, fixed):
        raise NotImplementedError

    def _update_eta_collapsed(self, key, state, omega_b, tau, fixed):
        raise NotImplementedError

    def _step(self, key, state, fixed):
        """One Gibbs iteration. ``collapsed=False`` follows reference
        gibbs/probit.py:262-270 exactly; ``collapsed=True`` replaces the
        eps/eta/beta conditionals with the collapsed ladder
        beta (eps, eta out) -> eta (eps out) -> eps (full conditional).

        The (tau, beta/eta/eps ladder, PX, ASIS) block repeats
        ``spatial_sweeps`` times per utility draw — the collapsed ladder
        is an exact joint (beta, eta, eps) | (u, tau) redraw by
        composition, and the PX/ASIS moves are invariant, so the repeat
        composes exact moves of the same joint (same argument as
        logit.py:_step)."""
        # one split covers the four fixed conditionals AND the per-sweep
        # subkeys. Never derive the sweep keys with fold_in(key, i): jax
        # defines split(key, n)[i] == fold_in(key, i), so that would
        # alias sweep i's randomness with keys[i] (sweep 0 would reuse
        # the utility draw's key) and silently correlate conditionals
        keys = jax.random.split(key, 4 + self.spatial_sweeps)
        s = dict(state)

        omega_b = self._update_omega_b(keys[0], s, fixed)
        s['omega_b'] = omega_b
        if self.px:
            # orbit move on (u, old theta): re-centers the fresh
            # utilities' scale before the collapsed block conditions on
            # them (second move below re-centers the new theta). In the
            # collapsed kernel eps is integrated out of this window, so
            # the move runs on the eps-marginal density
            s = self._px_scale_move(jax.random.fold_in(key, 104729), s,
                                    fixed, marginal=self.collapsed)
            omega_b = s['omega_b']
        for i in range(self.spatial_sweeps):
            sub = keys[4 + i]
            sks = jax.random.split(sub, 4)
            s['tau'] = self._update_tau(sks[0], s['eta'], fixed)
            if self.collapsed:
                s['beta'] = self._update_beta_collapsed(
                    sks[1], s, omega_b, s['tau'], fixed
                )
                s['eta'], s['spatial'] = self._update_eta_collapsed(
                    sks[2], s, omega_b, s['tau'], fixed
                )
                mean = 0.5 * (
                    omega_b - fixed['X'] @ s['beta'] - s['spatial']
                )
                s['eps'] = mean + jax.random.normal(
                    sks[3], (self.n,), self.dtype
                ) / jnp.sqrt(jnp.asarray(2.0, self.dtype))
            else:
                s['eps'] = self._update_eps(sks[1], s, omega_b, fixed)
                s['eta'], s['spatial'] = self._update_eta(
                    sks[2], s, omega_b, s['tau'], fixed
                )
                s['beta'] = self._update_beta(sks[3], s, omega_b, fixed)
            if self.px:
                s = self._px_scale_move(
                    jax.random.fold_in(sub, 7919), s, fixed
                )
                omega_b = s['omega_b']
            if self.asis:
                s = self._asis_tau(
                    jax.random.fold_in(sub, 31337), s, fixed
                )
        omega_a = self._update_omega_a(keys[1], s, fixed)
        s['alpha'] = self._update_alpha(keys[2], s, omega_a, fixed)
        s['z'] = self._update_z(keys[3], s, fixed)
        s['k'] = s['z'] - 0.5
        return s


class ProbitRSRGibbs(_ProbitBase):
    """Probit sampler with Reduced Spatial Regression spatial effects.

    Parity target: reference gibbs/probit.py:27-270 (same Moran-basis
    construction as the logit RSR sampler, reference
    gibbs/probit.py:109-153).
    """

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None, r=0.5, q=None,
        dtype=jnp.float32, collapsed=True, **kwargs,
    ):
        # remaining keyword options (px, px_sd, asis, asis_sd,
        # asis_steps) pass straight through to _ProbitBase
        self._rsr_r = r
        self._rsr_q = q
        super().__init__(
            Q, W, X, y, hparams, random_state, dtype=dtype,
            collapsed=collapsed, **kwargs,
        )

    def _static_config(self):
        return super()._static_config() + (('q_dim', self.q_dim),)

    def _configure(self, Q, x_np, hparams):
        # the reduced basis is the only spatial operator downstream:
        # skip the dense Q copy and let moran_basis go matrix-free on
        # sparse input at large n
        self._needs_dense_q = False
        super()._configure(Q, x_np, hparams)
        f = self.fixed
        f['XTX_plus_bprec'] = x_np.T @ x_np + f['b_prec']
        k_basis, q_rsr = icar.moran_basis(
            x_np, Q, r=self._rsr_r, num_eigs=self._rsr_q
        )
        self.q_dim = q_rsr.shape[0]
        f['K'] = k_basis
        f['Q_rsr'] = q_rsr
        f['KTK'] = k_basis.T @ k_basis
        f['KTX'] = k_basis.T @ x_np
        f['XTX'] = x_np.T @ x_np
        if not self.hparams_given:
            f['tau_shape'] = 0.5 + 0.5 * self.q_dim

    def _init_state(self, key, fixed):
        state = super()._init_state(key, fixed)
        k_eta = jax.random.fold_in(key, 100)
        state['eta'] = 5.0 * jax.random.normal(
            k_eta, (self.q_dim,), self.dtype
        )
        state['spatial'] = fixed['K'] @ state['eta']
        return state

    def _spatial_from_eta(self, eta):
        return self.fixed['K'] @ eta

    def _update_tau(self, key, eta, fixed):
        rate = 0.5 * self._eta_quad(eta, fixed) + fixed['tau_rate']
        g = jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype)
        return g / rate

    def _eta_quad(self, eta, fixed):
        # clamp: the f32 quad form can go slightly negative by
        # cancellation when the field is smooth (true value ~ 0),
        # which would flip the Gamma rate / orbit scale negative
        return jnp.maximum(eta @ (fixed['Q_rsr'] @ eta), 0.0)

    @property
    def _eta_dim(self):
        return self.q_dim

    def _update_eta(self, key, state, omega_b, tau, fixed):
        """eta ~ MVN with precision K'K + tau*Q_rsr
        (reference gibbs/probit.py:223-229)."""
        a = fixed['KTK'] + tau * fixed['Q_rsr']
        b = fixed['K'].T @ (
            omega_b - fixed['X'] @ state['beta'] - state['eps']
        )
        eta = precision_mvnorm(key, b, a)
        return eta, fixed['K'] @ eta

    # --------------- collapsed ladder (rebuild addition) --------------- #
    # With eps integrated out the utility noise has variance 2, so the
    # eta-marginal covariance of u is Sigma = 2I + K (tau Q_rsr)^{-1} K'
    # and by Woodbury Sigma^{-1} = I/2 - (1/4) K A^{-1} K' with
    # A = tau Q_rsr + K'K/2 — the same q x q matrix that the collapsed
    # eta conditional uses, so XLA CSEs one Cholesky for both draws.

    def _update_beta_collapsed(self, key, state, omega_b, tau, fixed):
        a_eta = tau * fixed['Q_rsr'] + 0.5 * fixed['KTK']
        chol = jnp.linalg.cholesky(a_eta)
        ktx = fixed['KTX']  # (q, p)
        ktu = fixed['K'].T @ omega_b
        sol_x = jax.scipy.linalg.cho_solve((chol, True), ktx)
        sol_u = jax.scipy.linalg.cho_solve((chol, True), ktu)
        a_beta = (
            0.5 * fixed['XTX'] + fixed['b_prec'] - 0.25 * (ktx.T @ sol_x)
        )
        b_beta = (
            0.5 * (fixed['X'].T @ omega_b) - 0.25 * (ktx.T @ sol_u)
            + fixed['b_prec_by_mu']
        )
        return precision_mvnorm(key, b_beta, 0.5 * (a_beta + a_beta.T))

    def _update_eta_collapsed(self, key, state, omega_b, tau, fixed):
        a_eta = tau * fixed['Q_rsr'] + 0.5 * fixed['KTK']
        b = 0.5 * (
            fixed['K'].T @ (omega_b - fixed['X'] @ state['beta'])
        )
        eta = precision_mvnorm(key, b, a_eta)
        return eta, fixed['K'] @ eta


class ProbitICARGibbs(_ProbitBase):
    """Probit sampler with the full-rank ICAR spatial model.

    Rebuild addition (no reference counterpart): eta keeps all n
    dimensions with conditional precision ``tau*Q + I`` restricted to the
    sum-to-zero hyperplane — the probit analog of
    reference gibbs/logit.py:16-99. Because the latent-utility noise is
    exactly unit-variance, ``Lambda`` is diagonal in Q's eigenbasis and
    the draw is a closed-form spectral transform (no factorization or
    iterative solve; see ops/mvnorm.py:constrained_icar_mvnorm_unit).

    Three eta regimes mirror the logit sampler's large-n ladder:
    ``solver='spectral'`` (default, one-time dense eigh — fine to a few
    thousand sites), ``'stencil'`` (O(n) lattice operators, pass
    ``lattice=``), and ``'graph'`` (matrix-free panels for arbitrary
    sparse adjacencies, auto-selected for sparse Q at large n). The
    iterative regimes draw eta through the same warm-started
    preconditioned CG as the logit path with ``omega = 1`` — the probit
    system ``tau*Q + I`` is its best-conditioned instance. The collapsed
    (beta, eta, eps) ladder needs the eigenbasis, so iterative solvers
    run the reference-ordered kernel (``collapsed=False``) — PX and ASIS
    moves still apply.
    """

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None,
        dtype=jnp.float32, solver=None, cg_iters=None, lattice=None,
        graph_rank=None, graph_block='auto', solver_check_tol=0.2,
        **kwargs,
    ):
        from .logit import _GRAPH_AUTO_THRESHOLD

        if solver not in (None, 'spectral', 'stencil', 'graph'):
            raise ValueError(f'unknown eta solver: {solver!r}')
        self.lattice = None
        if lattice is not None:
            self.lattice = (
                lattice if isinstance(lattice, LatticeSpec)
                else LatticeSpec(*lattice)
            )
            if solver is None:
                solver = 'stencil'
        if solver == 'stencil' and self.lattice is None:
            raise ValueError(
                "solver='stencil' requires the `lattice` argument"
            )
        if solver is None:
            import scipy.sparse as sps

            n_sites = np.asarray(X).shape[0]
            solver = (
                'graph'
                if sps.issparse(Q) and n_sites >= _GRAPH_AUTO_THRESHOLD
                else 'spectral'
            )
        self.solver = solver
        if graph_rank is None:
            from .logit import auto_graph_rank

            graph_rank = auto_graph_rank(np.asarray(X).shape[0])
        self.graph_rank = int(graph_rank)
        self.graph_block = graph_block
        self.graph = None
        if cg_iters is None:
            # graph-path budget calibration in models/logit.py (paired
            # with the RESOLVED deflation rank — a weak caller-passed
            # basis keeps the conservative 24-iteration budget); the
            # probit system (omega = 1) is better conditioned still
            if solver == 'graph':
                if self.graph_rank >= 512:
                    cg_iters = 7
                elif self.graph_rank >= 256:
                    cg_iters = 10
                else:
                    cg_iters = 24
            else:
                cg_iters = 15
        self.cg_iters = int(cg_iters)
        self.solver_check_tol = solver_check_tol
        self._solver_checked = False
        self._needs_dense_q = solver == 'spectral'
        if solver != 'spectral':
            if kwargs.get('collapsed'):
                raise ValueError(
                    'the collapsed (beta, eta, eps) ladder requires '
                    "the spectral eta solver; use solver='spectral' "
                    'or collapsed=False'
                )
            kwargs['collapsed'] = False
        if kwargs.get('spatial_sweeps') is None and solver == 'spectral':
            n_sites = int(np.asarray(X).shape[0])
            if n_sites <= 256:
                # overhead-bound regime: the whole collapsed block is
                # nearly free next to the per-step dispatch floor, and
                # tau binds — tau pooled ESS scales ~linearly in the
                # sweep count until beta catches up around M=8
                # (measured 1024-chain n=100 TPU: M=1 2932, M=3 5318,
                # M=6 7732, M=8 7992 ESS/s)
                kwargs['spatial_sweeps'] = 6
        super().__init__(
            Q, W, X, y, hparams, random_state, dtype=dtype, **kwargs
        )

    def _static_config(self):
        return super()._static_config() + (
            ('solver', self.solver),
            ('cg_iters', self.cg_iters),
            ('lattice', self.lattice),
            ('graph', self.graph),
            ('_needs_dense_q', self._needs_dense_q),
        )

    def _configure(self, Q, x_np, hparams):
        super()._configure(Q, x_np, hparams)
        f = self.fixed
        f['XTX_plus_bprec'] = x_np.T @ x_np + f['b_prec']
        if self.solver == 'stencil':
            f.update(etasetup.setup_stencil(self.lattice, Q, self.n))
            return
        if self.solver == 'graph':
            # same basis-storage policy as the logit sampler's
            # eig_dtype: bf16 on TPU (preconditioner-only rounding)
            basis_dtype = (
                jnp.bfloat16 if jax.default_backend() == 'tpu'
                and self.dtype == jnp.float32 else self.dtype
            )
            self.graph, arrays = etasetup.setup_graph(
                Q, self.n, self.graph_rank, self.graph_block,
                basis_dtype=basis_dtype,
            )
            f.update(arrays)
            return
        s_eig, u_eig, _ = icar.icar_spectral(f['Q'])
        f['q_eigvals'] = s_eig
        f['q_eigvecs'] = u_eig
        f['UX'] = u_eig.T @ x_np  # X in Q's eigenbasis (collapsed beta)
        # boolean, not float: excluded from the dtype cast in __init__
        f['eig_mask'] = s_eig > (1e-8 * float(np.max(s_eig)))

    def _update_tau(self, key, eta, fixed):
        rate = 0.5 * self._eta_quad(eta, fixed) + fixed['tau_rate']
        g = jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype)
        return g / rate

    def _eta_quad(self, eta, fixed):
        if self.solver == 'stencil':
            q = stencil.quad_form(self.lattice, fixed['lat_deg'], eta)
        elif self.solver == 'graph':
            q = graph_ops.quad_form(fixed, eta)
        else:
            q = eta @ (fixed['Q'] @ eta)
        return jnp.maximum(q, 0.0)

    @property
    def _eta_dim(self):
        return self.n - 1  # eta lives on the sum-to-zero subspace

    def _init_state(self, key, fixed):
        state = super()._init_state(key, fixed)
        if self.solver in ('stencil', 'graph'):
            # warm-start carry for the per-iteration [b, 1] CG solves,
            # plus the running residual max (base.py:_track_resid)
            state['eta_warm'] = jnp.zeros((2, self.n), self.dtype)
            state['solver_resid'] = jnp.zeros((), self.dtype)
        return state

    def _update_eta(self, key, state, omega_b, tau, fixed):
        b = omega_b - fixed['X'] @ state['beta'] - state['eps']
        if self.solver in ('stencil', 'graph'):
            # unit observation precision: the latent-utility noise is
            # exactly N(0, 1), so omega = 1 everywhere
            ones = jnp.ones_like(b)
            if self.solver == 'stencil':
                eta, warm, rel = stencil.constrained_mvnorm(
                    self.lattice, fixed, key, b, ones, tau,
                    state['eta_warm'], self.cg_iters, return_resid=True,
                )
            else:
                eta, warm, rel = graph_ops.constrained_mvnorm(
                    self.graph, fixed, key, b, ones, tau,
                    state['eta_warm'], self.cg_iters, return_resid=True,
                )
            # caller keeps the mutated dict: _step passes its own state
            # dict in, so the warm start rides along the scan carry
            state['eta_warm'] = warm
            self._track_resid(state, rel)
            return eta, eta
        eta = constrained_icar_mvnorm_unit(
            key, b, tau, fixed['q_eigvecs'], fixed['q_eigvals'],
        )
        return eta, eta

    # ------------- iterative-solver accuracy guardrail ---------------- #

    def init_carry(self, chains=2, start=None):
        """Build the resumable carry, then run the one-time solver
        accuracy check (logit.py's guardrail, probit instance)."""
        carry = super().init_carry(chains, start)
        self._check_solver_accuracy(carry)
        return carry

    def _check_solver_accuracy(self, carry):
        if (
            self.solver not in ('stencil', 'graph')
            or self.solver_check_tol is None
            or self._solver_checked
        ):
            return
        self._solver_checked = True
        resid = self.solver_residual(carry)
        if resid > self.solver_check_tol:
            raise RuntimeError(
                f'eta solver ({self.solver!r}, cg_iters='
                f'{self.cg_iters}) did not converge: cold-start '
                f'relative residual {resid:.2e} exceeds '
                f'solver_check_tol={self.solver_check_tol:.0e}. '
                'Increase cg_iters (or pass solver_check_tol=None to '
                'bypass this check).'
            )

    def solver_residual(self, carry=None):
        """Max relative residual of the eta solver at a representative
        state (``(tau*Q + I) x = rhs`` over the [b, 1] right-hand
        sides), cold-started. Same contract as the logit sampler's
        :meth:`~LogitICARGibbs.solver_residual`."""
        if carry is None:
            carry = self.init_carry(chains=1)
        _, states = carry

        # single AOT-compiled program with states/fixed as arguments and
        # the chain-0 slicing inside — see logit.solver_residual for the
        # tunneled-runtime pathologies this sidesteps
        def resid_fn(states, fixed):
            state = {k: v[0] for k, v in states.items()}
            b = (
                state['omega_b'] - fixed['X'] @ state['beta']
                - state['eps']
            )
            tau = jnp.asarray(state['tau'], self.dtype)
            rhs = jnp.stack([b, jnp.ones_like(b)])
            ones = jnp.ones_like(b)
            if self.solver == 'stencil':
                sol = stencil.cg_solve(
                    self.lattice, fixed, rhs, jnp.zeros_like(rhs),
                    ones, tau, self.cg_iters,
                )
                qsol = jax.vmap(
                    lambda v: stencil.matvec(
                        self.lattice, fixed['lat_deg'], v
                    )
                )(sol)
            else:
                sol = graph_ops.cg_solve(
                    self.graph, fixed, rhs, jnp.zeros_like(rhs),
                    ones, tau, self.cg_iters,
                )
                qsol = graph_ops.matvec(fixed, sol)
            resid = tau * qsol + sol - rhs
            return jnp.max(
                jnp.linalg.norm(resid, axis=1)
                / jnp.linalg.norm(rhs, axis=1)
            )

        fixed = dict(self.fixed)
        states = dict(states)
        compiled = jax.jit(resid_fn).lower(states, fixed).compile()
        return float(compiled(states, fixed))

    # --------------- collapsed ladder (rebuild addition) --------------- #
    # Everything is diagonal in Q's eigenbasis: with eps and eta out,
    # Cov(U'u) = diag(2 + 1/(tau s_i)) on the spatial subspace and 2 on
    # the null direction (the sum-to-zero constraint kills eta there), so
    # the collapsed beta draw is a p x p problem after one (n, p) rescale.

    def _update_beta_collapsed(self, key, state, omega_b, tau, fixed):
        s_eig = fixed['q_eigvals']
        mask = fixed['eig_mask']
        var_u = jnp.where(
            mask, 2.0 + 1.0 / (tau * jnp.maximum(s_eig, 1e-30)), 2.0
        )
        w = 1.0 / var_u
        ux = fixed['UX']  # (n, p)
        uu = omega_b @ fixed['q_eigvecs']  # U'u
        a = ux.T @ (w[:, None] * ux) + fixed['b_prec']
        b = ux.T @ (w * uu) + fixed['b_prec_by_mu']
        return precision_mvnorm(key, b, a)

    def _update_eta_collapsed(self, key, state, omega_b, tau, fixed):
        # eta | u, beta with eps out: precision tau*Q + I/2 on the
        # sum-to-zero subspace; exact spectral draw, null coord zeroed
        b = 0.5 * (omega_b - fixed['X'] @ state['beta'])
        d = tau * fixed['q_eigvals'] + 0.5
        b_spec = b @ fixed['q_eigvecs']
        eps = jax.random.normal(key, b.shape, self.dtype)
        coef = b_spec / d + eps / jnp.sqrt(d)
        coef = jnp.where(fixed['eig_mask'], coef, 0.0)
        eta = coef @ fixed['q_eigvecs'].T
        return eta, eta
