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

Update order matches reference gibbs/probit.py:262-270:
omega_b -> tau -> eps -> eta -> beta -> omega_a -> alpha -> z.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtr

from ..ops import icar
from ..ops.mvnorm import (
    constrained_icar_mvnorm_unit,
    precision_mvnorm,
)
from ..ops.truncnorm import truncnorm_sign
from .base import GibbsBase


class _ProbitBase(GibbsBase):
    """Shared probit machinery (latent utilities, eps, alpha, beta, z)."""

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
        (reference gibbs/probit.py:196-209)."""
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
        """Latent detection utilities over the padded visit grid, truncated
        by the observation indicator (reference gibbs/probit.py:173-194)."""
        loc = jnp.einsum('nvq,q->nv', fixed['W'], state['alpha'])
        return truncnorm_sign(key, loc, fixed['y'] > 0.5)

    def _update_alpha(self, key, state, omega_a, fixed):
        """alpha ~ MVN with precision W'W + a_prec over occupied sites
        (reference gibbs/probit.py:231-235), masked-dense."""
        w = fixed['W']
        ns, v, qa = w.shape
        z_s = state['z'][fixed['site_idx']]
        wt = fixed['visit_mask'] * z_s[:, None]
        wf = w.reshape(ns * v, qa)
        cw = wt.reshape(ns * v, 1)
        a = wf.T @ (cw * wf) + fixed['a_prec']
        b = fixed['a_prec_by_mu'] + wf.T @ (wt * omega_a).reshape(ns * v)
        return precision_mvnorm(key, b, a)

    def _update_z(self, key, state, fixed):
        """Masked occupancy update (reference gibbs/probit.py:245-260).

        As in the logit case, the empty-product degeneracy makes one fused
        expression cover surveyed-unobserved and unsurveyed sites.
        """
        lin = fixed['X'] @ state['beta'] + state['spatial'] + state['eps']
        num1 = ndtr(lin)
        lin_a = jnp.einsum('nvq,q->nv', fixed['W'], state['alpha'])
        # prod_v (1 - Phi(w_v a)) = exp(sum_v log Phi(-w_v a)), masked on
        # the compact grid then scattered to full sites
        log_prod_s = (fixed['visit_mask'] * log_ndtr(-lin_a)).sum(1)
        log_prod = jnp.zeros(self.n, log_prod_s.dtype).at[
            fixed['site_idx']
        ].set(log_prod_s)
        num = num1 * jnp.exp(log_prod)
        p = num / ((1.0 - num1) + num)
        draw = (
            jax.random.uniform(key, (self.n,), self.dtype) < p
        ).astype(self.dtype)
        z = jnp.where(fixed['obs'] > 0, jnp.ones((), self.dtype), draw)
        return z

    def _update_tau(self, key, eta, fixed):
        raise NotImplementedError

    def _update_eta(self, key, state, omega_b, tau, fixed):
        raise NotImplementedError

    def _step(self, key, state, fixed):
        """One Gibbs iteration (reference gibbs/probit.py:262-270)."""
        keys = jax.random.split(key, 8)
        s = dict(state)

        omega_b = self._update_omega_b(keys[0], s, fixed)
        s['omega_b'] = omega_b
        s['tau'] = self._update_tau(keys[1], s['eta'], fixed)
        s['eps'] = self._update_eps(keys[2], s, omega_b, fixed)
        s['eta'], s['spatial'] = self._update_eta(
            keys[3], s, omega_b, s['tau'], fixed
        )
        s['beta'] = self._update_beta(keys[4], s, omega_b, fixed)
        omega_a = self._update_omega_a(keys[5], s, fixed)
        s['alpha'] = self._update_alpha(keys[6], s, omega_a, fixed)
        s['z'] = self._update_z(keys[7], s, fixed)
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
        dtype=jnp.float32,
    ):
        self._rsr_r = r
        self._rsr_q = q
        super().__init__(Q, W, X, y, hparams, random_state, dtype=dtype)

    def _static_config(self):
        return super()._static_config() + (('q_dim', self.q_dim),)

    def _configure(self, Q, x_np, hparams):
        super()._configure(Q, x_np, hparams)
        f = self.fixed
        f['XTX_plus_bprec'] = x_np.T @ x_np + f['b_prec']
        k_basis, q_rsr = icar.moran_basis(
            x_np, f['Q'], r=self._rsr_r, num_eigs=self._rsr_q
        )
        self.q_dim = q_rsr.shape[0]
        f['K'] = k_basis
        f['Q_rsr'] = q_rsr
        f['KTK'] = k_basis.T @ k_basis
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
        rate = 0.5 * eta @ (fixed['Q_rsr'] @ eta) + fixed['tau_rate']
        return jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype) / rate

    def _update_eta(self, key, state, omega_b, tau, fixed):
        """eta ~ MVN with precision K'K + tau*Q_rsr
        (reference gibbs/probit.py:223-229)."""
        a = fixed['KTK'] + tau * fixed['Q_rsr']
        b = fixed['K'].T @ (
            omega_b - fixed['X'] @ state['beta'] - state['eps']
        )
        eta = precision_mvnorm(key, b, a)
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
    """

    def _configure(self, Q, x_np, hparams):
        super()._configure(Q, x_np, hparams)
        f = self.fixed
        f['XTX_plus_bprec'] = x_np.T @ x_np + f['b_prec']
        s_eig, u_eig, _ = icar.icar_spectral(f['Q'])
        f['q_eigvals'] = s_eig
        f['q_eigvecs'] = u_eig

    def _update_tau(self, key, eta, fixed):
        rate = 0.5 * eta @ (fixed['Q'] @ eta) + fixed['tau_rate']
        return jax.random.gamma(key, fixed['tau_shape'], dtype=self.dtype) / rate

    def _update_eta(self, key, state, omega_b, tau, fixed):
        b = omega_b - fixed['X'] @ state['beta'] - state['eps']
        eta = constrained_icar_mvnorm_unit(
            key, b, tau, fixed['q_eigvecs'], fixed['q_eigvals'],
        )
        return eta, eta
