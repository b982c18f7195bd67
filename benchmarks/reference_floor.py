"""Single-core CPU floor: a faithful numpy/scipy re-implementation of the
reference's logit Gibbs samplers.

The reference package cannot run in this image (its Cython extensions and
the ``polyagamma`` C wheel are not installed), so the measured baseline
required by BASELINE.md is obtained from this implementation of the *same
algorithm* the reference executes — written from the model math and the
survey of reference behavior (SURVEY.md §3.3), not translated from its
source:

- Pólya-Gamma PG(1, z) draws via the exact Devroye rejection sampler
  (vectorized numpy; stands in for the ``polyagamma`` C library the
  reference calls at gibbs/logit.py:191,202),
- eta | rest from the hyperplane-truncated MVN via the perturbation +
  sparse block MINRES + kriging-projection scheme the reference uses
  (gibbs/logit.py:73-99), warm-started between iterations,
- alpha/beta via LAPACK Cholesky factor-and-solve (the
  ``precision_mvnorm`` scheme of distributions.pyx:88-108),
- z via per-site products over the ragged visit structure
  (gibbs/logit.py:234-252), with the same update order.

This is deliberately a *CPU-idiomatic* implementation (sparse iterative
solvers, single core) so the floor is representative of what the
reference achieves, not a strawman.
"""

import numpy as np
from scipy.sparse import block_diag, csc_matrix
from scipy.sparse.linalg import minres

_T = 0.64
_HALF_PI_SQ = np.pi * np.pi / 8.0


def _ndtr(x):
    from scipy.special import ndtr

    return ndtr(x)


def pg_devroye_np(rng, z):
    """Vectorized numpy PG(1, z) (Devroye 2009 / Polson et al. 2013)."""
    c = 0.5 * np.abs(np.asarray(z, dtype=np.float64))
    shape = c.shape
    c = c.ravel()
    k_exp = _HALF_PI_SQ + 0.5 * c * c

    # mixture mass of the exponential tail piece
    p_tail = (np.pi / (2.0 * k_exp)) * np.exp(-k_exp * _T)
    rt = 1.0 / np.sqrt(_T)
    with np.errstate(over='ignore'):
        q_body = 2.0 * np.exp(-c) * (
            _ndtr(rt * (_T * c - 1.0))
            + np.exp(2.0 * c, where=c < 300, out=np.full_like(c, np.inf))
            * _ndtr(-rt * (_T * c + 1.0))
        )
    q_body = np.where(np.isfinite(q_body), q_body, 0.0)
    ratio = p_tail / (p_tail + q_body)

    x = np.full_like(c, _T)
    done = np.zeros(c.size, dtype=bool)
    committed = np.zeros(c.size, dtype=bool)
    is_exp = np.zeros(c.size, dtype=bool)
    for _ in range(64):
        todo = ~done
        m = int(todo.sum())
        if not m:
            break
        idx = np.flatnonzero(todo)
        ci = c[idx]
        u = rng.random(m)
        is_exp[idx] = np.where(committed[idx], is_exp[idx], u < ratio[idx])
        ie = is_exp[idx]

        xc = np.empty(m)
        valid = np.ones(m, dtype=bool)
        # exponential tail
        xc[ie] = _T + rng.exponential(size=int(ie.sum())) / k_exp[idx[ie]]
        # truncated inverse-Gaussian body
        bi = ~ie
        nb = int(bi.sum())
        if nb:
            cb = ci[bi]
            xb = np.empty(nb)
            okb = np.zeros(nb, dtype=bool)
            small = cb < 1.0 / _T
            ns = int(small.sum())
            if ns:
                e1 = rng.exponential(size=ns)
                e2 = rng.exponential(size=ns)
                ok = e1 * e1 <= 2.0 * e2 / _T
                xs = _T / ((1.0 + _T * e1) ** 2)
                ok &= rng.random(ns) < np.exp(-0.5 * xs * cb[small] ** 2)
                xb[small] = xs
                okb[small] = ok
            nl = nb - ns
            if nl:
                mu = 1.0 / cb[~small]
                y0 = rng.standard_normal(nl) ** 2
                muy = mu * y0
                xi = mu + 0.5 * mu * (muy - np.sqrt(4.0 * muy + muy * muy))
                flip = rng.random(nl) > mu / (mu + xi)
                xi = np.where(flip, mu * mu / xi, xi)
                xb[~small] = xi
                okb[~small] = xi <= _T
            xc[bi] = xb
            valid[bi] = okb

        # alternating-series accept
        v = rng.random(m)
        acc = valid & _series_accept_np(xc, v)
        sel = idx[acc]
        x[sel] = xc[acc]
        done[sel] = True
        committed[idx] = ~valid
    return (0.25 * x).reshape(shape)


def _series_accept_np(x, v):
    small = x <= _T

    def a_n(n):
        np5 = n + 0.5
        expo = np.where(
            small,
            1.5 * np.log(2.0 / (np.pi * x)) - 2.0 * np5 * np5 / x,
            -np5 * np5 * (np.pi * np.pi / 2.0) * x,
        )
        return np.pi * np5 * np.exp(expo)

    s = a_n(0.0)
    y = v * s
    accepted = np.zeros_like(x, dtype=bool)
    rejected = np.zeros_like(x, dtype=bool)
    for n in range(1, 9):
        term = a_n(float(n))
        if n % 2 == 1:
            s = s - term
            accepted |= (~rejected) & (y <= s)
        else:
            s = s + term
            rejected |= (~accepted) & (y > s)
        if (accepted | rejected).all():
            break
    return accepted | ~(accepted | rejected)


def _prec_mvnorm_np(rng, b, prec):
    from scipy.linalg import cho_factor, cho_solve, solve_triangular

    cf = cho_factor(prec, lower=True)
    mean = cho_solve(cf, b)
    eps = rng.standard_normal(b.size)
    return mean + solve_triangular(cf[0], eps, lower=True, trans=1)


class NumpyLogitICAR:
    """Reference-equivalent single-chain logit/ICAR Gibbs sampler (CPU)."""

    def __init__(self, Q, W, X, y, random_state=None):
        self.rng = np.random.default_rng(np.random.SFC64(random_state))
        self.X = np.asarray(X, dtype=np.float64)
        self.n, self.p = self.X.shape
        self.Q = csc_matrix(Q).astype(np.float64)

        sites = sorted(W)
        self.site_ids = np.array(sites)
        self.W_stack = np.vstack([W[s] for s in sites])
        self.y_stack = np.concatenate([y[s] for s in sites])
        visits = np.array([len(y[s]) for s in sites])
        self.sections = np.concatenate([[0], np.cumsum(visits)])
        self.obs_site = np.array(
            [bool(np.any(y[s])) for s in sites]
        )
        surveyed_mask = np.zeros(self.n, dtype=bool)
        surveyed_mask[self.site_ids] = True
        self.not_surveyed = np.flatnonzero(~surveyed_mask)

        # hyperparams (reference defaults, gibbs/base.py:177-186)
        qa = self.W_stack.shape[1]
        self.tau_rate = 0.005
        self.tau_shape = 0.5 + 0.5 * (self.n - 1)
        self.a_prec = np.eye(qa) / 10
        self.b_prec = np.eye(self.p) / 10
        self.a_prec_by_mu = np.zeros(qa)
        self.b_prec_by_mu = np.zeros(self.p)

        # eta conditional setup: block 2n sparse precision + eigenfactor
        self.block_Q = block_diag((self.Q, self.Q), format='csc')
        s_eig, u_eig = np.linalg.eigh(self.Q.toarray())
        self.eigen = u_eig[:, 1:] * np.sqrt(np.clip(s_eig[1:], 0, None))
        self._guess = None

        self._qa = qa
        self.reset(random_state)

    def reset(self, random_state=None):
        """Re-initialize the chain state without redoing the one-time
        spectral setup (the analog of the reference's ``copy()``, which
        shares precomputations across chains; gibbs/base.py:293-306)."""
        self.rng = np.random.default_rng(np.random.SFC64(random_state))
        self._guess = None
        self.z = np.ones(self.n)
        self.z[self.site_ids] = self.obs_site.astype(float)
        self.k = self.z - 0.5
        self.tau = self.rng.gamma(0.5, 1.0 / self.tau_rate)
        eta = self.rng.standard_normal(self.n)
        self.eta = eta - eta.mean()
        self.alpha = self.rng.standard_normal(self._qa)
        self.beta = self.rng.standard_normal(self.p)

    def _eta_draw(self, b, omega):
        n = self.n
        eps = self.rng.standard_normal(n + self.eigen.shape[1])
        pert = (
            b
            + np.sqrt(omega) * eps[:n]
            + self.eigen @ (np.sqrt(self.tau) * eps[n:])
        )
        prec = self.block_Q.copy()
        prec.data = self.tau * prec.data
        prec.setdiag(prec.diagonal() + np.tile(omega, 2))
        rhs = np.ones(2 * n)
        rhs[:n] = pert
        xz, info = minres(prec, rhs, x0=self._guess, rtol=1e-7)
        self._guess = xz
        x, zz = xz[:n], xz[n:]
        return x - zz * (x.sum() / zz.sum())

    def step(self):
        rng = self.rng
        # omega_b, tau, eta, beta
        lin_b = self.X @ self.beta + self.eta
        omega_b = pg_devroye_np(rng, lin_b)
        rate = 0.5 * self.eta @ (self.Q @ self.eta) + self.tau_rate
        self.tau = rng.gamma(self.tau_shape, 1.0 / rate)
        b_eta = self.k - omega_b * (self.X @ self.beta)
        self.eta = self._eta_draw(b_eta, omega_b)
        a_mat = (self.X.T * omega_b) @ self.X + self.b_prec
        b_vec = self.X.T @ (self.k - omega_b * self.eta) + self.b_prec_by_mu
        self.beta = _prec_mvnorm_np(rng, b_vec, a_mat)

        # omega_a over currently-occupied surveyed sites (ragged gather)
        occupied = self.z[self.site_ids] > 0
        seg_occ = np.flatnonzero(occupied)
        rows = np.concatenate([
            np.arange(self.sections[i], self.sections[i + 1])
            for i in seg_occ
        ]) if seg_occ.size else np.empty(0, dtype=int)
        w_occ = self.W_stack[rows]
        lin_a = w_occ @ self.alpha
        omega_a = pg_devroye_np(rng, lin_a)
        a_mat = (w_occ.T * omega_a) @ w_occ + self.a_prec
        b_vec = w_occ.T @ (self.y_stack[rows] - 0.5) + self.a_prec_by_mu
        self.alpha = _prec_mvnorm_np(rng, b_vec, a_mat)

        # z update at surveyed-not-observed and unsurveyed sites
        no_ids = self.site_ids[~self.obs_site]
        psi_no = 1.0 / (1.0 + np.exp(-(self.X[no_ids] @ self.beta
                                       + self.eta[no_ids])))
        det = 1.0 / (1.0 + np.exp(self.W_stack @ self.alpha))
        log_det = np.log(det)
        seg_no = np.flatnonzero(~self.obs_site)
        prod_miss = np.exp(np.array([
            log_det[self.sections[i]:self.sections[i + 1]].sum()
            for i in seg_no
        ]))
        num = psi_no * prod_miss
        p_no = num / (1.0 - psi_no + num)
        self.z[no_ids] = rng.random(no_ids.size) < p_no
        if self.not_surveyed.size:
            ns = self.not_surveyed
            p_ns = 1.0 / (1.0 + np.exp(-(self.X[ns] @ self.beta
                                         + self.eta[ns])))
            self.z[ns] = rng.random(ns.size) < p_ns
        self.k = self.z - 0.5

    def run(self, size, burnin=0, hb=None, hb_every=100):
        """Run ``size`` Gibbs iterations, returning post-burnin draws.

        ``hb``, when given, is called as ``hb(i, size)`` every
        ``hb_every`` iterations — the bench harness uses it to emit
        heartbeat lines *within* a chain so its activity watchdog does
        not mistake a slow floor chain (minutes at n=10000) for a
        wedged process.
        """
        keep = size - burnin
        out_alpha = np.empty((keep, self.alpha.size))
        out_beta = np.empty((keep, self.beta.size))
        out_tau = np.empty(keep)
        for i in range(size):
            self.step()
            if hb is not None and i % hb_every == 0 and i:
                hb(i, size)
            if i >= burnin:
                out_alpha[i - burnin] = self.alpha
                out_beta[i - burnin] = self.beta
                out_tau[i - burnin] = self.tau
        return {'alpha': out_alpha, 'beta': out_beta, 'tau': out_tau}


def _truncnorm_right(rng, loc):
    """Draw from N(loc, 1) truncated to (0, inf), inverse-CDF method
    (the scheme of reference gibbs/probit.py:11-16, 186-194)."""
    from scipy.special import ndtr, ndtri

    u = rng.random(loc.shape[0])
    return -ndtri(ndtr(loc) * (1.0 - u)) + loc


def _truncnorm_left(rng, loc):
    """Draw from N(loc, 1) truncated to (-inf, 0)."""
    from scipy.special import ndtr, ndtri

    u = rng.random(loc.shape[0])
    return ndtri(ndtr(-loc) * u) + loc


class NumpyLogitRSR(NumpyLogitICAR):
    """Reference-equivalent logit/RSR Gibbs sampler (CPU floor).

    Same algorithm as the reference's RSR variant (reference
    gibbs/logit.py:340-485): eta lives in the top-q Moran eigenbasis,
    its conditional is a dense q x q Gaussian solved by Cholesky, and
    ``spatial = K @ eta`` enters every site-level quantity.
    """

    def __init__(self, Q, W, X, y, random_state=None, q=None, r=0.5):
        super().__init__(Q, W, X, y, random_state=random_state)
        x = self.X
        n = self.n
        # Moran operator basis (reference gibbs/logit.py:415-447)
        xtx_inv_xt = np.linalg.solve(x.T @ x, x.T)
        p_mat = -(x @ xtx_inv_xt)
        p_mat[np.diag_indices_from(p_mat)] += 1.0
        q_dense = self.Q.toarray()
        a = -q_dense.copy()
        np.fill_diagonal(a, 0.0)
        moran = n * (p_mat.T @ a @ p_mat) / a.sum()
        w_eig, v_eig = np.linalg.eigh(moran)
        q_dim = int(q) if q else int((w_eig >= r).sum())
        self.K = v_eig[:, -q_dim:]
        self.Q_rsr = self.K.T @ q_dense @ self.K
        self.q_dim = q_dim
        self.tau_shape = 0.5 + 0.5 * q_dim
        s_eig, u_eig = np.linalg.eigh(self.Q_rsr)
        self.rsr_eigen = u_eig * np.sqrt(np.clip(s_eig, 0, None))
        self.reset(random_state)

    def reset(self, random_state=None):
        super().reset(random_state)
        if hasattr(self, 'q_dim'):
            self.eta = self.rng.normal(scale=5, size=self.q_dim)
            self.spatial = self.K @ self.eta

    def _eta_draw_rsr(self, omega_b):
        """Dense q-dim draw (reference gibbs/logit.py:325-337)."""
        k_mat = self.K
        b = k_mat.T @ (self.k - omega_b * (self.X @ self.beta))
        factor1 = k_mat.T * np.sqrt(omega_b)
        eps = self.rng.standard_normal(self.n + self.q_dim)
        pert = (
            b
            + factor1 @ eps[:self.n]
            + np.sqrt(self.tau) * (self.rsr_eigen @ eps[self.n:])
        )
        prec = factor1 @ factor1.T + self.tau * self.Q_rsr
        return np.linalg.solve(prec, pert)

    def step(self):
        rng = self.rng
        lin_b = self.X @ self.beta + self.spatial
        omega_b = pg_devroye_np(rng, lin_b)
        rate = 0.5 * self.eta @ (self.Q_rsr @ self.eta) + self.tau_rate
        self.tau = rng.gamma(self.tau_shape, 1.0 / rate)
        self.eta = self._eta_draw_rsr(omega_b)
        self.spatial = self.K @ self.eta
        a_mat = (self.X.T * omega_b) @ self.X + self.b_prec
        b_vec = self.X.T @ (self.k - omega_b * self.spatial) \
            + self.b_prec_by_mu
        self.beta = _prec_mvnorm_np(rng, b_vec, a_mat)

        occupied = self.z[self.site_ids] > 0
        seg_occ = np.flatnonzero(occupied)
        rows = np.concatenate([
            np.arange(self.sections[i], self.sections[i + 1])
            for i in seg_occ
        ]) if seg_occ.size else np.empty(0, dtype=int)
        w_occ = self.W_stack[rows]
        omega_a = pg_devroye_np(rng, w_occ @ self.alpha)
        a_mat = (w_occ.T * omega_a) @ w_occ + self.a_prec
        b_vec = w_occ.T @ (self.y_stack[rows] - 0.5) + self.a_prec_by_mu
        self.alpha = _prec_mvnorm_np(rng, b_vec, a_mat)

        no_ids = self.site_ids[~self.obs_site]
        psi_no = 1.0 / (1.0 + np.exp(
            -(self.X[no_ids] @ self.beta + self.spatial[no_ids])
        ))
        det = 1.0 / (1.0 + np.exp(self.W_stack @ self.alpha))
        log_det = np.log(det)
        seg_no = np.flatnonzero(~self.obs_site)
        prod_miss = np.exp(np.array([
            log_det[self.sections[i]:self.sections[i + 1]].sum()
            for i in seg_no
        ]))
        num = psi_no * prod_miss
        p_no = num / (1.0 - psi_no + num)
        self.z[no_ids] = rng.random(no_ids.size) < p_no
        if self.not_surveyed.size:
            ns = self.not_surveyed
            p_ns = 1.0 / (1.0 + np.exp(
                -(self.X[ns] @ self.beta + self.spatial[ns])
            ))
            self.z[ns] = rng.random(ns.size) < p_ns
        self.k = self.z - 0.5


class NumpyProbitICAR(NumpyLogitICAR):
    """CPU floor for the probit/ICAR sampler (like-for-like config 2).

    The reference has no probit/ICAR sampler; this is its probit/RSR
    algorithm (reference gibbs/probit.py:27-270) with the Moran-basis
    eta conditional replaced by the full-rank ICAR analog — precision
    ``tau*Q + I`` on the sum-to-zero hyperplane, drawn by the same
    perturbation + solve + kriging-projection scheme the reference's
    logit/ICAR eta uses (gibbs/logit.py:73-99) — so the rebuild's
    ``ProbitICARGibbs`` is measured against the same model family on
    CPU, not against the cheaper q-dimensional RSR floor.
    """

    def __init__(self, Q, W, X, y, random_state=None):
        super().__init__(Q, W, X, y, random_state=random_state)
        self.XTX_plus_bprec = self.X.T @ self.X + self.b_prec
        self.Q_dense = self.Q.toarray()
        self.reset(random_state)

    def reset(self, random_state=None):
        super().reset(random_state)
        self.eps = self.rng.standard_normal(self.n)
        self.omega_b = np.zeros(self.n)

    def _eta_draw_probit(self):
        """Constrained draw from N(Lambda^{-1} b, Lambda^{-1}) on the
        sum-to-zero hyperplane, Lambda = tau*Q + I (unit utility noise)."""
        from scipy.linalg import cho_factor, cho_solve

        b = self.omega_b - self.X @ self.beta - self.eps
        eps_all = self.rng.standard_normal(self.n + self.eigen.shape[1])
        pert = (
            b
            + eps_all[:self.n]
            + self.eigen @ (np.sqrt(self.tau) * eps_all[self.n:])
        )
        lam = self.tau * self.Q_dense + np.eye(self.n)
        cf = cho_factor(lam, lower=True)
        x = cho_solve(cf, pert)
        h = cho_solve(cf, np.ones(self.n))
        return x - h * (x.sum() / h.sum())

    def step(self):
        from scipy.special import log_ndtr, ndtr

        rng = self.rng
        loc = self.X @ self.beta + self.eta + self.eps
        occ = self.z > 0
        self.omega_b[occ] = _truncnorm_right(rng, loc[occ])
        self.omega_b[~occ] = _truncnorm_left(rng, loc[~occ])

        rate = 0.5 * self.eta @ (self.Q_dense @ self.eta) + self.tau_rate
        self.tau = rng.gamma(self.tau_shape, 1.0 / rate)

        mean = 0.5 * (self.omega_b - self.X @ self.beta - self.eta)
        self.eps = mean + rng.standard_normal(self.n) / np.sqrt(2.0)

        self.eta = self._eta_draw_probit()

        b_vec = self.b_prec_by_mu + self.X.T @ (
            self.omega_b - self.eta - self.eps
        )
        self.beta = _prec_mvnorm_np(rng, b_vec, self.XTX_plus_bprec)

        occupied = self.z[self.site_ids] > 0
        seg_occ = np.flatnonzero(occupied)
        rows = np.concatenate([
            np.arange(self.sections[i], self.sections[i + 1])
            for i in seg_occ
        ]) if seg_occ.size else np.empty(0, dtype=int)
        w_occ = self.W_stack[rows]
        y_occ = self.y_stack[rows] > 0
        loc_a = w_occ @ self.alpha
        omega_a = np.empty(loc_a.shape[0])
        omega_a[y_occ] = _truncnorm_right(rng, loc_a[y_occ])
        omega_a[~y_occ] = _truncnorm_left(rng, loc_a[~y_occ])
        a_mat = w_occ.T @ w_occ + self.a_prec
        b_vec = self.a_prec_by_mu + w_occ.T @ omega_a
        self.alpha = _prec_mvnorm_np(rng, b_vec, a_mat)

        no_ids = self.site_ids[~self.obs_site]
        psi_no = ndtr(
            self.X[no_ids] @ self.beta + self.eta[no_ids]
            + self.eps[no_ids]
        )
        log_det = log_ndtr(-(self.W_stack @ self.alpha))
        seg_no = np.flatnonzero(~self.obs_site)
        prod_miss = np.exp(np.array([
            log_det[self.sections[i]:self.sections[i + 1]].sum()
            for i in seg_no
        ]))
        num = psi_no * prod_miss
        p_no = num / (1.0 - psi_no + num)
        self.z[no_ids] = rng.random(no_ids.size) < p_no
        if self.not_surveyed.size:
            ns = self.not_surveyed
            p_ns = ndtr(
                self.X[ns] @ self.beta + self.eta[ns] + self.eps[ns]
            )
            self.z[ns] = rng.random(ns.size) < p_ns
        self.k = self.z - 0.5


class NumpyProbitRSR(NumpyLogitRSR):
    """Reference-equivalent probit/RSR Gibbs sampler (CPU floor).

    The algorithm of reference gibbs/probit.py:27-270: Albert-Chib
    truncated-normal latent utilities with the extra heteroskedastic
    site effect ``eps`` (gibbs/probit.py:216-221), eta in the Moran
    basis with precision K'K + tau*Q_rsr (gibbs/probit.py:223-229),
    beta with the fixed precision X'X + b_prec (gibbs/probit.py:237),
    update order omega_b -> tau -> eps -> eta -> beta -> omega_a ->
    alpha -> z (gibbs/probit.py:262-270).
    """

    def __init__(self, Q, W, X, y, random_state=None, q=None, r=0.5):
        super().__init__(Q, W, X, y, random_state=random_state, q=q, r=r)
        self.KTK = self.K.T @ self.K
        self.XTX_plus_bprec = self.X.T @ self.X + self.b_prec
        self.reset(random_state)

    def reset(self, random_state=None):
        super().reset(random_state)
        self.eps = self.rng.standard_normal(self.n)
        self.omega_b = np.zeros(self.n)

    def step(self):
        from scipy.special import log_ndtr, ndtr

        rng = self.rng
        # latent occupancy utilities, truncated by current z
        loc = self.X @ self.beta + self.spatial + self.eps
        occ = self.z > 0
        self.omega_b[occ] = _truncnorm_right(rng, loc[occ])
        self.omega_b[~occ] = _truncnorm_left(rng, loc[~occ])

        rate = 0.5 * self.eta @ (self.Q_rsr @ self.eta) + self.tau_rate
        self.tau = rng.gamma(self.tau_shape, 1.0 / rate)

        mean = 0.5 * (self.omega_b - self.X @ self.beta - self.spatial)
        self.eps = mean + rng.standard_normal(self.n) / np.sqrt(2.0)

        a_mat = self.KTK + self.tau * self.Q_rsr
        b_vec = self.K.T @ (
            self.omega_b - self.X @ self.beta - self.eps
        )
        self.eta = _prec_mvnorm_np(rng, b_vec, a_mat)
        self.spatial = self.K @ self.eta

        b_vec = self.b_prec_by_mu + self.X.T @ (
            self.omega_b - self.spatial - self.eps
        )
        self.beta = _prec_mvnorm_np(rng, b_vec, self.XTX_plus_bprec)

        # latent detection utilities over currently-occupied sites
        occupied = self.z[self.site_ids] > 0
        seg_occ = np.flatnonzero(occupied)
        rows = np.concatenate([
            np.arange(self.sections[i], self.sections[i + 1])
            for i in seg_occ
        ]) if seg_occ.size else np.empty(0, dtype=int)
        w_occ = self.W_stack[rows]
        y_occ = self.y_stack[rows] > 0
        loc_a = w_occ @ self.alpha
        omega_a = np.empty(loc_a.shape[0])
        omega_a[y_occ] = _truncnorm_right(rng, loc_a[y_occ])
        omega_a[~y_occ] = _truncnorm_left(rng, loc_a[~y_occ])
        a_mat = w_occ.T @ w_occ + self.a_prec
        b_vec = self.a_prec_by_mu + w_occ.T @ omega_a
        self.alpha = _prec_mvnorm_np(rng, b_vec, a_mat)

        # occupancy update at not-observed and unsurveyed sites
        no_ids = self.site_ids[~self.obs_site]
        psi_no = ndtr(
            self.X[no_ids] @ self.beta + self.spatial[no_ids]
            + self.eps[no_ids]
        )
        log_det = log_ndtr(-(self.W_stack @ self.alpha))
        seg_no = np.flatnonzero(~self.obs_site)
        prod_miss = np.exp(np.array([
            log_det[self.sections[i]:self.sections[i + 1]].sum()
            for i in seg_no
        ]))
        num = psi_no * prod_miss
        p_no = num / (1.0 - psi_no + num)
        self.z[no_ids] = rng.random(no_ids.size) < p_no
        if self.not_surveyed.size:
            ns = self.not_surveyed
            p_ns = ndtr(
                self.X[ns] @ self.beta + self.spatial[ns] + self.eps[ns]
            )
            self.z[ns] = rng.random(ns.size) < p_ns
        self.k = self.z - 0.5
