"""One-sided truncated-normal sampling via the inverse-CDF method.

TPU-native analog of reference gibbs/probit.py:11-24
(``truncnorm_inf_ppf`` / ``truncnorm_neginf_ppf``): draws from N(loc, 1)
truncated to (0, inf) or (-inf, 0), used by the probit samplers'
Albert-Chib latent-variable updates. All functions are elementwise,
branch-free (``jnp.where``), and computed through ``log_ndtr`` for tail
stability so that extreme locations do not saturate the CDF in float32.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtri


def _safe_ndtri_exp(log_q):
    """ndtri(exp(log_q)) clamped into the open unit interval.

    In float32 ``exp(log_q)`` saturates to exactly 0.0 or 1.0 once
    ``|draw| >~ 5.3`` sigma, sending ndtri to +/-inf and poisoning the
    downstream masked reductions (0 * inf = NaN). Clamping costs nothing
    statistically: it truncates draws at ~5.3 sigma (f32) / ~8 sigma (f64).
    """
    q = jnp.exp(log_q)
    eps = jnp.finfo(q.dtype).eps
    return ndtri(jnp.clip(q, eps, 1.0 - eps))


def truncnorm_positive(key, loc):
    """Sample w ~ N(loc, 1) truncated to (0, inf), elementwise.

    Inverse-CDF: with a = -loc, w - loc has the lower-truncated standard
    normal distribution on (a, inf), whose quantile function is
    -ndtri(ndtr(-a) * (1 - p)) (reference gibbs/probit.py:11-16). Computed
    in log space: log(ndtr(-a) * (1-p)) = log_ndtr(-a) + log1p(-p).
    """
    p = jax.random.uniform(key, loc.shape, loc.dtype)
    log_arg = log_ndtr(loc) + jnp.log1p(-p)
    return loc - _safe_ndtri_exp(log_arg)


def truncnorm_negative(key, loc):
    """Sample w ~ N(loc, 1) truncated to (-inf, 0), elementwise.

    Quantile function of the upper-truncated tail: ndtri(ndtr(b) * p) with
    b = -loc (reference gibbs/probit.py:19-24).
    """
    p = jax.random.uniform(key, loc.shape, loc.dtype)
    log_arg = log_ndtr(-loc) + jnp.log(p)
    return loc + _safe_ndtri_exp(log_arg)


def truncnorm_sign(key, loc, positive):
    """Sample N(loc, 1) truncated to (0, inf) if ``positive`` else (-inf, 0).

    Single fused draw covering the probit samplers' masked two-tail update
    (reference gibbs/probit.py:186-194, 202-209) without boolean gathers.
    """
    p = jax.random.uniform(key, loc.shape, loc.dtype)
    log_pos = log_ndtr(loc) + jnp.log1p(-p)
    log_neg = log_ndtr(-loc) + jnp.log(jnp.maximum(p, jnp.finfo(p.dtype).tiny))
    draw_pos = loc - _safe_ndtri_exp(log_pos)
    draw_neg = loc + _safe_ndtri_exp(log_neg)
    return jnp.where(positive, draw_pos, draw_neg)
