"""Pólya-Gamma PG(1, z) sampling in pure JAX (TPU-native).

The reference library (occuspytial) calls the external C library
``polyagamma`` (``random_polyagamma``; see reference gibbs/logit.py:191,202)
inside the per-iteration hot loop of its logit samplers. On TPU the draw must
be (a) free of data-dependent Python control flow, (b) vmappable over
(chains, sites) and (c) expressed with static shapes. This module provides
two samplers:

``pg_devroye``
    The exact alternating-series rejection sampler of Devroye (2009) as
    organised by Polson, Scott & Windle (2013, JASA). Rejection is handled by
    *masked resampling rounds* inside a single ``lax.while_loop``: every round
    proposes candidates for all lanes simultaneously and accepted lanes
    freeze. Per-round acceptance is high (>0.5 uniformly in z), so the loop
    exits after a handful of rounds even for very large arrays.

``pg_gamma``
    The truncated sum-of-gammas representation

        PG(1, z) = (1 / (2 pi^2)) * sum_k g_k / ((k - 1/2)^2 + z^2/(4 pi^2))

    with ``g_k ~ Exp(1)`` i.i.d., truncated at ``trunc`` terms plus an
    *exact-in-expectation* tail-mean correction (the analytic tail of the
    series sum). Fixed work, no rejection loop: this is the
    throughput-oriented variant (pure VPU code, no while_loop barrier).

Both samplers return PG(1, z) draws with the convention
E[PG(1, z)] = tanh(z/2) / (2 z).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import log_ndtr

# Devroye's threshold separating the two proposal branches.
_T = 0.64
_HALF_PI_SQ = jnp.pi * jnp.pi / 8.0
# Maximum masked resampling rounds. Each round succeeds with prob > 0.5 per
# lane; 64 rounds bounds the failure probability per lane below 1e-19.
_MAX_ROUNDS = 64
# Number of alternating-series terms used for the acceptance test. Both
# branch exponents equal -3.158*(n+1/2)^2 at the worst point x = t, so the
# bracket width after 4 terms is a_4/a_0 ~ 3e-27 of the density bound —
# every lane is decided to far below float64 resolution and the
# undecided->accept fallback bias is ~1e-27 per draw.
_N_SERIES = 4


def _mass_texpon(c):
    """P(choose the truncated-exponential branch) for |z|/2 = c.

    Mixture weights of the two-piece proposal from Polson/Scott/Windle
    Algorithm 1: an Exp tail on (t, inf) and a truncated inverse-Gaussian
    body on (0, t).
    """
    k = _HALF_PI_SQ + 0.5 * c * c
    # p: mass of the exponential piece.
    log_p = jnp.log(jnp.pi / (2.0 * k)) - k * _T
    # q: mass of the inverse-Gaussian piece,
    #    q = 2 exp(-c) * IG_cdf(t; mu=1/c, lambda=1)
    # computed in log-space to stay finite for large c.
    rt = 1.0 / jnp.sqrt(_T)
    a1 = rt * (_T * c - 1.0)
    a2 = -rt * (_T * c + 1.0)
    # 2*(exp(-c + logPhi(a1)) + exp(c + logPhi(a2)))
    log_q = jnp.log(2.0) + jnp.logaddexp(-c + log_ndtr(a1), c + log_ndtr(a2))
    return jnp.exp(log_p - jnp.logaddexp(log_p, log_q))


def _series_accept(x, v):
    """Alternating-series accept/reject decision of Devroye's method.

    Evaluates partial sums S_n of the piecewise coefficients

        a_n(x) = pi (n + 1/2) * (2/(pi x))^{3/2} exp(-2 (n+1/2)^2 / x), x <= t
        a_n(x) = pi (n + 1/2) * exp(-(n+1/2)^2 pi^2 x / 2),             x >  t

    and accepts when Y = v * a_0(x) falls below an odd partial sum before
    exceeding an even one. Fully unrolled (static _N_SERIES terms): partial
    sums bracket the density and the brackets nest, so scanning a fixed
    number of terms and OR-ing the decisions is exact up to terms smaller
    than float precision.
    """
    small = x <= _T

    # terms via the exact ratio recurrence a_{n+1}/a_n =
    # ((2n+3)/(2n+1)) * q^{n+1} with q = exp(-4/x) (small branch) /
    # exp(-pi^2 x) (big branch): 2 exps + 1 log for the whole series
    # instead of one exp per term (same factorization as the fused
    # Pallas kernel, ops/pallas_pg.py:series_accept)
    a0 = (0.5 * jnp.pi) * jnp.exp(
        jnp.where(
            small,
            jnp.log(2.0 / (jnp.pi * x)) * 1.5 - 0.5 / x,
            -(jnp.pi * jnp.pi / 8.0) * x,
        )
    )
    q = jnp.exp(jnp.where(small, -4.0 / x, -(jnp.pi * jnp.pi) * x))
    y = v * a0
    s = a0
    term = a0
    qp = jnp.ones_like(x)
    accepted = jnp.zeros_like(x, dtype=bool)
    rejected = jnp.zeros_like(x, dtype=bool)
    undecided = jnp.ones_like(x, dtype=bool)
    for n in range(1, _N_SERIES + 1):
        qp = qp * q  # q^n
        term = term * ((2.0 * n + 1.0) / (2.0 * n - 1.0)) * qp
        if n % 2 == 1:
            s = s - term
            accepted = accepted | (undecided & (y <= s))
        else:
            s = s + term
            rejected = rejected | (undecided & (y > s))
        undecided = ~(accepted | rejected)
    # Undecided after _N_SERIES terms means the remaining bracket width is
    # below float precision; treating it as accepted is exact at that scale.
    return accepted | undecided


def _propose_once(key, c, ratio, k_exp, committed, is_exp):
    """One masked proposal round for every lane.

    The branch choice (exponential tail vs truncated-IG body) is *sticky*:
    a lane re-flips its branch only when it is not ``committed``. Once a
    body-branch lane's inner tIG proposal fails, the lane stays committed to
    the body branch for the next round — re-flipping there would over-sample
    the always-valid exponential branch relative to its mixture mass and
    bias the tail upward.

    Returns ``(x, accepted, committed', is_exp')``.
    """
    # every consumer gets its own subkey. Deriving extras from a subkey
    # already passed to a sampling primitive (e.g. fold_in(kv, 1) after
    # normal(kv, shape)) is NOT safe: fold_in(k, i) == split(k, n)[i]
    # and split shares the key's counter stream with random_bits, so the
    # derived key would equal the raw bits behind lanes 2-3 of the
    # earlier draw, correlating the two streams on those lanes
    ku, ke1, ke2, kig, kacc, kv, kflip, kseries = jax.random.split(key, 8)
    shape = c.shape
    dt = c.dtype

    u = jax.random.uniform(ku, shape, dt)
    is_exp = jnp.where(committed, is_exp, u < ratio)

    # --- branch A: exponential tail, x = t + Exp(1)/K (always a valid
    #     proposal from the mixture) ---
    e_tail = jax.random.exponential(ke1, shape, dt)
    x_exp = _T + e_tail / k_exp

    # --- branch B: truncated inverse-Gaussian body on (0, t) ---
    # B1 (c < 1/t): squeeze sampler based on two exponentials.
    e1 = jax.random.exponential(ke2, shape, dt)
    e2 = jax.random.exponential(kig, shape, dt)
    ok_sq = e1 * e1 <= 2.0 * e2 / _T
    x_sq = _T / ((1.0 + _T * e1) ** 2)
    u_acc = jax.random.uniform(kacc, shape, dt)
    ok_sq = ok_sq & (u_acc < jnp.exp(-0.5 * x_sq * c * c))

    # B2 (c >= 1/t): Michael-Schucany-Haas IG(mu=1/c, 1) transform, reject
    # unless the draw lands inside (0, t).
    mu = 1.0 / jnp.maximum(c, 1e-30)
    y0 = jax.random.normal(kv, shape, dt) ** 2
    mu_y = mu * y0
    x_ig = mu + 0.5 * mu * (mu_y - jnp.sqrt(4.0 * mu_y + mu_y * mu_y))
    u_flip = jax.random.uniform(kflip, shape, dt)
    x_ig = jnp.where(u_flip <= mu / (mu + x_ig), x_ig, mu * mu / x_ig)
    ok_ig = x_ig <= _T

    use_squeeze = c < (1.0 / _T)
    x_body = jnp.where(use_squeeze, x_sq, x_ig)
    ok_body = jnp.where(use_squeeze, ok_sq, ok_ig)

    x = jnp.where(is_exp, x_exp, x_body)
    valid = is_exp | ok_body

    # --- series acceptance test (only meaningful for valid proposals) ---
    v = jax.random.uniform(kseries, shape, dt)
    accepted = valid & _series_accept(x, v)

    # invalid body proposal -> stay committed to the body branch;
    # valid-but-series-rejected -> re-flip next round.
    committed = ~valid
    return x, accepted, committed, is_exp


def pg_devroye(key, z):
    """Draw PG(1, z) exactly, elementwise over ``z`` (any shape).

    TPU-native replacement for the reference's ``random_polyagamma(1, b)``
    (reference gibbs/logit.py:191-193, 202-204). Works under jit/vmap/scan.
    """
    z = jnp.asarray(z)
    c = 0.5 * jnp.abs(z)
    k_exp = _HALF_PI_SQ + 0.5 * c * c
    ratio = _mass_texpon(c)

    def cond(carry):
        _, done, _, _, _, n = carry
        return (~jnp.all(done)) & (n < _MAX_ROUNDS)

    def body(carry):
        x, done, committed, is_exp, k, n = carry
        k, sub = jax.random.split(k)
        x_new, acc, committed, is_exp = _propose_once(
            sub, c, ratio, k_exp, committed, is_exp
        )
        x = jnp.where(done, x, jnp.where(acc, x_new, x))
        return x, done | acc, committed, is_exp, k, n + 1

    x0 = jnp.full_like(c, _T)  # fallback value; overwritten w.p. ~1
    done0 = jnp.zeros_like(c, dtype=bool)
    committed0 = jnp.zeros_like(c, dtype=bool)
    x, _, _, _, _, _ = lax.while_loop(
        cond, body, (x0, done0, committed0, done0, key, 0)
    )
    # J*(1, c) / 4 is PG(1, z) with c = |z|/2.
    return 0.25 * x


def pg_gamma(key, z, trunc=64):
    """Draw PG(1, z) via the truncated sum-of-gammas series.

    Fixed work (``trunc`` exponentials per lane), no rejection: the
    throughput-oriented sampler. The truncation bias of the first moment is
    removed exactly by adding the analytic tail mean

        tail = (1/(2 pi^2)) * [ pi tanh(pi a) / (2 a) - sum_{k<=K} w_k ],
        a = z / (2 pi),  w_k = 1 / ((k - 1/2)^2 + a^2).
    """
    z = jnp.asarray(z)
    a = jnp.abs(z) / (2.0 * jnp.pi)
    k_idx = jnp.arange(1, trunc + 1, dtype=z.dtype)
    denom = (k_idx - 0.5) ** 2 + a[..., None] ** 2  # (..., K)
    g = jax.random.exponential(key, denom.shape, z.dtype)
    series = jnp.sum(g / denom, axis=-1)
    # analytic full-series weight sum: pi tanh(pi a)/(2 a); a->0 limit pi^2/2
    a_safe = jnp.maximum(a, 1e-12)
    full = jnp.where(
        a < 1e-6,
        jnp.pi * jnp.pi / 2.0 * (1.0 - (jnp.pi * a) ** 2 / 3.0),
        jnp.pi * jnp.tanh(jnp.pi * a_safe) / (2.0 * a_safe),
    )
    tail_mean = full - jnp.sum(1.0 / denom, axis=-1)
    return (series + tail_mean) / (2.0 * jnp.pi * jnp.pi)


@functools.partial(jax.jit, static_argnames=("method", "trunc"))
def random_polyagamma(key, z, method="devroye", trunc=64):
    """Dispatching wrapper mirroring the reference's entry point."""
    if method == "devroye":
        return pg_devroye(key, z)
    if method == "gamma":
        return pg_gamma(key, z, trunc=trunc)
    raise ValueError(f"unknown PG sampling method: {method!r}")


def pg_mean(z):
    """E[PG(1, z)] = tanh(z/2) / (2 z), with the z->0 limit 1/4."""
    z = jnp.asarray(z)
    zs = jnp.where(jnp.abs(z) < 1e-6, 1.0, z)
    return jnp.where(
        jnp.abs(z) < 1e-6,
        0.25 - z * z / 48.0,
        jnp.tanh(zs / 2.0) / (2.0 * zs),
    )


def pg_var(z):
    """Var[PG(1, z)]; z->0 limit is 1/24."""
    z = jnp.asarray(z)
    zs = jnp.where(jnp.abs(z) < 1e-3, 1.0, z)
    sech2 = 1.0 / jnp.cosh(zs / 2.0) ** 2
    v = (jnp.sinh(zs) - zs) * sech2 / (4.0 * zs**3)
    return jnp.where(jnp.abs(z) < 1e-3, 1.0 / 24.0, v)
