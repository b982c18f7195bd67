"""Scalar log-tau move for the ASIS interweave (shared kernel piece).

Both model families' ancillary tau conditionals have the same form

    log f(log t) = a0*log t - b0*t + A/sqrt(t) - C/t

(see LogitICARGibbs._asis_tau / _ProbitBase._asis_tau for the A, C
statistics); this module provides the 1-D update on ``lt = log tau``:

- ``'mh'``   — fixed-count random-walk Metropolis sub-steps (default;
  proposal sd and step count are the tuned knobs). At the tuned
  headline defaults the 12-step composition has measured lag-1
  autocorrelation ~0.005 on the conditional — effectively an exact
  draw, so the kernel choice is not what limits tau ESS there;
- ``'slice'``— Neal (2003) slice sampling with capped stepping-out and
  shrinkage, restructured branch-free for ``lax.fori_loop``. Exact for
  any cap (the step-out cap is part of Neal's procedure; the shrink
  loop is truncated at ``steps`` iterations, after which the chain
  stays put — each rejected proposal halves the bracket toward the
  current point, so non-acceptance within 12+ steps has vanishing
  probability). One draw per call (measured lag-1 ~0.16), but
  self-tuning: the bracket expands to the local scale of f, so it is
  the robust choice when tau's scale is far from the tuned proposal sd
  (e.g. unusual lattices or informative hyperpriors).

Everything is scalar per chain (a handful of transcendental ops), so
the move is free next to the PG/utility draws regardless of method.
"""

import jax
import jax.numpy as jnp


def mh_log_move(key, lt0, logf, sd, steps, dtype):
    """``steps`` random-walk MH sub-steps on lt (round-1 kernel)."""
    k1, k2 = jax.random.split(key)
    # randomness for all sub-steps drawn as two vectors up front:
    # per-step key splits cost ~25 scalar ops each, which dominates
    # the (otherwise ~free) move on small single-chain models
    props = jax.random.normal(k1, (steps,), dtype) * sd
    log_us = jnp.log(jax.random.uniform(k2, (steps,), dtype))

    def body(i, lt):
        prop = lt + props[i]
        return jnp.where(log_us[i] < logf(prop) - logf(lt), prop, lt)

    return jax.lax.fori_loop(0, steps, body, lt0)


def slice_log_move(key, lt0, logf, width, steps, dtype, expands=8):
    """One slice-sampling update of lt (stepping-out + shrinkage)."""
    k_y, k_place, k_j, k_shrink = jax.random.split(key, 4)
    w = jnp.asarray(width, dtype)
    y_level = logf(lt0) - jax.random.exponential(k_y, dtype=dtype)

    # initial bracket of width w randomly placed around lt0, then
    # Neal's capped stepping-out: the total expansion budget is split
    # uniformly between the two ends (required for exactness)
    left = lt0 - w * jax.random.uniform(k_place, (), dtype)
    right = left + w
    j_cap = jnp.floor(
        expands * jax.random.uniform(k_j, (), dtype)
    ).astype(jnp.int32)
    k_cap = (expands - 1) - j_cap

    def expand(i, lr):
        lo, hi = lr
        lo = jnp.where((i < j_cap) & (logf(lo) > y_level), lo - w, lo)
        hi = jnp.where((i < k_cap) & (logf(hi) > y_level), hi + w, hi)
        return lo, hi

    left, right = jax.lax.fori_loop(0, expands, expand, (left, right))

    # shrinkage: uniform proposals on the current bracket; a rejected
    # proposal becomes the new end on its side of lt0; the FIRST
    # accepted proposal is the draw (later iterations are frozen)
    us = jax.random.uniform(k_shrink, (steps,), dtype)

    def shrink(i, c):
        lo, hi, lt, done = c
        prop = lo + us[i] * (hi - lo)
        ok = (logf(prop) >= y_level) & ~done
        reject = ~done & ~ok
        lt = jnp.where(ok, prop, lt)
        lo = jnp.where(reject & (prop < lt0), prop, lo)
        hi = jnp.where(reject & (prop >= lt0), prop, hi)
        return lo, hi, lt, done | ok

    _, _, lt, _ = jax.lax.fori_loop(
        0, steps, shrink,
        (left, right, lt0, jnp.zeros((), bool)),
    )
    return lt


def log_tau_move(key, lt0, logf, method, sd, steps, dtype):
    """Dispatch on the configured ASIS move type."""
    if method == 'slice':
        return slice_log_move(key, lt0, logf, sd, steps, dtype)
    return mh_log_move(key, lt0, logf, sd, steps, dtype)
