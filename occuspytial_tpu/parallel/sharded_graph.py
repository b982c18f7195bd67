"""Site-axis sharding of the banded graph operators (shard_map + halos).

The arbitrary-graph solver's block-tridiagonal layout (ops/graph.py) is
what makes multi-chip site sharding natural for irregular adjacencies:
in RCM-permuted block space the operator couples only *adjacent* blocks,
so splitting the ``nb`` blocks into contiguous runs across a ``sites``
mesh axis needs exactly one ``jax.lax.ppermute`` halo exchange of a
single ``bs``-vector per neighbor per matvec — O(bs) bytes over ICI
versus O(nb/k * bs^2) MXU compute per chip. (Compare
parallel/sharded_stencil.py, the lattice instance of the same recipe;
this module is its analog for the graphs the lattice stencil cannot
express — the reference covers those with sparse MINRES on one core,
reference gibbs/logit.py:80-92.)

Everything here operates in the RCM-permuted, padded block space: the
caller permutes/pads once on the host (``ops/graph.build`` already
produces the panels and permutation) and shards the ``(nb, bs, bs)``
panels and ``(..., nb*bs)`` vectors into contiguous block runs.

Provided:

- ``banded_matvec_sharded``: Q_perm v with block halo exchange,
  numerically identical to ops/graph.py:banded_matvec on the gathered
  vector;
- ``cg_solve_sharded``: the deflated-Jacobi preconditioned CG of
  ops/graph.py:cg_solve with per-shard matvecs, ``psum`` inner
  products, and the thin deflation contractions reduced over the
  ``sites`` axis.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _exchange_block_halo(v_local, axis_name):
    """Send first/last blocks to the neighboring shards along
    ``sites``.

    ``v_local``: this shard's (..., nb_local, bs) run of blocks.
    Returns (top, bottom): the previous shard's last block and the next
    shard's first block (zeros at the global boundary).
    """
    idx = lax.axis_index(axis_name)
    n_shards = lax.axis_size(axis_name)

    top = lax.ppermute(
        v_local[..., -1, :], axis_name,
        [(i, i + 1) for i in range(n_shards - 1)],
    )
    bottom = lax.ppermute(
        v_local[..., 0, :], axis_name,
        [(i + 1, i) for i in range(n_shards - 1)],
    )
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bottom = jnp.where(
        idx == n_shards - 1, jnp.zeros_like(bottom), bottom
    )
    return top, bottom


def banded_matvec_sharded(
    diag_l, sub_l, sup_l, v_local, axis_name='sites'
):
    """``Q_perm v`` for this shard's block run; one halo exchange.

    ``diag_l``/``sub_l``/``sup_l``: (nb_local, bs, bs) panel runs;
    ``v_local``: (..., nb_local, bs). Same plain-'nij' contractions as
    ops/graph.py:banded_matvec (see there for why the super-diagonal is
    stored explicitly).
    """
    hp = jax.lax.Precision.HIGHEST
    top, bottom = _exchange_block_halo(v_local, axis_name)
    vm = jnp.concatenate(
        [top[..., None, :], v_local[..., :-1, :]], axis=-2
    )
    vp = jnp.concatenate(
        [v_local[..., 1:, :], bottom[..., None, :]], axis=-2
    )
    return (
        jnp.einsum('nij,...nj->...ni', diag_l, v_local, precision=hp)
        + jnp.einsum('nij,...nj->...ni', sub_l, vm, precision=hp)
        + jnp.einsum('nij,...nj->...ni', sup_l, vp, precision=hp)
    )


def cg_solve_sharded(
    panels_local, rhs_local, x0_local, omega_local, tau, iters,
    defl_vecs_local=None, defl_vals=None, axis_name='sites',
):
    """Solve ``(tau*Q + diag(omega)) x = rhs`` with site-sharded blocks.

    Per-shard shapes: ``panels_local`` = (diag, sub, sup) each
    (nb_local, bs, bs); ``rhs_local``/``x0_local`` (r, nb_local*bs);
    ``omega_local`` (nb_local*bs,) — all in RCM-permuted padded order
    with padded-tail omega = 1 (see ops/graph.py:cg_solve).
    ``defl_vecs_local`` (nb_local*bs, m) + ``defl_vals`` (m,) enable the
    deflated-Jacobi preconditioner; its thin contractions reduce over
    ``sites`` with one psum each.
    """
    diag_l, sub_l, sup_l = panels_local
    nb_local, bs = diag_l.shape[0], diag_l.shape[1]
    m = nb_local * bs

    def mv(v):  # (r, m)
        vb = v.reshape(v.shape[:-1] + (nb_local, bs))
        qv = banded_matvec_sharded(diag_l, sub_l, sup_l, vb, axis_name)
        return tau * qv.reshape(v.shape) + omega_local * v

    # deg diag of Q_perm = diagonal of the diagonal panels
    deg_l = jnp.diagonal(diag_l, axis1=-2, axis2=-1).reshape(m)
    jac = 1.0 / (tau * deg_l + omega_local)

    def psum(x):
        return lax.psum(x, axis_name)

    if defl_vecs_local is not None:
        # global mean of omega over the real+padded lanes (cbar only
        # shifts the preconditioner spectrum; the padded tail's omega=1
        # entries perturb it harmlessly, matching the single-chip path)
        cbar = psum(jnp.sum(omega_local)) / psum(
            jnp.asarray(omega_local.size, omega_local.dtype)
        )
        dinv = 1.0 / (tau * defl_vals + cbar)

        def pc(r):
            ru = psum(r @ defl_vecs_local)            # (r, m) -> (r, k)
            r_perp = r - ru @ defl_vecs_local.T
            w = r_perp * jac
            wu = psum(w @ defl_vecs_local)
            w_perp = w - wu @ defl_vecs_local.T
            return w_perp + (ru * dinv) @ defl_vecs_local.T
    else:

        def pc(r):
            return r * jac

    def dot(a, b):
        return psum(jnp.sum(a * b, axis=-1, keepdims=True))

    tiny = jnp.asarray(1e-30, rhs_local.dtype)

    def cond(c):
        return c[0] < iters

    def body(c):
        k, x, r_, p, rz = c
        ap = mv(p)
        alpha = rz / jnp.maximum(dot(p, ap), tiny)
        x = x + alpha * p
        r_ = r_ - alpha * ap
        z = pc(r_)
        rzn = dot(r_, z)
        beta = rzn / jnp.maximum(rz, tiny)
        return k + 1, x, r_, z + beta * p, rzn

    r0 = rhs_local - mv(x0_local)
    z0 = pc(r0)
    _, x, _, _, _ = lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), x0_local, r0, z0, dot(r0, z0)),
    )
    return x
