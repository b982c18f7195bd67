"""Site-axis sharding of the lattice ICAR operators (shard_map + halos).

Chains are this domain's data-parallel axis (occuspytial_tpu.parallel);
the *site* axis is its tensor/sequence-parallel analog: for lattices too
large for one chip's HBM (or to cut per-chip latency), the (rows, cols)
grid is split into contiguous row bands across a ``sites`` mesh axis.
The lattice operator only couples adjacent rows, so a single
``jax.lax.ppermute`` halo exchange of one boundary row per neighbor per
matvec is the entire communication cost — O(cols) bytes over ICI versus
O(rows*cols/k) compute per chip.

Provided here:

- ``matvec_sharded``: Q v with halo exchange, numerically identical to
  ops/stencil.py:matvec on the gathered vector;
- ``cg_solve_sharded``: the same Jacobi-style preconditioned CG as the
  single-chip path but with per-shard matvecs and ``psum`` reductions for
  the CG inner products. (The DCT preconditioner is global; the sharded
  path uses the diagonal preconditioner — a few more iterations in
  exchange for zero extra collectives.)

Use under ``jax.shard_map`` with mesh axis name ``'sites'`` (optionally
combined with a ``'chains'`` axis; see __graft_entry__.dryrun_multichip).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _exchange_halo(local, axis_name):
    """Send first/last rows to the neighboring shards along ``sites``.

    ``local`` is this shard's (band_rows, cols) block. Returns
    (top_halo, bottom_halo): the last row of the previous shard and the
    first row of the next shard (zeros at the lattice boundary).
    """
    idx = lax.axis_index(axis_name)
    n_shards = lax.axis_size(axis_name)

    # shift downward: shard i receives shard i-1's last row
    top = lax.ppermute(
        local[-1, :], axis_name,
        [(i, i + 1) for i in range(n_shards - 1)],
    )
    # shift upward: shard i receives shard i+1's first row
    bottom = lax.ppermute(
        local[0, :], axis_name,
        [(i + 1, i) for i in range(n_shards - 1)],
    )
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bottom = jnp.where(
        idx == n_shards - 1, jnp.zeros_like(bottom), bottom
    )
    return top, bottom


def matvec_sharded(spec, deg_local, v_local, axis_name='sites'):
    """Q v for this shard's row band; one halo exchange per call.

    ``v_local``/``deg_local``: (band_rows, cols) blocks of the site grid.
    Supports rook (4) and queen (8) neighborhoods with rho from ``spec``.
    """
    top, bottom = _exchange_halo(v_local, axis_name)
    g = jnp.concatenate(
        [top[None, :], v_local, bottom[None, :]], axis=0
    )  # (band+2, cols) with halos
    r = g.shape[0]
    acc = jnp.zeros_like(g)
    acc = acc.at[:, 1:].add(g[:, :-1])
    acc = acc.at[:, :-1].add(g[:, 1:])
    acc = acc.at[1:, :].add(g[:-1, :])
    acc = acc.at[:-1, :].add(g[1:, :])
    if spec.max_neighbors == 8:
        acc = acc.at[1:, 1:].add(g[:-1, :-1])
        acc = acc.at[:-1, :-1].add(g[1:, 1:])
        acc = acc.at[1:, :-1].add(g[:-1, 1:])
        acc = acc.at[:-1, 1:].add(g[1:, :-1])
    interior = acc[1:r - 1, :]
    return deg_local * v_local - spec.rho * interior


def cg_solve_sharded(
    spec, deg_local, rhs_local, x0_local, omega_local, tau, iters,
    axis_name='sites',
):
    """Solve (tau*Q + diag(omega)) x = rhs with site-sharded operands.

    Shapes per shard: rhs/x0 (r, band_rows*cols) flattened over the local
    band; omega (band_rows*cols,). Inner products psum over ``sites``.
    """
    band = deg_local.shape
    m = band[0] * band[1]

    def mv(v):  # v: (r, m)
        out = jax.vmap(
            lambda row: matvec_sharded(
                spec, deg_local, row.reshape(band), axis_name
            ).reshape(m)
        )(v)
        return tau * out + omega_local * v

    inv_diag = 1.0 / (tau * deg_local.reshape(m) *
                      jnp.ones_like(omega_local) + omega_local)

    def dot(a, b):
        local = jnp.sum(a * b, axis=-1, keepdims=True)
        return lax.psum(local, axis_name)

    tiny = jnp.asarray(1e-30, rhs_local.dtype)

    def cond(c):
        return c[0] < iters

    def body(c):
        k, x, r_, p, rz = c
        ap = mv(p)
        alpha = rz / jnp.maximum(dot(p, ap), tiny)
        x = x + alpha * p
        r_ = r_ - alpha * ap
        z = inv_diag * r_
        rzn = dot(r_, z)
        beta = rzn / jnp.maximum(rz, tiny)
        return k + 1, x, r_, z + beta * p, rzn

    r0 = rhs_local - mv(x0_local)
    z0 = inv_diag * r0
    _, x, _, _, _ = lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), x0_local, r0, z0, dot(r0, z0)),
    )
    return x
