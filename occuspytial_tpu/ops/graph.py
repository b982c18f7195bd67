"""Matrix-free ICAR operators for ARBITRARY sparse adjacency graphs.

The reference's large-n path assembles the sparse precision and solves
the eta system with MINRES (reference gibbs/logit.py:80-92) — it works
for any spatial graph, not just rectangular lattices. The rebuild's
:mod:`stencil` path is faster but lattice-only; this module is the
general-graph analog, built TPU-first around *static-shape* padded
neighbor lists instead of a sparse matrix type:

- ``build`` flattens Q (scipy.sparse or dense) once on the host into an
  ELL layout — per-site neighbor index/weight panels ``(n, k_max)`` —
  plus an edge list for the exact noise factor and an optional small
  deflation eigenbasis;
- ``matvec``: ``Q v = deg * v - sum_k w_k * v[nbr_k]`` — one gather and
  a tiny reduction, fused by XLA; O(n * k_max) with no dynamic shapes;
- ``noise``: exact ``B eps`` with ``B B' = Q`` through the weighted
  edge-incidence factorization ``Q = sum_e w_e (e_i - e_j)(e_i - e_j)'
  + diag(surplus)`` — one scatter-add over the static edge list;
- ``precond``: deflated Jacobi. Plain Jacobi stalls on the smooth modes
  of Q (eigenvalue ~0) whenever ``tau`` dominates ``omega``; the
  ``m``-dimensional bottom eigenbasis of Q (a one-time sparse Lanczos
  on the host) is preconditioned *exactly* as ``1/(tau*s_i + cbar)``
  and only the well-conditioned complement is left to Jacobi. The
  apply is four thin ``(n, m)`` MXU matmuls — negligible next to the
  gathers — and cuts the required CG budget severalfold at large tau.

TPU random gathers are slow (the ELL matvec measured ~15x behind the
lattice stencil at 10k sites), so the CG inner loop gets a second,
MXU-native operator layout when the graph admits it: ``build`` computes
a reverse-Cuthill-McKee ordering, and if the reordered bandwidth fits a
modest dense band it stores Q as **block-tridiagonal dense tiles** —
``(nb, bs, bs)`` diagonal and sub-diagonal panels with ``bs`` a
multiple of 128 covering the bandwidth.  The banded matvec is then
three batched dense matmuls with *no gathers at all* (the off-diagonal
terms are static block shifts), which XLA tiles straight onto the MXU;
vmapped over chains and stacked right-hand sides it runs as a well-fed
matmul batch.  ``cg_solve`` permutes rhs/warm-start/omega into RCM
order once per solve (2 gathers per solve instead of one per CG
iteration) and solves entirely in the permuted space.  The one-off
operators (``noise``, ``quad_form``, the residual diagnostic's
``matvec``) stay on the exact ELL/edge-list path in original ordering.

The lattice stencil remains the preferred path when the graph *is* a
lattice (its DCT preconditioner is near-exact and its shift matvec does
no gathers); this path is for the county-adjacency / irregular-mesh
graphs real occupancy datasets are built on.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


#: panel-size cap for the block-tridiagonal layout: 3 * nb * bs^2 * 4B
#: of HBM for the tiles. 192 MB admits bandwidth ~900 at 16k sites;
#: past that the ELL gather path takes over.
_BANDED_BYTES_CAP = 192 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    """Static (hashable) summary of a built graph; the array payload
    lives in the sampler's ``fixed`` dict under ``gr_*`` keys."""

    n: int
    k_max: int
    n_edges: int
    has_surplus: bool
    deflate: int
    #: dense-tile size of the block-tridiagonal CG operator (0 = ELL
    #: gathers only — bandwidth too large for the panel cap)
    block: int = 0
    #: n padded up to a multiple of ``block`` (== n when block == 0)
    n_pad: int = 0


def build(Q, deflate=64, dtype=np.float32, block='auto'):
    """Flatten a precision matrix into static-shape graph panels.

    Returns ``(spec, arrays)`` where ``arrays`` maps ``gr_*`` keys to
    numpy arrays ready for the sampler's ``fixed`` dict. ``Q`` may be
    any scipy.sparse matrix or a dense array; it must be symmetric with
    non-positive off-diagonal entries (an (I)CAR precision / graph
    Laplacian — reference utils.py:38-103 builds exactly this form).
    ``deflate`` is the rank of the bottom-eigenbasis preconditioner
    block (0 disables; capped at n - 2). ``block`` controls the
    MXU block-tridiagonal CG layout: ``'auto'`` enables it whenever the
    RCM (or natural) bandwidth fits the panel memory cap, ``0``
    disables it, an int forces that tile size.
    """
    import scipy.sparse as sps

    q = Q.tocoo() if sps.issparse(Q) else sps.coo_matrix(np.asarray(Q))
    n = q.shape[0]
    if q.shape[0] != q.shape[1]:
        raise ValueError('Q must be square')

    off = q.row != q.col
    r, c, w = q.row[off], q.col[off], -q.data[off]
    keep = w != 0.0
    r, c, w = r[keep], c[keep], w[keep]
    if np.any(w < 0):
        raise ValueError(
            'Q must have non-positive off-diagonal entries '
            '(CAR/ICAR precision form)'
        )
    # symmetry is load-bearing, not cosmetic: matvec uses the rows as
    # given, noise() factors only the upper triangle (B B' = sym(Q)),
    # and the banded layout mirrors the sub-diagonal — an asymmetric Q
    # (e.g. a one-sided adjacency list) would feed three mutually
    # inconsistent operators into the sampler with no error
    q_csr = q.tocsr()
    asym = abs(q_csr - q_csr.T)
    if asym.nnz and asym.max() > 1e-8 * max(1.0, abs(q_csr).max()):
        raise ValueError('Q must be symmetric')
    diag = np.zeros(n)
    np.add.at(diag, q.row[~off], q.data[~off])

    rowsum = np.zeros(n)
    np.add.at(rowsum, r, w)
    surplus = diag - rowsum
    tol = 1e-8 * max(1.0, float(np.abs(diag).max()))
    if np.any(surplus < -tol):
        raise ValueError(
            'Q has a row whose off-diagonal mass exceeds its diagonal; '
            'not a valid CAR/ICAR precision'
        )
    surplus = np.maximum(surplus, 0.0)
    has_surplus = bool(surplus.max() > tol)

    # ELL panels: per-row neighbor indices/weights, padded to the max
    # degree with self-indices at weight zero (gathers stay in-bounds)
    deg_count = np.zeros(n, np.int64)
    np.add.at(deg_count, r, 1)
    k_max = max(int(deg_count.max()), 1)
    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k_max))
    wgt = np.zeros((n, k_max), dtype)
    order = np.argsort(r, kind='stable')
    rs, cs, ws = r[order], c[order], w[order]
    if rs.size:
        # slot within each row's contiguous run after the stable sort
        row_start = np.r_[0, np.flatnonzero(rs[1:] != rs[:-1]) + 1]
        run_len = np.diff(np.r_[row_start, rs.size])
        pos = np.arange(rs.size) - np.repeat(row_start, run_len)
        idx[rs, pos] = cs.astype(np.int32)
        wgt[rs, pos] = ws.astype(dtype)

    # undirected edge list (each pair once) for the noise factor
    upper = r < c
    esrc = r[upper].astype(np.int32)
    edst = c[upper].astype(np.int32)
    ew = w[upper].astype(dtype)

    arrays = {
        'gr_idx': idx,
        'gr_w': wgt,
        'gr_deg': diag.astype(dtype),
        'gr_esrc': esrc,
        'gr_edst': edst,
        'gr_ew_sqrt': np.sqrt(ew).astype(dtype),
        'gr_surplus_sqrt': np.sqrt(surplus).astype(dtype),
    }

    m = int(min(max(deflate, 0), max(n - 2, 0)))
    if m > 0:
        vals, vecs = _bottom_eigs(q.tocsr(), m)
        arrays['gr_defl_vals'] = vals.astype(dtype)
        arrays['gr_defl_vecs'] = vecs.astype(dtype)

    bs, n_pad = _banded_panels(q.tocsr(), arrays, block, dtype)

    spec = GraphSpec(
        n=n, k_max=k_max, n_edges=int(esrc.size),
        has_surplus=has_surplus, deflate=m, block=bs, n_pad=n_pad,
    )
    return spec, arrays


def _banded_panels(q_csr, arrays, block, dtype):
    """Attach the block-tridiagonal MXU layout to ``arrays`` if viable.

    Orders the graph by reverse Cuthill–McKee *or* keeps the natural
    ordering, whichever has the smaller bandwidth (a lattice assembled
    row-major is already optimally banded; RCM roughly doubles it,
    while an arbitrarily-numbered irregular graph drops from O(n) to
    O(sqrt n)). Tile size is the smallest multiple of 128 covering the
    bandwidth, so every off-diagonal entry lands in the diagonal or
    first sub-diagonal block row.
    """
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if block == 0:
        return 0, 0
    n = q_csr.shape[0]

    def bandwidth(qm):
        qc = qm.tocoo()
        return int(np.abs(qc.row - qc.col).max()) if qc.nnz else 0

    perm = np.asarray(
        reverse_cuthill_mckee(q_csr, symmetric_mode=True), np.int64
    )
    q_rcm = q_csr[perm][:, perm]
    bw_nat, bw_rcm = bandwidth(q_csr), bandwidth(q_rcm)
    if bw_nat <= bw_rcm:
        perm, qp, bw = np.arange(n, dtype=np.int64), q_csr, bw_nat
    else:
        qp, bw = q_rcm, bw_rcm

    if block == 'auto':
        bs = 128 * max((bw + 127) // 128, 1)
        nb = -(-n // bs)
        if nb < 2 or 3 * nb * bs * bs * 4 > _BANDED_BYTES_CAP:
            return 0, 0
    else:
        bs = int(block)
        if bs % 128 or bs < bw:
            raise ValueError(
                f'block={bs} must be a multiple of 128 covering the '
                f'bandwidth ({bw})'
            )
        nb = -(-n // bs)
    n_pad = nb * bs

    diag_p = np.zeros((nb, bs, bs), dtype)
    sub_p = np.zeros((nb, bs, bs), dtype)
    qp = sps.csr_matrix(qp)
    for i in range(nb):
        r0, r1 = i * bs, min((i + 1) * bs, n)
        blk = qp[r0:r1, r0:r1].toarray()
        diag_p[i, : r1 - r0, : r1 - r0] = blk
        if i:
            c0 = (i - 1) * bs
            blk = qp[r0:r1, c0 : i * bs].toarray()
            sub_p[i, : r1 - r0, :] = blk

    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)
    # super-diagonal panels stored explicitly (sup_p[i] = sub_p[i+1]'):
    # +50% panel memory, but the matvec then needs only plain 'nij'
    # contractions — the transposed 'nji' einsum sends the XLA TPU
    # compiler into a pathological tiling search at small batch sizes
    # (measured 120s vs 7s compile for the B=6 guardrail shape)
    sup_p = np.roll(sub_p, -1, axis=0).transpose(0, 2, 1).copy()
    arrays['gr_bd_diag'] = diag_p
    arrays['gr_bd_sub'] = sub_p
    arrays['gr_bd_sup'] = sup_p
    arrays['gr_perm'] = perm.astype(np.int32)
    arrays['gr_iperm'] = iperm.astype(np.int32)
    # permuted+padded companions for the in-band preconditioner
    deg_p = np.ones(n_pad, dtype)
    deg_p[:n] = arrays['gr_deg'][perm]
    arrays['gr_deg_p'] = deg_p
    if 'gr_defl_vecs' in arrays:
        vecs_p = np.zeros((n_pad, arrays['gr_defl_vecs'].shape[1]), dtype)
        vecs_p[:n] = arrays['gr_defl_vecs'][perm]
        arrays['gr_defl_vecs_p'] = vecs_p
    return bs, n_pad


def _bottom_eigs(q_csr, m):
    """m smallest eigenpairs of the (PSD, possibly singular) precision.

    Shift-invert Lanczos at a small negative shift — ``Q + sigma*I`` is
    PD even for the singular ICAR case, so the factorization never
    fails, and 'LM' of the inverse are exactly the bottom modes of Q.
    Falls back to a dense solve below 512 sites (cheaper than Lanczos).
    """
    from scipy.sparse.linalg import eigsh

    n = q_csr.shape[0]
    if n <= 512:
        vals, vecs = np.linalg.eigh(q_csr.toarray())
        return vals[:m], vecs[:, :m]
    sigma = -1e-3 * max(1.0, float(q_csr.diagonal().max()))
    vals, vecs = eigsh(q_csr, k=m, sigma=sigma, which='LM')
    order = np.argsort(vals)
    return np.maximum(vals[order], 0.0), vecs[:, order]


def matvec(fixed, v):
    """``Q v`` on (..., n) vectors: one gather + padded-lane reduction."""
    nb = jnp.take(v, fixed['gr_idx'], axis=-1)  # (..., n, k_max)
    return fixed['gr_deg'] * v - jnp.sum(fixed['gr_w'] * nb, axis=-1)


def quad_form(fixed, v):
    """``v' Q v`` (tau update) without materializing Q."""
    return jnp.sum(v * matvec(fixed, v))


def noise(spec, fixed, key, dtype=jnp.float32):
    """Exact ``B eps`` with ``B B' = Q`` via the incidence factor."""
    k_e, k_d = jax.random.split(key)
    eps = jax.random.normal(k_e, (spec.n_edges,), dtype)
    contrib = fixed['gr_ew_sqrt'] * eps
    out = (
        jnp.zeros(spec.n, dtype)
        .at[fixed['gr_esrc']].add(contrib)
        .at[fixed['gr_edst']].add(-contrib)
    )
    if spec.has_surplus:
        out = out + fixed['gr_surplus_sqrt'] * jax.random.normal(
            k_d, (spec.n,), dtype
        )
    return out


def banded_matvec(spec, fixed, v):
    """``Q_perm v`` through the block-tridiagonal dense tiles.

    ``v`` is (..., n_pad) in RCM-permuted order. Three batched matmuls
    (diagonal, sub-diagonal, its transpose as the super-diagonal) with
    static block shifts — no gathers; XLA maps the einsums onto the
    MXU, and leading batch dims (chains x rhs rows) feed it full tiles.
    Float32 accumulation (``Precision.HIGHEST``) keeps the CG residual
    at the ELL path's exact-f32 level; the FLOP count is tiny.
    """
    hp = jax.lax.Precision.HIGHEST
    nb = spec.n_pad // spec.block
    vb = v.reshape(v.shape[:-1] + (nb, spec.block))
    zeros = jnp.zeros_like(vb[..., :1, :])
    vm = jnp.concatenate([zeros, vb[..., :-1, :]], axis=-2)
    vp = jnp.concatenate([vb[..., 1:, :], zeros], axis=-2)
    y = (
        jnp.einsum('nij,...nj->...ni', fixed['gr_bd_diag'], vb,
                   precision=hp)
        + jnp.einsum('nij,...nj->...ni', fixed['gr_bd_sub'], vm,
                     precision=hp)
        + jnp.einsum('nij,...nj->...ni', fixed['gr_bd_sup'], vp,
                     precision=hp)
    )
    return y.reshape(v.shape)


def _deflated_jacobi(jac, u, s, tau, cbar, r):
    """Shared deflated-Jacobi apply (SPD by construction).

    Exact spectral treatment ``1/(tau*s_i + cbar)`` on the bottom
    eigenbasis U, symmetric Jacobi on its complement:

        M^{-1} = U D_s^{-1} U' + (I - UU') D_j (I - UU')
    """
    ru = r @ u
    r_perp = r - ru @ u.T
    w = r_perp * jac
    w_perp = w - (w @ u) @ u.T
    return w_perp + (ru / (tau * s + cbar)) @ u.T


def precond_apply(spec, fixed, tau, omega, r):
    """Deflated-Jacobi preconditioner in the original (ELL) ordering."""
    jac = 1.0 / (tau * fixed['gr_deg'] + omega)
    if spec.deflate == 0:
        return r * jac
    return _deflated_jacobi(
        jac, fixed['gr_defl_vecs'], fixed['gr_defl_vals'], tau,
        jnp.mean(omega), r,
    )


def cg_solve(spec, fixed, rhs, x0, omega, tau, iters,
             return_resid=False):
    """Solve ``(tau*Q + diag(omega)) x = rhs`` matrix-free; rhs/x0 are
    (rhs_count, n). With ``return_resid=True`` also returns the final
    relative residual (see ops/cg.py:pcg).

    With a banded layout (``spec.block > 0``) the whole CG runs in the
    RCM-permuted space on the MXU tiles: rhs, warm start and omega are
    permuted once per *solve* (two O(n) gathers) instead of gathering
    per CG iteration.
    """
    from .cg import pcg

    if spec.block:
        perm, iperm = fixed['gr_perm'], fixed['gr_iperm']
        pad = spec.n_pad - spec.n

        def to_p(x, fill=0.0):
            xp = jnp.take(x, perm, axis=-1)
            if pad:
                widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
                xp = jnp.pad(xp, widths, constant_values=fill)
            return xp

        # padded tail: Q rows are zero, omega = 1 keeps the padded
        # subsystem SPD with solution identically zero
        omega_p = to_p(omega, fill=1.0)
        jac = 1.0 / (tau * fixed['gr_deg_p'] + omega_p)
        cbar = jnp.mean(omega)

        def mv(v):
            return tau * banded_matvec(spec, fixed, v) + omega_p * v

        if spec.deflate:
            u = fixed['gr_defl_vecs_p']
            s = fixed['gr_defl_vals']

            def pc(r):
                return _deflated_jacobi(jac, u, s, tau, cbar, r)
        else:

            def pc(r):
                return r * jac

        out = pcg(mv, pc, to_p(rhs), to_p(x0), iters,
                  return_resid=return_resid)
        if return_resid:
            sol_p, rel = out
            return jnp.take(sol_p, iperm, axis=-1), rel
        return jnp.take(out, iperm, axis=-1)

    def mv(v):
        return tau * matvec(fixed, v) + omega * v

    def pc(v):
        return precond_apply(spec, fixed, tau, omega, v)

    return pcg(mv, pc, rhs, x0, iters, return_resid=return_resid)


def constrained_mvnorm(spec, fixed, key, b, omega, tau, warm, iters,
                       return_resid=False):
    """Constrained eta draw (1'eta = 0) on an arbitrary graph.

    Same distribution as ops/mvnorm.py:constrained_icar_mvnorm with all
    operators matrix-free. Returns ``(eta, new_warm)``, plus the
    solve's relative residual when ``return_resid=True``.
    """
    from .mvnorm import sum_to_zero

    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (spec.n,), b.dtype)
    y = b + jnp.sqrt(omega) * eps1 + jnp.sqrt(tau) * noise(
        spec, fixed, k2, b.dtype
    )
    rhs = jnp.stack([y, jnp.ones_like(y)])
    out = cg_solve(spec, fixed, rhs, warm, omega, tau, iters,
                   return_resid=return_resid)
    if return_resid:
        sol, rel = out
        return sum_to_zero(sol[0], sol[1]), sol, rel
    sol = out
    return sum_to_zero(sol[0], sol[1]), sol
