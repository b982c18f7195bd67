"""Matrix-free lattice ICAR operators for large site counts.

The reference scales the eta draw with a sparse MINRES over the assembled
precision (reference gibbs/logit.py:80-92); at 10k+ sites even storing a
dense Q (400MB+) or eigendecomposing it is wasteful. When the spatial
graph is a rectangular lattice (the construction of
``rand_precision_mat``, reference utils.py:38-103), everything the
sampler needs is expressible without materializing Q at all:

- ``matvec``: Q v = deg * v - rho * (sum of neighbor shifts) on the
  (rows, cols) grid — O(n) VPU work;
- ``noise``: an exact factor B with B B' = Q via the edge-incidence
  decomposition Q = rho * sum_edges (e_i - e_j)(e_i - e_j)'
  + (1 - rho) * D, sampled directionally with grid shifts — O(n);
- ``precond``: a spectral preconditioner in the 2-D DCT-II basis, using
  the lattice operator's Neumann symbol
  lam(i, j) = deg_interior - 2 rho (cos th_i + cos ph_j [+ 2 cos th_i
  cos ph_j for queen]) — two small (rows, rows)/(cols, cols) MXU matmuls
  per application, exact up to boundary effects (it preconditions, so
  only the CG iteration count depends on the approximation).

This makes sampler setup O(n) and the per-iteration eta draw O(cg_iters
* n) with tiny constants, scaling to 100k+ sites on one chip.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LatticeSpec:
    """Static description of the lattice behind an ICAR precision."""

    rows: int
    cols: int
    max_neighbors: int = 8  # 4 = rook, 8 = queen
    rho: float = 1.0

    def __post_init__(self):
        if self.max_neighbors not in (4, 8):
            raise ValueError(
                'Maximum number of neighbors should be one of {4, 8}'
            )

    @property
    def n(self):
        """Total number of lattice sites."""
        return self.rows * self.cols


def degree_grid(spec):
    """Number of neighbors per cell, as an (rows, cols) numpy array."""
    r, c = spec.rows, spec.cols
    ones = np.ones((r, c))
    deg = np.zeros((r, c))
    # horizontal + vertical
    deg[:, 1:] += 1
    deg[:, :-1] += 1
    deg[1:, :] += 1
    deg[:-1, :] += 1
    if spec.max_neighbors == 8:
        deg[1:, 1:] += 1
        deg[:-1, :-1] += 1
        deg[1:, :-1] += 1
        deg[:-1, 1:] += 1
    return deg * ones


def matvec(spec, deg, v):
    """Q v on flattened site vectors v (..., n); deg is (rows, cols).

    Shift-add form (VPU slice updates): exact, layout-free; used for
    setup-time validation and the halo-exchange sharded variant. The hot
    loop uses :func:`matvec_mxu` instead — same operator as matmuls.
    """
    r, c = spec.rows, spec.cols
    g = v.reshape(v.shape[:-1] + (r, c))
    acc = jnp.zeros_like(g)
    # pairwise neighbor sums via shifts
    acc = acc.at[..., :, 1:].add(g[..., :, :-1])
    acc = acc.at[..., :, :-1].add(g[..., :, 1:])
    acc = acc.at[..., 1:, :].add(g[..., :-1, :])
    acc = acc.at[..., :-1, :].add(g[..., 1:, :])
    if spec.max_neighbors == 8:
        acc = acc.at[..., 1:, 1:].add(g[..., :-1, :-1])
        acc = acc.at[..., :-1, :-1].add(g[..., 1:, 1:])
        acc = acc.at[..., 1:, :-1].add(g[..., :-1, 1:])
        acc = acc.at[..., :-1, 1:].add(g[..., 1:, :-1])
    out = deg * g - spec.rho * acc
    return out.reshape(v.shape)


def shift_matrix(m, dtype=np.float32):
    """(m, m) tridiagonal 0/1 matrix: (S v)_i = v_{i-1} + v_{i+1}."""
    s = np.zeros((m, m), dtype)
    idx = np.arange(m - 1)
    s[idx, idx + 1] = 1.0
    s[idx + 1, idx] = 1.0
    return s


def matvec_mxu(spec, fixed, v):
    """Q v as batched small matmuls (the hot-loop form).

    The neighbor sum of a rectangular stencil factors through the 1-D
    shift matrices ``S_r`` (rows) and ``S_c`` (cols):

        rook neighbors  = S_r g + g S_c
        queen diagonals = S_r g S_c      (exactly the 4 diagonal cells)

    so the whole matvec is 2-3 (rows x rows)/(cols x cols) matmuls per
    grid — MXU work with one read and one write of ``g``, instead of 8
    padded slice-adds through HBM. ``precision='highest'`` keeps it
    exact f32 (the MXU's default one-pass bf16 would reintroduce
    cancellation noise); the FLOPs are negligible either way.
    """
    r, c = spec.rows, spec.cols
    g = v.reshape(v.shape[:-1] + (r, c))
    s_r, s_c = fixed['lat_shift_r'], fixed['lat_shift_c']
    gr = jnp.einsum('ab,...bc->...ac', s_r, g, precision='highest')
    acc = gr + jnp.einsum('...ab,bc->...ac', g, s_c, precision='highest')
    if spec.max_neighbors == 8:
        acc = acc + jnp.einsum(
            '...ab,bc->...ac', gr, s_c, precision='highest'
        )
    out = fixed['lat_deg'] * g - spec.rho * acc
    return out.reshape(v.shape)


def quad_form(spec, deg, v):
    """v' Q v (for the tau update) without materializing Q."""
    return jnp.sum(v * matvec(spec, deg, v))


def noise(spec, deg, key, dtype=jnp.float32):
    """Draw B eps with B B' = Q, exactly, via the incidence factor.

    Q = rho * M' M + (1 - rho) * D with M the oriented edge-incidence
    matrix: each edge (i, j) contributes sqrt(rho) * eps_e * (e_i - e_j),
    realized directionally with shifted grids.
    """
    r, c = spec.rows, spec.cols
    dirs = [(0, 1), (1, 0)]
    if spec.max_neighbors == 8:
        dirs += [(1, 1), (1, -1)]
    keys = jax.random.split(key, len(dirs) + 1)
    out = jnp.zeros((r, c), dtype)
    sr = jnp.sqrt(jnp.asarray(spec.rho, dtype))
    for (dr, dc), k in zip(dirs, keys[:-1]):
        er = r - dr
        ec = c - abs(dc)
        eps = jax.random.normal(k, (er, ec), dtype)
        if dc >= 0:
            out = out.at[:er, :ec].add(sr * eps)
            out = out.at[dr:, dc:].add(-sr * eps)
        else:  # anti-diagonal: (i, j+1) -> (i+1, j)
            out = out.at[:er, -dc:].add(sr * eps)
            out = out.at[dr:, :ec].add(-sr * eps)
    if spec.rho < 1.0:
        eps_d = jax.random.normal(keys[-1], (r, c), dtype)
        out = out + jnp.sqrt((1.0 - spec.rho) * deg) * eps_d
    return out.reshape(spec.n)


def dct_basis(m):
    """Orthonormal DCT-II basis matrix (m, m) and path-Laplacian symbol
    angles, as numpy (one-time setup)."""
    k = np.arange(m)[:, None]
    i = np.arange(m)[None, :]
    mat = np.cos(np.pi * k * (2 * i + 1) / (2 * m))
    mat *= np.sqrt(2.0 / m)
    mat[0] *= np.sqrt(0.5)
    theta = np.pi * np.arange(m) / m
    return mat, theta


def symbol_grid(spec):
    """Neumann symbol of the lattice operator on the DCT mode grid."""
    _, th = dct_basis(spec.rows)
    _, ph = dct_basis(spec.cols)
    ct = np.cos(th)[:, None]
    cp = np.cos(ph)[None, :]
    if spec.max_neighbors == 4:
        deg_int = 4.0
        sym = deg_int - spec.rho * 2.0 * (ct + cp)
    else:
        deg_int = 8.0
        sym = deg_int - spec.rho * 2.0 * (ct + cp + 2.0 * ct * cp)
    return np.maximum(sym, 0.0)


def setup(spec, dtype=np.float32):
    """One-time numpy setup bundle for the stencil solver."""
    deg = degree_grid(spec).astype(dtype)
    cr, _ = dct_basis(spec.rows)
    cc, _ = dct_basis(spec.cols)
    return {
        'lat_deg': deg,
        'lat_dct_r': cr.astype(dtype),
        'lat_dct_c': cc.astype(dtype),
        'lat_sym': symbol_grid(spec).astype(dtype),
        'lat_shift_r': shift_matrix(spec.rows, dtype),
        'lat_shift_c': shift_matrix(spec.cols, dtype),
    }


def precond_apply(spec, fixed, tau, cbar, v):
    """(tau * Q_symbol + cbar)^{-1} v in the DCT basis; v is (..., n)."""
    r, c = spec.rows, spec.cols
    cr, cc = fixed['lat_dct_r'], fixed['lat_dct_c']
    g = v.reshape(v.shape[:-1] + (r, c))
    spec_coef = jnp.einsum('ri,...ij,cj->...rc', cr, g, cc)
    spec_coef = spec_coef / (tau * fixed['lat_sym'] + cbar)
    out = jnp.einsum('ri,...rc,cj->...ij', cr, spec_coef, cc)
    return out.reshape(v.shape)


def cg_solve(spec, fixed, rhs, x0, omega, tau, iters,
             return_resid=False):
    """Solve (tau*Q + diag(omega)) x = rhs matrix-free with DCT-
    preconditioned CG; rhs/x0 are (rhs_count, n). With
    ``return_resid=True`` also returns the final relative residual
    (see ops/cg.py:pcg)."""
    from .cg import pcg

    cbar = jnp.mean(omega)

    def mv(v):
        return tau * matvec_mxu(spec, fixed, v) + omega * v

    def pc(v):
        return precond_apply(spec, fixed, tau, cbar, v)

    return pcg(mv, pc, rhs, x0, iters, return_resid=return_resid)


def constrained_mvnorm(spec, fixed, key, b, omega, tau, warm, iters,
                       return_resid=False):
    """Constrained eta draw (1'eta = 0) for the lattice ICAR model.

    Same distribution as ops/mvnorm.py:constrained_icar_mvnorm, all
    operators matrix-free. Returns (eta, new_warm), plus the solve's
    relative residual when ``return_resid=True``.
    """
    from .mvnorm import sum_to_zero

    n = spec.n
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (n,), b.dtype)
    y = b + jnp.sqrt(omega) * eps1 + jnp.sqrt(tau) * noise(
        spec, fixed['lat_deg'], k2, b.dtype
    )
    rhs = jnp.stack([y, jnp.ones_like(y)])
    out = cg_solve(spec, fixed, rhs, warm, omega, tau, iters,
                   return_resid=return_resid)
    if return_resid:
        sol, rel = out
        return sum_to_zero(sol[0], sol[1]), sol, rel
    sol = out
    return sum_to_zero(sol[0], sol[1]), sol
