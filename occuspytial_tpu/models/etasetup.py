"""Shared host-side setup for the matrix-free eta solvers.

The logit and probit ICAR samplers solve the same family of SPD systems
``(tau*Q + diag(omega)) x = b`` for the spatial-field draw (the probit
case with ``omega = 1``, reference gibbs/probit.py:223-229; the logit
case with Pólya-Gamma omega, reference gibbs/logit.py:80-92). Both
large-n operator layouts — the O(n) lattice stencil and the
arbitrary-graph ELL/banded panels — are built once on the host here so
each sampler's ``_configure`` stays a thin dispatch.
"""

import numpy as np
import jax.numpy as jnp

from ..ops import graph as graph_ops
from ..ops import stencil


def setup_stencil(lattice, Q, n):
    """Validate ``Q`` against the declared lattice; return fixed arrays.

    O(n) matrix-free setup — the declared lattice is trusted only after
    a random host-side matvec against the actual Q reproduces the
    stencil's action (catches mismatched dims/neighbor order/rho).
    """
    import scipy.sparse as sps

    if lattice.n != n:
        raise ValueError(
            f'lattice {lattice.rows}x{lattice.cols} does not match '
            f'{n} sites'
        )
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)
    qv = (sps.csr_matrix(Q) @ v) if sps.issparse(Q) else (
        np.asarray(Q) @ v
    )
    sv = np.asarray(
        stencil.matvec(
            lattice,
            jnp.asarray(stencil.degree_grid(lattice), jnp.float32),
            jnp.asarray(v, jnp.float32),
        )
    )
    if not np.allclose(qv, sv, atol=1e-3 * max(1.0, np.abs(qv).max())):
        raise ValueError(
            'Q does not match the declared lattice structure'
        )
    return stencil.setup(lattice)


def setup_graph(Q, n, rank, block, basis_dtype=None):
    """Flatten a sparse/dense precision into graph panels; return
    ``(spec, arrays)``.

    One-time host-side analog of the reference's sparse MINRES setup
    (gibbs/logit.py:80-92); structural validation (symmetry, CAR sign
    pattern, diagonal dominance) happens inside ``graph_ops.build``.

    ``basis_dtype`` sets the STORAGE dtype of the deflation basis
    (``gr_defl_vecs``/``gr_defl_vecs_p``) — bfloat16 on TPU halves the
    bytes of the preconditioner's dominant HBM stream (see
    ops/graph.py:_deflated_jacobi). The basis only shapes the
    preconditioner, never the operator, so unlike the banded Q panels
    (which must stay f32 for the ICAR row-sum cancellation) rounding it
    is safe at any tau. Non-float dtypes survive the sampler's fixed-
    tree cast because ml_dtypes' bfloat16 has numpy kind 'V'.
    """
    spec, arrays = graph_ops.build(Q, deflate=rank, block=block)
    if spec.n != n:
        raise ValueError(
            f'Q is {spec.n}x{spec.n} but X has {n} sites'
        )
    if basis_dtype is not None:
        for key in ('gr_defl_vecs', 'gr_defl_vecs_p'):
            if key in arrays:
                arrays[key] = jnp.asarray(arrays[key], basis_dtype)
    return spec, arrays
