"""Multi-device chain parallelism over a JAX device mesh.

TPU-native replacement for the reference's joblib process pool
(reference gibbs/parallel.py:4-42). Chains are embarrassingly parallel, so
the natural mapping is *data parallelism over a ``chains`` mesh axis*: the
per-chain keys and state pytrees are sharded on their leading axis, and
the very same compiled ``scan(vmap(step))`` runner the single-device path
uses becomes an SPMD program — XLA partitions every per-chain operand and
no collectives appear in the hot loop (there is nothing to communicate,
exactly as the reference's processes never talk to each other; reference
gibbs/parallel.py:38-41). Cross-chain work (pooled ESS / R-hat) happens
once at the end, on gathered summaries.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(n_devices=None, devices=None):
    """1-D device mesh with a ``chains`` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('chains',))


def shard_chains(tree, mesh):
    """Shard every leaf of a chains-leading pytree over the mesh axis."""

    def put(leaf):
        spec = P('chains', *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


#: fixed-model arrays whose leading axis is the site axis (or the
#: lattice-row axis, which the 1-D site order subdivides contiguously)
_SITE_FIXED = ('X', 'obs', 'surveyed', 'lat_deg')
#: graph-solver fixed arrays whose leading axis is the site axis in
#: ORIGINAL ordering (ops/graph.py ELL panels + deflation basis)
_GRAPH_SITE_FIXED = ('gr_deg', 'gr_idx', 'gr_w', 'gr_defl_vecs')
#: graph-solver fixed arrays whose leading axis is the RCM-permuted,
#: padded site/block axis (the banded CG's operand space): the
#: block-tridiagonal panels shard over their block axis into contiguous
#: runs — exactly the layout parallel/sharded_graph.py hand-optimizes —
#: and the permuted companions over the padded site axis
_GRAPH_PERM_FIXED = ('gr_bd_diag', 'gr_bd_sub', 'gr_bd_sup', 'gr_deg_p',
                     'gr_defl_vecs_p')
#: state entries laid out (chains, n_sites)
_SITE_STATE = ('z', 'k', 'eta', 'spatial', 'eps', 'omega_b')


def shard_sampler_2d(sampler, carry, mesh):
    """Shard a sampler + carry over a 2-D ('chains', 'sites') mesh.

    The sites axis is this domain's tensor-parallel analog (SURVEY.md §5:
    the latent-field dimension is the scaling axis). Rather than hand-
    writing a distributed Gibbs step, the *same* compiled
    ``scan(vmap(step))`` program is partitioned by GSPMD: site-indexed
    model arrays (design matrix, lattice degree grid, site masks, graph
    neighbor panels, banded block panels) are laid out over ``'sites'``,
    per-chain state over ``'chains'`` with its site dimension over
    ``'sites'``, and XLA inserts the halo exchanges / psum reductions
    the matvecs and X'.. contractions need. Returns the sharded carry;
    ``sampler.fixed`` is re-laid in place.

    Supports the lattice/stencil samplers (contiguous row bands; the
    ``'sites'`` extent must divide the lattice rows) and the
    arbitrary-graph samplers (``solver='graph'``, logit or probit): the
    block-tridiagonal panels shard over their block axis — the same
    contiguous-block-run layout parallel/sharded_graph.py uses, so the
    banded CG's halo traffic rides neighbor links — while the one-off
    ELL/edge operators (noise scatter, quad_form gather) keep global
    operands that GSPMD serves with an all-gather of one (n,)-vector
    per chain, negligible next to the per-iteration CG panels. The
    reference serves irregular graphs only on a single core (sparse
    MINRES, reference gibbs/logit.py:80-92).
    """
    n = sampler.n
    rows = getattr(getattr(sampler, 'lattice', None), 'rows', None)
    n_site_shards = mesh.shape['sites']
    if n % n_site_shards or (rows is not None and rows % n_site_shards):
        raise ValueError(
            f"the 'sites' mesh extent {n_site_shards} must divide the "
            f'site count {n} (and the lattice rows {rows})'
        )
    gspec = getattr(sampler, 'graph', None)
    if gspec is not None and gspec.block:
        nb = gspec.n_pad // gspec.block
        if nb % n_site_shards:
            raise ValueError(
                f"the 'sites' mesh extent {n_site_shards} must divide "
                f'the banded layout block count {nb} (site count '
                f'{gspec.n_pad} / block {gspec.block}); rebuild with '
                f'graph_block set to a tile size that yields a '
                f'divisible block count'
            )

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    fixed = {}
    for name, leaf in sampler.fixed.items():
        if (
            name in _SITE_FIXED
            or name in _GRAPH_SITE_FIXED
            or name in _GRAPH_PERM_FIXED
        ) and np.ndim(leaf) >= 1:
            spec = P('sites', *([None] * (np.ndim(leaf) - 1)))
        else:
            spec = P()
        fixed[name] = put(leaf, spec)
    sampler.fixed = fixed

    keys, states = carry
    keys = put(keys, P('chains'))
    out_states = {}
    for name, leaf in states.items():
        if name in _SITE_STATE and leaf.ndim >= 2 and leaf.shape[-1] == n:
            spec = P('chains', *([None] * (leaf.ndim - 2)), 'sites')
        elif name == 'eta_warm':
            spec = P('chains', None, 'sites')
        else:
            spec = P('chains', *([None] * (leaf.ndim - 1)))
        out_states[name] = put(leaf, spec)
    return keys, out_states


def sample_parallel_2d(
    sampler, size, mesh, burnin=0, start=None, chains=None,
    progressbar=False,
):
    """Full-sampler SPMD run over a 2-D ('chains', 'sites') mesh.

    Chains are data-parallel; each chain's site-dimensioned state and the
    site-indexed model arrays are additionally sharded over ``'sites'``
    (see :func:`shard_sampler_2d`). Draws match the unsharded sampler up
    to partitioned-reduction rounding.
    """
    if chains is None:
        chains = mesh.shape['chains']
    if chains % mesh.shape['chains']:
        raise ValueError(
            f"chains ({chains}) must be a multiple of the 'chains' mesh "
            f"extent ({mesh.shape['chains']})"
        )
    carry = sampler.init_carry(chains, start)
    carry = shard_sampler_2d(sampler, carry, mesh)
    return sampler.sample(
        size, burnin=burnin, chains=chains, progressbar=progressbar,
        resume_from=carry,
    )


def sample_parallel(
    sampler, size, burnin=0, start=None, chains=None, mesh=None,
    progressbar=False,
):
    """Run ``sampler`` with chains sharded across the mesh devices.

    Mirrors the calling convention of reference gibbs/parallel.py:4-42 but
    executes as a single SPMD program instead of a process pool. ``chains``
    defaults to one per device; it must be a multiple of the mesh size.

    Returns a :class:`~occuspytial_tpu.posterior.PosteriorParameter`.
    """
    if mesh is None:
        mesh = chain_mesh()
    n_dev = mesh.devices.size
    if chains is None:
        chains = n_dev
    if chains % n_dev:
        raise ValueError(
            f'chains ({chains}) must be a multiple of the mesh size '
            f'({n_dev})'
        )
    if burnin >= size:
        raise ValueError('burnin value cannot be larger than sample size')

    # build the per-chain carry, shard it over the mesh, and let the
    # regular driver run it: the compiled scan becomes an SPMD program
    # through sharding propagation alone
    carry = sampler.init_carry(chains, start)
    carry = shard_chains(carry, mesh)
    return sampler.sample(
        size, burnin=burnin, chains=chains, progressbar=progressbar,
        resume_from=carry,
    )
