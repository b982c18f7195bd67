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
