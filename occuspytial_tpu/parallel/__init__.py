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

from contextlib import nullcontext

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..posterior import PosteriorParameter


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
    from ..models.base import _get_runner

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

    run, init = _get_runner(type(sampler), sampler._static_config())

    root = jax.random.key(sampler._seed, impl=sampler.rng_impl)
    init_keys = jax.random.split(jax.random.fold_in(root, 1), chains)
    run_keys = jax.random.split(jax.random.fold_in(root, 2), chains)

    state0 = init(init_keys, sampler.fixed)
    if start is not None:
        state0 = jax.vmap(lambda s: sampler._apply_start(s, start))(state0)

    # shard per-chain operands; fixed data replicates automatically
    run_keys = shard_chains(run_keys, mesh)
    state0 = shard_chains(state0, mesh)

    chunk = max(1, int(sampler.scan_chunk))
    n_chunks = -(-size // chunk)
    bar = nullcontext()
    if progressbar:
        from tqdm.auto import tqdm

        bar = tqdm(total=size)
    carry, outs = (run_keys, state0), []
    with bar as b:
        for i in range(n_chunks):
            carry, out = run(carry[0], carry[1], sampler.fixed, size=chunk)
            outs.append(out)
            if progressbar:
                jax.block_until_ready(out)
                b.update(min(chunk, size - i * chunk))

    merged = {}
    for name in sampler.posterior_names:
        arr = np.concatenate([np.asarray(o[name]) for o in outs])[:size]
        merged[name] = np.moveaxis(arr, 0, 1)[:, burnin:]
    return PosteriorParameter(merged)
