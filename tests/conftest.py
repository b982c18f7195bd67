"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chain/multi-chip behavior is validated without TPU hardware by
forcing the CPU backend with 8 virtual devices (SURVEY.md §4's TPU-rebuild
implication). Note the axon TPU plugin overrides the JAX_PLATFORMS env
var, so the backend must be forced through the config API before first
device use. A persistent compilation cache keeps repeat test runs fast.
"""

import os

_TPU_LANE = os.environ.get('OCCU_TPU_TESTS') == '1'

flags = os.environ.get('XLA_FLAGS', '')
if not _TPU_LANE and 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    # OCCU_TPU_TESTS=1 keeps the real TPU backend: the per-round
    # hardware lane (scripts/tpu_check.py) runs the Pallas kernel tests
    # that this CPU-forced default configuration must skip
    jax.config.update('jax_platforms', 'cpu')
# The persistent cache is DISABLED on the CPU lane: XLA's CPU AOT
# executable (de)serializer segfaults on this image — loading entries
# written by a different host crashes in get_executable_and_time
# ("machine type ... doesn't match" SIGILL warnings first), and even
# with a fresh per-host cache the full suite reproducibly segfaults in
# put_executable_and_time while serializing one of the later big scan
# executables. A cold suite costs ~20% extra wall time; a segfaulted
# suite costs everything. The TPU hardware lane keeps the repo cache —
# serialized TPU executables don't embed host-CPU features and both
# fault modes are CPU-serializer-specific.
if _TPU_LANE:
    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(__file__), '..', '.jax_cache'),
    )
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
