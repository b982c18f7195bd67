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
# CPU executables are host-CPU-feature-specific: a cache written by a
# previous round's host with different features makes XLA's AOT loader
# warn ("machine type ... doesn't match") and can segfault outright in
# compilation_cache.get_executable_and_time (observed SIGSEGV mid-suite).
# A /tmp cache is per-host by construction; the repo-level .jax_cache
# stays reserved for TPU executables, which don't embed host features.
jax.config.update(
    'jax_compilation_cache_dir',
    '/tmp/occu_jax_cache' if not _TPU_LANE else os.path.join(
        os.path.dirname(__file__), '..', '.jax_cache'
    ),
)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
