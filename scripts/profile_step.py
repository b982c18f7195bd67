"""Per-segment timing of the headline config's Gibbs step on the TPU.

Each variant runs in its own subprocess (the axon tunnel reliably fails
after >2 sampling runs in one process — same isolation bench.py uses):
one warmup ``sample`` + one timed ``sample`` per process.

Usage: python scripts/profile_step.py            # run all variants
       python scripts/profile_step.py <variant>  # worker mode
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, NS, CHAINS, SIZE = 1000, 500, 64, 3008

VARIANTS = [
    'default',
    'cg8', 'cg12',
    'sitecg',
    'devroye',
    'nopg',
    'nosolver',
]


def build(variant):
    import jax.numpy as jnp  # noqa: F401

    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    Q, W, X, y, *_ = make_data(
        n=N, ns=NS, p=3, q=3, min_v=2, max_v=10, random_state=7
    )
    kw = dict(random_state=1)
    if variant == 'default':
        return LogitICARGibbs(Q, W, X, y, **kw)
    if variant.startswith('cg'):
        return LogitICARGibbs(Q, W, X, y, cg_iters=int(variant[2:]), **kw)
    if variant == 'devroye':
        return LogitICARGibbs(Q, W, X, y, pg_method='devroye', **kw)
    if variant == 'sitecg':
        class SiteCG(LogitICARGibbs):
            """Site-basis 3-matmul CG (the pre-spectral solver)."""

            def _lambda_solve(self, rhs, warm, omega, tau, fixed):
                from occuspytial_tpu.ops.cg import icar_cg_solve

                sol = icar_cg_solve(
                    rhs, warm, omega, tau, fixed['Q'],
                    fixed['q_eigvecs'], fixed['q_eigvals'], self.cg_iters,
                )
                return sol, sol
        return SiteCG(Q, W, X, y, **kw)
    if variant == 'nopg':
        class NoPG(LogitICARGibbs):
            """PG -> conditional mean: everything-but-PG cost."""

            def _pg(self, key, z):
                return jnp.where(
                    jnp.abs(z) < 1e-4, 0.25, jnp.tanh(0.5 * z) / (2.0 * z)
                )
        return NoPG(Q, W, X, y, **kw)
    if variant == 'nosolver':
        class NoEta(LogitICARGibbs):
            """Blocked solve skipped: everything-but-solver cost."""

            def _update_beta_eta_blocked(self, key, s, ob, tau, fixed):
                return s['beta'], s['eta']
        return NoEta(Q, W, X, y, **kw)
    raise SystemExit(f'unknown variant {variant}')


def worker(variant):
    import jax

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(__file__), '..', '.jax_cache'),
    )
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    sampler = build(variant)
    # default: one dispatch per run (the tunneled runtime faults past a
    # few dozen cumulative dispatches per process; see models/base.py
    # scan_chunk docs). Set CHUNK to profile the chunked path.
    sampler.scan_chunk = int(os.environ.get('CHUNK', SIZE))
    # warm up BOTH programs a full run uses (chunk + remainder) so the
    # timed run is compile-free
    warm_n = min(SIZE, sampler.scan_chunk)
    if SIZE % sampler.scan_chunk:
        warm_n += SIZE % sampler.scan_chunk
    sampler.sample(warm_n, burnin=0, chains=CHAINS, progressbar=False)
    t0 = time.perf_counter()
    sampler.sample(SIZE, burnin=0, chains=CHAINS, progressbar=False)
    wall = time.perf_counter() - t0
    print(f'RESULT {variant:12s} {SIZE / wall:8.1f} it/s '
          f'({1e3 * wall / SIZE:.3f} ms/it)')


if __name__ == '__main__':
    if len(sys.argv) > 1:
        worker(sys.argv[1])
    else:
        for v in VARIANTS:
            p = subprocess.run(
                [sys.executable, __file__, v],
                capture_output=True, text=True, timeout=900,
            )
            for line in p.stdout.splitlines():
                if line.startswith('RESULT'):
                    print(line)
            if p.returncode != 0:
                print(f'{v}: FAILED\n{p.stderr[-500:]}')
