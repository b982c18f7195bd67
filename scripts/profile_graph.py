"""Per-segment timing of the 10k-site graph-solver Gibbs step on TPU.

Decomposes config 5g (100x100 lattice fed as a bare sparse Q, 16
chains) the way profile_step.py decomposes the headline: each variant
isolates one cost — the banded vs ELL CG operator, the CG budget, the
per-step edge-incidence noise scatter, the tau quad form — by running
the full sampler with that piece swapped or stubbed. Each variant runs
in its own subprocess (same tunnel-fault isolation as bench.py): one
warmup ``sample`` compiles, one timed ``sample`` measures.

Usage: python scripts/profile_graph.py            # run all variants
       python scripts/profile_graph.py <variant>  # worker mode
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, COLS, NS, CHAINS, SIZE = 100, 100, 5000, 16, 512

VARIANTS = [
    'banded',          # default graph path (block-tridiagonal CG)
    'ell',             # gather-only ELL CG (graph_block=0)
    'banded-cg12',     # CG budget sweep on the banded operator
    'banded-cg16',
    'banded-cg24',
    'banded-cg48',
    'defl16',          # deflation-rank sweep (default 64)
    'defl32',
    'nonoise',         # noise scatter replaced by iid normals (BIASED —
                       # timing only: isolates the edge-scatter cost)
    'noquad',          # tau quad form replaced by a constant (BIASED)
    'stencil',         # same problem through the lattice stencil path
]


def build(variant):
    import jax.numpy as jnp
    import scipy.sparse as sps

    from bench import make_lattice_dataset
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.ops import graph as graph_ops

    Q, W, X, y, *_ = make_lattice_dataset(
        ROWS, COLS, ns=NS, seed=11, min_v=2, max_v=5
    )
    Qs = sps.csr_matrix(Q)
    kw = dict(random_state=11, solver='graph')
    if variant == 'banded':
        return LogitICARGibbs(Qs, W, X, y, **kw)
    if variant == 'ell':
        return LogitICARGibbs(Qs, W, X, y, graph_block=0, **kw)
    if variant.startswith('defl'):
        return LogitICARGibbs(
            Qs, W, X, y, graph_rank=int(variant[len('defl'):]), **kw
        )
    if variant.startswith('banded-cg'):
        return LogitICARGibbs(
            Qs, W, X, y, cg_iters=int(variant[len('banded-cg'):]),
            solver_check_tol=None, **kw
        )
    if variant == 'stencil':
        return LogitICARGibbs(Q, W, X, y, random_state=11,
                              lattice=(ROWS, COLS, 8))
    if variant == 'nonoise':
        class NoNoise(LogitICARGibbs):
            """Edge-scatter noise replaced by iid draws (timing only)."""

        import jax

        def fake_noise(spec, fixed, key, dtype=jnp.float32):
            return jax.random.normal(key, (spec.n,), dtype)

        graph_ops.noise = fake_noise
        return NoNoise(Qs, W, X, y, **kw)
    if variant == 'noquad':
        class NoQuad(LogitICARGibbs):
            """tau quad form stubbed to a constant (timing only)."""

            def _update_tau(self, key, eta, fixed):
                import jax

                g = jax.random.gamma(
                    key, fixed['tau_shape'], dtype=self.dtype
                )
                return g / (0.5 * 100.0 + fixed['tau_rate'])

        return NoQuad(Qs, W, X, y, **kw)
    raise SystemExit(f'unknown variant {variant}')


def worker(variant):
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    s = build(variant)
    s.scan_chunk = SIZE
    s.sample(SIZE, chains=CHAINS, progressbar=False)  # compile + warm
    t0 = time.time()
    s.sample(SIZE, chains=CHAINS, progressbar=False,
             resume_from=s.final_carry)
    dt = time.time() - t0
    print('RESULT ' + json.dumps({
        'variant': variant, 'iters_per_sec': round(SIZE / dt, 1),
        'wall_s': round(dt, 2),
    }), flush=True)


def main():
    out = {}
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=1800,
        )
        parsed = None
        for line in proc.stdout.splitlines():
            if line.startswith('RESULT '):
                parsed = json.loads(line[len('RESULT '):])
        out[v] = parsed or {'error': proc.stderr.strip().splitlines()[-1:]}
        print(v, out[v], flush=True)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    if len(sys.argv) > 1:
        worker(sys.argv[1])
    else:
        main()
