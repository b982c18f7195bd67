"""Chain-count scaling for the 10k-site configs (VERDICT r4 #1).

The round-4 roofline showed config 5 (stencil) at 0.0% MXU / 6.2% HBM
with 16 chains — the chip is mostly idle, and BASELINE.json does not
pin a chain count for the 10k configs. Chains are free throughput: the
operator panels/eigenbasis are chain-independent, so more chains feed
the same streamed bytes with more rows. This measures it/s and pooled
worst-parameter ESS/sec at several chain counts for BOTH 10k regimes
(stencil and graph), one subprocess per point (axon-tunnel isolation),
and writes benchmarks/site_chain_sweep.json.

Usage: python scripts/site_chain_sweep.py            # full sweep
       python scripts/site_chain_sweep.py CFG CHAINS # worker mode
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SWEEP = (16, 32, 64, 128)
SIZE, BURNIN = 1024, 128
OUT = os.path.join(HERE, 'benchmarks', 'site_chain_sweep.json')


def build(cfg):
    import scipy.sparse as sps

    from bench import make_lattice_dataset
    from occuspytial_tpu import LogitICARGibbs

    Q5, W5, X5, y5, *_ = make_lattice_dataset(
        100, 100, ns=5000, seed=11, min_v=2, max_v=5,
    )
    if cfg == 'stencil':
        return LogitICARGibbs(
            Q5, W5, X5, y5, random_state=11, lattice=(100, 100, 8),
            solver_check_tol=None,
        )
    return LogitICARGibbs(
        sps.csr_matrix(Q5), W5, X5, y5, random_state=11,
        solver='graph', solver_check_tol=None,
    )


def worker(cfg, chains):
    import jax

    jax.devices()
    from bench import _cache_dir, min_ess_per_param

    jax.config.update('jax_compilation_cache_dir', _cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    s = build(cfg)
    # the tunneled runtime kills any single program running longer
    # than ~8-10 s (measured 2026-08-20: graph x 96/128 chains died
    # with 'TPU worker process crashed' on a 1024-length scan, ran
    # fine as 2 x 512) — chunk the big-chain points so each dispatch
    # stays well under the cap
    s.scan_chunk = 256 if chains >= 96 else SIZE
    t0 = time.time()
    s.sample(SIZE, chains=chains, progressbar=False)
    warm = time.time() - t0
    t0 = time.time()
    post = s.sample(SIZE, burnin=BURNIN, chains=chains,
                    progressbar=False)
    wall = time.time() - t0
    ess = min_ess_per_param(post.data)
    row = {
        'config': cfg, 'chains': chains,
        'warm_s': round(warm, 1),
        'iters_per_sec': round(SIZE / wall, 2),
        'chain_iters_per_sec': round(SIZE * chains / wall, 1),
        'min_pooled_ess': round(ess, 1),
        'ess_per_sec': round(ess / wall, 2),
        'run_resid_max': round(float(s.last_solver_resid), 6),
    }
    print('ROW ' + json.dumps(row), flush=True)


def main():
    rows = []
    for cfg in ('stencil', 'graph'):
        for chains in SWEEP:
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), cfg,
                     str(chains)],
                    capture_output=True, text=True, timeout=900,
                    cwd=HERE,
                )
            except subprocess.TimeoutExpired:
                print(f'{cfg} x {chains}: timed out', flush=True)
                continue
            parsed = None
            for line in proc.stdout.splitlines():
                if line.startswith('ROW '):
                    parsed = json.loads(line[4:])
            if parsed is None:
                tail = (proc.stderr or '').strip().splitlines()[-2:]
                print(f'{cfg} x {chains}: FAILED {tail}', flush=True)
                continue
            print('ROW ' + json.dumps(parsed), flush=True)
            rows.append(parsed)
    with open(OUT, 'w') as fh:
        json.dump(rows, fh, indent=1)
    print(f'wrote {OUT}')


if __name__ == '__main__':
    if len(sys.argv) == 3:
        worker(sys.argv[1], int(sys.argv[2]))
    else:
        main()
