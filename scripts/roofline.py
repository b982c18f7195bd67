"""Roofline accounting for the benchmark configs (VERDICT r2 #4).

XLA's ``compiled.cost_analysis()`` is useless here: the CG inner loop
is a ``lax.while_loop`` whose body the cost model counts ONCE (trip
count unknown), so it reports ~26 MFLOP/step for a program that
actually does ~78 GFLOP/step. This script counts the dominant kernels
ANALYTICALLY from the sampler's own static configuration (CG matmul
ladder, banded panels, deflation rank — the quantities are exact, the
schedule is known), measures the whole-run scan on the chip, and
reports achieved FLOP/s and HBM traffic against the v5e ceilings.

v5e (1 chip) ceilings used:
  - MXU:  197 TFLOP/s bf16 (the CG matmuls run one-pass bf16 with f32
    accumulation — the default TPU matmul precision)
  - HBM:  819 GB/s

The Pólya-Gamma kernel's cost is *measured*, not counted (a rejection
sampler's FLOPs are data-dependent): profile_step.py's ``nopg``
differential attributes its share of the step.

Each config runs in its own subprocess (axon-tunnel isolation).

Usage: python scripts/roofline.py            # all configs -> table
       python scripts/roofline.py <config>   # worker mode (4|5|5g)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PEAK_MXU = 197e12
PEAK_HBM = 819e9

CONFIGS = ['4', '5', '5g']


def build(which):
    from bench import HEAD, make_lattice_dataset
    from occuspytial_tpu import LogitICARGibbs
    from occuspytial_tpu.utils import make_data

    if which == '4':
        Q, W, X, y, *_ = make_data(
            n=HEAD['n'], ns=HEAD['ns'], p=HEAD['p'], q=HEAD['q'],
            min_v=HEAD['min_v'], max_v=HEAD['max_v'],
            random_state=HEAD['seed'],
        )
        return LogitICARGibbs(Q, W, X, y, random_state=HEAD['seed']), 64
    Q, W, X, y, *_ = make_lattice_dataset(
        100, 100, ns=5000, seed=11, min_v=2, max_v=5,
    )
    # chain counts match the committed bench rows (round-5 sweep:
    # benchmarks/site_chain_sweep.json — stencil peaks at 32 chains,
    # the graph path at 64)
    if which == '5':
        s = LogitICARGibbs(
            Q, W, X, y, random_state=11, lattice=(100, 100, 8),
        )
        return s, 32
    import scipy.sparse as sps

    s = LogitICARGibbs(
        sps.csr_matrix(Q), W, X, y, random_state=11, solver='graph',
    )
    return s, 64


def solver_cost_per_step(s, chains):
    """Analytic (flops, hbm_bytes) per Gibbs step of the eta solver.

    Counts only the solver — the step's dominant, exactly-schedulable
    kernel. Sources for the schedule:
      - 'cg' (spectral, ops/cg.py:icar_cg_solve_spectral): per solve,
        1 in-transform + 1 initial-residual matvec (2 matmuls) +
        iters x 2 matmuls + 1 out-transform = 2*iters + 4 matmuls of
        (chains*(p+3), n) x (n, n); one solve per spatial sub-sweep.
        HBM: the eigenbasis (n^2 at storage dtype) is re-streamed per
        matmul; activations are negligible next to it.
      - 'stencil' (ops/stencil.py): matvec is a 9-point stencil:
        ~10 flops/site/rhs; iters+1 applications per solve; no matrix
        read (operator is the degree grid, n f32).
      - 'graph' banded (ops/graph.py): matvec reads 3 panels of
        (n_pad, block) each and does 2*3*block flops/site/rhs; the
        deflated-Jacobi preconditioner adds 4 matmuls against the
        (n_pad, rank) basis per iteration (2 in _deflated_jacobi's
        projections x 2 applications) -> 8*rank flops/site/rhs.
    """
    n = s.n
    rows = (s.n_beta + 3) * chains  # blocked rhs rows across chains
    sweeps = s.spatial_sweeps
    iters = s.cg_iters
    if s.solver == 'cg':
        matmuls = sweeps * (2 * iters + 4)
        flops = matmuls * 2.0 * rows * n * n
        bytes_u = n * n * s.fixed['q_eigvecs'].dtype.itemsize
        hbm = matmuls * bytes_u
        return flops, hbm
    if s.solver == 'stencil':
        applies = sweeps * (iters + 1)
        flops = applies * 10.0 * rows * n
        hbm = applies * (n * 4 + rows * n * 4 * 2)  # deg + rhs in/out
        return flops, hbm
    if s.solver == 'graph':
        spec = s.graph
        applies = s.spatial_sweeps * (iters + 1)
        band_flops = applies * 2.0 * 3 * spec.block * rows * spec.n_pad
        defl_flops = applies * 8.0 * spec.deflate * rows * spec.n_pad
        panel_bytes = 3 * spec.n_pad * spec.block * 4
        basis_item = s.fixed['gr_defl_vecs_p'].dtype.itemsize
        defl_bytes = spec.n_pad * spec.deflate * basis_item * 4
        hbm = applies * (panel_bytes + defl_bytes
                         + rows * spec.n_pad * 4 * 2)
        return band_flops + defl_flops, hbm
    raise SystemExit(f'no analytic model for solver {s.solver!r}')


def run_one(which, size=512):
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(HERE, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from occuspytial_tpu.models.base import _get_runner

    s, chains = build(which)
    run, _ = _get_runner(type(s), s._static_config())
    keys, state0 = s.init_carry(chains=chains)

    compiled = run.lower(keys, state0, s.fixed, size=size).compile()
    flops, hbm = solver_cost_per_step(s, chains)

    from occuspytial_tpu.models.base import _force_completion

    out = compiled(keys, state0, s.fixed)   # warmup dispatch
    _force_completion(out)                  # real sync (tunnel-safe)
    t0 = time.time()
    out = compiled(keys, state0, s.fixed)
    _force_completion(out)
    wall = time.time() - t0

    step = wall / size
    res = {
        'config': which,
        'solver': s.solver,
        'chains': chains,
        'cg_iters': s.cg_iters,
        'sweeps': s.spatial_sweeps,
        'size': size,
        'wall_sec': round(wall, 3),
        'iters_per_sec': round(size / wall, 1),
        'solver_gflops_per_step': round(flops / 1e9, 2),
        'solver_hbm_mb_per_step': round(hbm / 1e6, 1),
        'solver_tflops_if_whole_step': round(flops / step / 1e12, 2),
        'solver_pct_mxu_if_whole_step': round(
            100 * flops / step / PEAK_MXU, 1),
        'solver_gbps_if_whole_step': round(hbm / step / 1e9, 1),
        'solver_pct_hbm_if_whole_step': round(
            100 * hbm / step / PEAK_HBM, 1),
    }
    print('RESULT ' + json.dumps(res))
    return res


def main():
    rows = []
    for which in CONFIGS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), which],
                capture_output=True, text=True, timeout=900, cwd=HERE,
            )
        except subprocess.TimeoutExpired:
            print(f'config {which} timed out')
            continue
        parsed = None
        for line in proc.stdout.splitlines():
            if line.startswith('RESULT '):
                parsed = json.loads(line[len('RESULT '):])
        if parsed is None:
            print(f'config {which} FAILED:',
                  (proc.stderr or '').strip().splitlines()[-3:])
            continue
        rows.append(parsed)
    hdr = (f'{"cfg":>4} {"it/s":>8} {"solver GF/step":>15} '
           f'{"TFLOP/s*":>9} {"%MXU*":>6} {"GB/s*":>7} {"%HBM*":>6}')
    print('\n' + hdr)
    print('(* = solver kernels attributed to the WHOLE step time — an '
          'upper bound on their utilization)')
    for r in rows:
        print(f'{r["config"]:>4} {r["iters_per_sec"]:>8} '
              f'{r["solver_gflops_per_step"]:>15} '
              f'{r["solver_tflops_if_whole_step"]:>9} '
              f'{r["solver_pct_mxu_if_whole_step"]:>6} '
              f'{r["solver_gbps_if_whole_step"]:>7} '
              f'{r["solver_pct_hbm_if_whole_step"]:>6}')
    with open(os.path.join(HERE, 'benchmarks', 'roofline.json'),
              'w') as fh:
        json.dump(rows, fh, indent=1)


if __name__ == '__main__':
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
    else:
        main()
