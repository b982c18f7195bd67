"""Isolated in-scan timings of the headline step's two hot ops.

Times jit(scan(op)) for (a) the fused Pallas PG kernel on
headline-shaped inputs with realistic z magnitudes, (b) the spectral
CG solve, (c) everything-else proxies. Each measurement is its own
jitted scan so the numbers are per-op, not per-step ablations (the
step's PG cost is data-dependent, so subtracting ablated step times
mismeasures it).

Usage: python scripts/microbench.py [op]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CHAINS, N, TV, ITERS = 64, 1000, 2912, 3008


def main(which):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(__file__), '..', '.jax_cache'),
    )
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    rng = np.random.default_rng(0)
    m = N + TV

    if which == 'pg':
        from occuspytial_tpu.ops.pallas_pg import pg_devroye_pallas

        # converged-chain linear predictors: roughly N(0, 1.5^2)
        z0 = jnp.asarray(
            rng.normal(0, 1.5, (CHAINS, m)), jnp.float32
        )
        keys = jax.random.split(jax.random.key(0), CHAINS)

        def body(carry, _):
            k, z = carry
            ks = jax.vmap(jax.random.split)(k)
            draw = jax.vmap(pg_devroye_pallas)(ks[:, 1], z)
            # feed a little of the draw back so nothing is DCE'd
            return (ks[:, 0], z0 + 0.01 * draw), jnp.sum(draw)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = (keys, z0)

    elif which == 'cg':
        from occuspytial_tpu.ops.cg import icar_cg_solve_spectral
        from occuspytial_tpu.ops.icar import (
            icar_spectral,
            lattice_precision,
        )

        q = np.asarray(
            lattice_precision(25, 40, 8).todense(), np.float64
        )
        s_eig, u_eig, _ = icar_spectral(q)
        udt = (
            jnp.bfloat16 if os.environ.get('EIGDT') == 'bf16'
            else jnp.float32
        )
        u32 = jnp.asarray(u_eig, udt)
        s32 = jnp.asarray(s_eig, jnp.float32)
        omega = jnp.asarray(
            rng.uniform(0.02, 0.25, (CHAINS, N)), jnp.float32
        )
        rhs0 = jnp.asarray(
            rng.normal(size=(CHAINS, 6, N)), jnp.float32
        )

        def one(rhs, warm, om):
            return icar_cg_solve_spectral(
                rhs, warm, om, jnp.float32(8.0), u32, s32, 15
            )

        def body(carry, _):
            rhs, warm = carry
            sol, spec = jax.vmap(one)(rhs, warm, omega)
            return (rhs0 + 0.01 * sol, spec), jnp.sum(sol)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = (rhs0, jnp.zeros_like(rhs0))

    elif which == 'split':
        # key-splitting + small-op overhead proxy: 7 splits per chain
        keys = jax.random.split(jax.random.key(0), CHAINS)

        def body(carry, _):
            ks = jax.vmap(lambda k: jax.random.split(k, 8))(carry)
            return ks[:, 0], jnp.sum(
                jax.vmap(
                    lambda k: jax.random.normal(k[7], (N,))
                )(ks)
            )

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = keys

    elif which == 'gamma':
        # tau draw: one Gamma(shape) variate per chain per iteration
        keys = jax.random.split(jax.random.key(0), CHAINS)

        def body(carry, _):
            ks = jax.vmap(jax.random.split)(carry)
            g = jax.vmap(
                lambda k: jax.random.gamma(k, 500.5, dtype=jnp.float32)
            )(ks[:, 1])
            return ks[:, 0], jnp.sum(g)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = keys

    elif which == 'zupd':
        # masked z update: segment scatter-add + sigmoid + uniform draw
        visit_site = jnp.asarray(
            rng.integers(0, N, TV), jnp.int32
        )
        lin_a0 = jnp.asarray(
            rng.normal(0, 1.5, (CHAINS, TV)), jnp.float32
        )
        logit_psi = jnp.asarray(
            rng.normal(0, 1.5, (CHAINS, N)), jnp.float32
        )
        obs = jnp.asarray(rng.integers(0, 2, N), jnp.float32)
        keys = jax.random.split(jax.random.key(0), CHAINS)

        def one(k, lin_a, lp):
            log_prod = jnp.zeros(N, jnp.float32).at[visit_site].add(
                -jax.nn.softplus(lin_a)
            )
            p = jax.nn.sigmoid(lp + log_prod)
            draw = (jax.random.uniform(k, (N,)) < p).astype(jnp.float32)
            return jnp.where(obs > 0, 1.0, draw)

        def body(carry, _):
            ks = jax.vmap(jax.random.split)(carry)
            z = jax.vmap(one)(ks[:, 1], lin_a0, logit_psi)
            return ks[:, 0], jnp.sum(z)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = keys

    elif which == 'small':
        # alpha + beta draws: batched (3,3) precision_mvnorm pair plus
        # the flat-visit design contractions
        from occuspytial_tpu.ops.mvnorm import precision_mvnorm

        w = jnp.asarray(rng.normal(size=(TV, 3)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
        wt0 = jnp.asarray(
            rng.integers(0, 2, (CHAINS, TV)), jnp.float32
        )
        om0 = jnp.asarray(
            rng.uniform(0.05, 0.25, (CHAINS, TV)), jnp.float32
        )
        omb0 = jnp.asarray(
            rng.uniform(0.05, 0.25, (CHAINS, N)), jnp.float32
        )
        yk = jnp.asarray(rng.normal(size=(CHAINS, TV)), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(CHAINS, N)), jnp.float32)
        eye3 = jnp.eye(3, dtype=jnp.float32) * 0.1
        keys = jax.random.split(jax.random.key(0), CHAINS)

        def one(k, wt, om, omb, yy, kk):
            k1, k2 = jax.random.split(k)
            a = w.T @ ((wt * om)[:, None] * w) + eye3
            b = w.T @ (wt * yy)
            alpha = precision_mvnorm(k1, b, a)
            a2 = (x.T * omb) @ x + eye3
            b2 = x.T @ kk
            beta = precision_mvnorm(k2, b2, a2)
            return alpha + beta

        def body(carry, _):
            ks = jax.vmap(jax.random.split)(carry)
            ab = jax.vmap(one)(ks[:, 1], wt0, om0, omb0, yk, kv)
            return ks[:, 0], jnp.sum(ab)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = keys

    elif which == 'pgpack':
        # packed-grid structure: all chains' lanes through ONE flat call
        # (8 blocks of (256,128)) instead of 64 per-chain (32,128) blocks
        from occuspytial_tpu.ops.pallas_pg import _key_words, _pg_flat

        z0 = jnp.asarray(
            rng.normal(0, 1.5, (CHAINS * m,)), jnp.float32
        )

        def body(carry, _):
            k, z = carry
            k1, k2 = jax.random.split(k)
            draw = _pg_flat(_key_words(k2), z)
            return (k1, z0 + 0.01 * draw), jnp.sum(draw)

        fn = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=ITERS)
        )
        carry = (jax.random.key(0), z0)
    else:
        raise SystemExit(f'unknown op {which}')

    out = fn(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(carry)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(
        f'RESULT {which:6s} {ITERS / wall:8.1f} it/s '
        f'({1e3 * wall / ITERS:.3f} ms/it)'
    )


if __name__ == '__main__':
    if len(sys.argv) == 3 and sys.argv[1] == 'worker':
        main(sys.argv[2])
    else:
        import subprocess

        ops = sys.argv[1:] or (
            'pg', 'cg', 'split', 'gamma', 'zupd', 'small'
        )
        for op in ops:
            p = subprocess.run(
                [sys.executable, __file__, 'worker', op],
                capture_output=True, text=True, timeout=1200,
            )
            print(p.stdout.strip() or f'{op}: FAILED\n{p.stderr[-400:]}')
