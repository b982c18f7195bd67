"""Sampler framework: pure-functional Gibbs kernels driven by lax.scan.

TPU-first re-design of the reference's mutable-object sampler skeleton
(reference gibbs/base.py:30-306). Instead of a ``State`` namespace mutated
by ``step()`` inside a Python loop (reference gibbs/base.py:214-241), each
sampler defines a pure transition ``state' = _step(key, state, fixed)``
over pytrees. The driver:

- ``vmap``s the transition over a leading chains axis — the TPU-native
  analog of the reference's joblib process pool (reference
  gibbs/parallel.py:4-42),
- scans the vmapped transition once over all iterations with ``lax.scan``
  (burn-in is sliced off on host: posterior rows are tiny, so storing them
  during burn-in costs nothing and halves the compiled-variant count),
- ``jit``s the whole run once per *model configuration* — compiled
  executables are cached at class level keyed by the static config, so
  re-constructing a sampler (reference's ``copy()`` idiom) never
  recompiles.

Randomness: one ``jax.random`` key per chain, split once per iteration and
then per update — the counter-based analog of the reference's spawned
``SeedSequence`` streams (reference gibbs/base.py:303-305).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..data import as_occupancy_data
from ..ops import icar
from ..posterior import PosteriorParameter

# class-level cache of compiled run/init functions, keyed by
# (class, static-config tuple): instances with identical model shape share
# one executable (and the persistent XLA cache can reuse it across runs).
_RUNNER_CACHE = {}


def _force_completion(out):
    """Wait until a dispatched program's outputs are actually computed.

    ``jax.block_until_ready`` returns immediately on the tunneled TPU
    runtime without waiting (its ready-event plumbing is a no-op
    there), so anything relying on it for queue bounding or timing is
    silently broken. A device-to-host readback of a single element is
    the one sync primitive that works everywhere.
    """
    leaf = min(jax.tree.leaves(out), key=lambda a: a.size)
    jax.device_get(leaf)


def _config_proxy(cls, config):
    """Instance of ``cls`` carrying only the static config attributes.

    ``_step`` and ``_init_state`` consult ``self`` exclusively for static,
    hashable configuration (dims, dtype, method flags); building a
    skeleton instance lets equal-config sampler objects share one jitted
    runner while keeping the subclass method-resolution order.
    """
    proxy = cls.__new__(cls)
    for k, v in config:
        setattr(proxy, k, v)
    return proxy


def _get_runner(cls, config):
    key = (cls, config)
    if key not in _RUNNER_CACHE:
        proxy = _config_proxy(cls, config)
        run = jax.jit(proxy._run_chains, static_argnames=('size',))
        init = jax.jit(jax.vmap(proxy._init_state, in_axes=(0, None)))
        _RUNNER_CACHE[key] = (run, init)
    return _RUNNER_CACHE[key]


class GibbsBase:
    """Shared machinery for the occupancy-model Gibbs samplers.

    Parameters mirror reference gibbs/base.py:30-88: ``Q`` the spatial
    precision (scipy sparse or dense), ``W``/``y`` dict-of-ragged survey
    data (or a prebuilt :class:`~occuspytial_tpu.data.OccupancyData`),
    ``X`` the (n, p) occupancy design matrix, ``hparams`` the six
    documented hyperparameters, ``random_state`` an integer seed.

    TPU-specific extras: ``dtype`` selects the on-device precision
    (float32 default; float64 only sensible on CPU backends).
    """

    #: names of parameters retained in the posterior chain
    posterior_names = ('alpha', 'beta', 'tau')

    #: extra state entries to record per draw, e.g. ``('z',)`` for
    #: posterior occupancy maps or ``('eta',)`` for the spatial field —
    #: set on the instance before :meth:`sample`. Rebuild addition (the
    #: reference stores only alpha/beta/tau, gibbs/base.py:23-27); the
    #: recorded arrays are (chains, draws, n)-sized, so mind host memory
    #: at large n. Changing it compiles a new runner (config-keyed).
    track = ()

    #: iterations per compiled scan dispatch; any ``sample(size=...)`` is
    #: served by repeats of this one executable (see ``sample``). The
    #: default ``None`` picks per backend: on accelerators the whole run
    #: is ONE dispatch (scan compile time is length-independent, and a
    #: tunneled TPU runtime faults after a few dozen dispatches per
    #: process — measured: chunk 128 -> 557 it/s with failures past ~27
    #: cumulative dispatches, chunk 3008 -> 1559 it/s, headline config);
    #: on CPU a 64-iteration chunk is kept so different sample sizes
    #: reuse one compiled executable (the test suite is
    #: compile-dominated). Progress bars and ``track``-ed latent fields
    #: re-chunk as needed (see ``_resolve_chunk``).
    scan_chunk = None

    #: jax PRNG implementation for the sampler's random stream; set the
    #: instance attribute to override. 'rbg' is substantially faster on
    #: TPU; 'threefry2x32' (jax default) gives cross-backend determinism.
    rng_impl = 'threefry2x32'

    def __init__(
        self, Q, W, X, y, hparams=None, random_state=None,
        dtype=jnp.float32,
    ):
        self.dtype = jnp.dtype(dtype)
        x_np = np.asarray(X, dtype=np.float64)
        self.n = x_np.shape[0]
        self.n_beta = x_np.shape[1]
        self.data = as_occupancy_data(W, y, self.n, dtype=self.dtype)
        self.n_alpha = self.data.n_alpha
        self.max_visits = self.data.max_visits
        self.total_visits = self.data.total_visits
        self._seed = 0 if random_state is None else int(random_state)

        self.fixed = {}
        self._configure(Q, x_np, hparams)
        # move every fixed array to device dtype once
        self.fixed = {
            k: (
                jnp.asarray(v, dtype=self.dtype)
                if np.asarray(v).dtype.kind == 'f'
                else jnp.asarray(v)
            )
            for k, v in self.fixed.items()
        }
        # ... and force the host->device transfers NOW. On a tunneled
        # TPU runtime (axon), jnp.asarray defers buffer materialization
        # to the first program that consumes the array, which serializes
        # a slow per-buffer upload into that program's execution —
        # measured 42-424 s (variable) for 22 MB of graph panels folded
        # into the first solver call, vs 8 s when pre-touched here. The
        # touch is ONE jitted program over the whole tree (result
        # discarded, inputs stay resident) rather than an eager add per
        # leaf: the axon runtime poisons a process after a few dozen
        # cumulative program executions (measured 2026-08-20: worker
        # dies after ~3 sampler configs, ~20 eager touches each), so
        # every dispatch saved here directly extends process life.
        touch = jax.jit(lambda t: jax.tree.map(lambda v: v + 0, t))
        # block_until_ready is a silent no-op on the tunneled runtime
        # (see _force_completion) — a one-element readback is the only
        # barrier that actually guarantees the uploads completed here
        # rather than merely being ordered before the next program.
        _force_completion(touch(self.fixed))

    # ------------------------------------------------------------------ #
    # configuration (host side, runs once)
    # ------------------------------------------------------------------ #

    #: subclasses set False when they never need the dense precision
    #: (e.g. the matrix-free lattice path)
    _needs_dense_q = True

    def _verify_spatial_precision(self, Q):
        """Singularity check (reference gibbs/base.py:166-170). The
        matrix-free lattice path replaces the shift-invert eigsh (slow at
        10k+ sites) with the exact equivalent for an ICAR precision:
        zero row sums."""
        if getattr(self, 'solver', None) == 'graph':
            # nonzero row sums = proper-CAR surplus, allowed (the
            # stencil path's rho<1 analog); the CAR sign/shape
            # structure itself is validated inside ops/graph.build
            return
        if getattr(self, 'solver', None) == 'stencil':
            import scipy.sparse as sps

            rowsum = (
                np.abs(np.asarray(Q.sum(axis=1))).max()
                if sps.issparse(Q) else np.abs(np.asarray(Q).sum(1)).max()
            )
            if getattr(self.lattice, 'rho', 1.0) == 1.0 and rowsum > 1e-8:
                raise ValueError(
                    'Spatial precision matrix Q must be singular.'
                )
            return
        icar.verify_spatial_precision(Q)

    def _configure(self, Q, x_np, hparams):
        """Build the ``fixed`` pytree (reference gibbs/base.py:107-164)."""
        self._verify_spatial_precision(Q)

        f = self.fixed
        f['X'] = x_np
        if self._needs_dense_q:
            f['Q'] = icar.to_dense(Q)
        # flat-visits layout: every real (site, visit) cell exactly once
        # (no padded lanes in the per-iteration PG/truncnorm draws)
        f['W_flat'] = self.data.W_flat
        f['y_flat'] = self.data.y_flat
        f['visit_site'] = np.asarray(self.data.visit_site)
        f['surveyed'] = np.asarray(self.data.surveyed)
        f['obs'] = np.asarray(self.data.obs, dtype=np.float64)

        self._set_hyperparams(hparams)

    def _set_hyperparams(self, hparams):
        """Hyperparameter defaults (reference gibbs/base.py:177-186)."""
        hp = dict(hparams) if hparams else {}
        self.hparams_given = bool(hparams)
        f = self.fixed
        f['tau_rate'] = float(hp.get('tau_rate', 0.005))
        f['tau_shape'] = float(
            hp.get('tau_shape', 0.5 + 0.5 * (self.n - 1))
        )
        f['a_mu'] = np.asarray(
            hp.get('a_mu', np.zeros(self.n_alpha)), dtype=np.float64
        )
        f['a_prec'] = np.asarray(
            hp.get('a_prec', np.eye(self.n_alpha) / 10), dtype=np.float64
        )
        f['b_mu'] = np.asarray(
            hp.get('b_mu', np.zeros(self.n_beta)), dtype=np.float64
        )
        f['b_prec'] = np.asarray(
            hp.get('b_prec', np.eye(self.n_beta) / 10), dtype=np.float64
        )
        f['a_prec_by_mu'] = f['a_prec'] @ f['a_mu']
        f['b_prec_by_mu'] = f['b_prec'] @ f['b_mu']

    def _static_config(self):
        """Hashable static attributes consulted by _step/_init_state.

        Subclasses extend. Used to key the shared compiled-runner cache.
        """
        return (
            ('dtype', self.dtype),
            ('n', self.n),
            ('n_alpha', self.n_alpha),
            ('n_beta', self.n_beta),
            ('max_visits', self.max_visits),
            ('total_visits', self.total_visits),
            # the runner's scan body records posterior_names (the proxy
            # receives this extended tuple), so tracked extras ride the
            # same compiled program
            ('posterior_names',
             tuple(self.posterior_names) + tuple(self.track)),
            ('rng_impl', self.rng_impl),
        )

    # ------------------------------------------------------------------ #
    # state initialization (pure; vmapped over chains)
    # ------------------------------------------------------------------ #

    def _initial_z(self, fixed):
        """Initial occupancy: observed -> 1, unsurveyed -> 1, surveyed
        unobserved -> 0 (reference gibbs/base.py:113-119)."""
        surveyed = fixed['surveyed']
        return jnp.where(
            surveyed, fixed['obs'].astype(self.dtype),
            jnp.ones(self.n, self.dtype),
        )

    def _init_common(self, key, fixed):
        """Default random start (reference gibbs/base.py:199-212, with
        the regression starts moderated — see below).

        The reference draws alpha/beta ~ MVN(mu, 100 * prec) *treating
        the precision as a covariance* (gibbs/base.py:206-211) — at the
        default prec = I/10 that is sd ~ 3.2 per component, so ~1 chain
        in 7 starts with some |beta_j| > 6 and a fully SATURATED linear
        predictor. Saturation is metastable for every PG-Gibbs kernel
        (ours and the reference's): omega ~ PG(1, |huge|) ~ 0, so the
        eta draw's conditional k/omega explodes, eta'Q eta blows up,
        tau crashes, and the chain can sit in this negligible-mass
        region for thousands of iterations (measured 2026-08-20:
        chain 17 of the cg10/seed-9 headline run started at
        beta[1] = -8.62, spent the whole run at tau ~ 1e-3 .. 700 with
        per-chain ESS 6, and single-handedly collapsed the pooled
        64-chain min-ESS from ~14k to 793). The default start here
        therefore draws alpha/beta ~ N(mu, I) — still overdispersed
        relative to a typical posterior (sd ~ 0.1) so split-R-hat keeps
        its power, but nowhere near saturation. tau keeps the
        reference's prior-ish draw: the first sufficient-conditional
        tau | eta draw (shape ~ n/2) resets it to the field-implied
        scale in one step, so its start value is immaterial (measured:
        a tau0 = 0.15 chain recovered instantly; the saturated-beta
        chain never did). Pass ``start=`` to ``sample`` to reproduce
        any other policy, including the reference's.
        """
        k_tau, k_eta, k_alpha, k_beta = jax.random.split(key, 4)
        state = {}
        state['z'] = self._initial_z(fixed)
        state['k'] = state['z'] - 0.5
        state['tau'] = jax.random.gamma(k_tau, 0.5, dtype=self.dtype) / (
            fixed['tau_rate']
        )
        eta = jax.random.normal(k_eta, (self.n,), self.dtype)
        state['eta'] = eta - eta.mean()
        state['spatial'] = state['eta']
        state['alpha'] = fixed['a_mu'] + jax.random.normal(
            k_alpha, (self.n_alpha,), self.dtype
        )
        state['beta'] = fixed['b_mu'] + jax.random.normal(
            k_beta, (self.n_beta,), self.dtype
        )
        return state

    def _init_state(self, key, fixed):
        """Subclasses may extend (e.g. RSR eta dimension, probit eps)."""
        return self._init_common(key, fixed)

    def _apply_start(self, state, start):
        """Override state entries from a user ``start`` dict
        (reference gibbs/base.py:188-197)."""
        out = dict(state)
        for name in ('alpha', 'beta', 'tau', 'eta'):
            if name in start:
                out[name] = jnp.asarray(start[name], dtype=self.dtype)
        out['spatial'] = self._spatial_from_eta(out['eta'])
        return out

    def _spatial_from_eta(self, eta):
        return eta

    # ------------------------------------------------------------------ #
    # transition kernel
    # ------------------------------------------------------------------ #

    def _step(self, key, state, fixed):
        raise NotImplementedError(
            f'{self.__class__.__name__} must implement a `_step` method.'
        )

    def _track_resid(self, state, rel):
        """Fold one eta-solve's relative residual into the running max.

        The max rides the scan carry (``state['solver_resid']``, created
        by samplers with an iterative eta solver) and is checked against
        ``solver_check_tol`` when :meth:`sample` returns — the in-run
        complement of the cold-start guardrail, restoring the
        reference's per-draw MINRES convergence guarantee (reference
        gibbs/logit.py:91-92): a tau excursion mid-run into a regime the
        fixed CG budget cannot handle is detected, not silently biased.
        """
        if 'solver_resid' in state:
            state['solver_resid'] = jnp.maximum(
                state['solver_resid'], rel.astype(self.dtype)
            )

    def _check_run_solver_health(self, carry):
        """Raise if any chain's in-run solver residual max exceeded
        ``solver_check_tol`` (see :meth:`_track_resid`). Called at the
        end of :meth:`sample`; the measured max is kept on
        ``self.last_solver_resid`` either way."""
        states = carry[1]
        if 'solver_resid' not in states:
            return
        resid = float(jnp.max(states['solver_resid']))
        self.last_solver_resid = resid
        tol = getattr(self, 'solver_check_tol', None)
        if tol is not None and resid > tol:
            raise RuntimeError(
                f'eta solver ({getattr(self, "solver", "?")!r}, '
                f'cg_iters={getattr(self, "cg_iters", "?")}) failed to '
                f'converge during the run: worst per-draw relative '
                f'residual {resid:.2e} exceeds solver_check_tol='
                f'{tol:.0e}. The sampled draws may be biased — increase '
                f'cg_iters (or pass solver_check_tol=None to bypass). '
                f'The run is resumable from `self.final_carry`.'
            )

    # ------------------------------------------------------------------ #
    # run driver
    # ------------------------------------------------------------------ #

    def _run_chains(self, keys, state0, fixed, *, size):
        """scan(vmap(step)) over iterations.

        Returns ``((next_keys, final_states), samples)`` where ``samples``
        maps name -> (size, chains, ...). Because the per-chain key stream
        is carried in the scan state, resuming from the returned carry and
        concatenating outputs is bitwise-identical to one longer scan —
        which is how the progress-bar path ticks without host callbacks
        (unsupported by the axon TPU plugin) or extra compiled variants.
        """

        def body(carry, _):
            ks, states = carry
            pairs = jax.vmap(lambda k: jax.random.split(k))(ks)
            ks_next, subs = pairs[:, 0], pairs[:, 1]
            states = jax.vmap(
                lambda k, s: self._step(k, s, fixed)
            )(subs, states)
            out = {name: states[name] for name in self.posterior_names}
            return (ks_next, states), out

        return lax.scan(body, (keys, state0), None, length=size)

    def init_carry(self, chains=2, start=None):
        """Build the resumable sampling carry: per-chain (keys, states).

        The carry fully determines the rest of a run — passing it to
        :meth:`sample` (``resume_from=``) continues the exact chain the
        previous run would have produced, which is the rebuild's
        checkpoint/resume mechanism (SURVEY.md §5: the reference only
        supports restart-from-``start``, gibbs/base.py:188-197).
        """
        _, init = _get_runner(type(self), self._static_config())
        root = jax.random.key(self._seed, impl=self.rng_impl)
        init_keys = jax.random.split(jax.random.fold_in(root, 1), chains)
        run_keys = jax.random.split(jax.random.fold_in(root, 2), chains)
        state0 = init(init_keys, self.fixed)
        unknown = [t for t in self.track if t not in state0]
        if unknown:
            raise ValueError(
                f'track names {unknown} are not state entries; this '
                f'model carries {sorted(state0)}'
            )
        if start is not None:
            state0 = jax.vmap(lambda s: self._apply_start(s, start))(state0)
        return (run_keys, state0)

    def save_carry(self, path, carry):
        """Serialize a sampling carry to ``path`` (.npz)."""
        keys, states = carry
        payload = {'__keys__': np.asarray(jax.random.key_data(keys))}
        for name, val in states.items():
            payload[name] = np.asarray(val)
        np.savez(path, **payload)

    def load_carry(self, path):
        """Load a carry saved by :meth:`save_carry`."""
        data = np.load(path)
        keys = jax.random.wrap_key_data(
            jnp.asarray(data['__keys__']), impl=self.rng_impl
        )
        states = {
            name: jnp.asarray(data[name])
            for name in data.files if name != '__keys__'
        }
        return (keys, states)

    #: device-resident bytes of per-draw scan output the auto chunk
    #: policy allows before splitting a run into multiple dispatches
    #: (only reachable with ``track``-ed latent fields; the posterior
    #: scalars are negligible at any sane size)
    _auto_chunk_output_budget = 256 << 20

    def _resolve_chunk(self, size, with_bar, state0):
        """Iterations per scan dispatch for this run (see ``scan_chunk``).

        Auto policy (``scan_chunk is None``): on CPU, 64 — executables
        are then shared across sample sizes, which the compile-dominated
        test suite relies on. On accelerators, the whole run is one
        dispatch (fastest, and fewest round-trips through a tunneled
        runtime), split only to tick a progress bar (~16 updates) or to
        bound the device-resident output of ``track``-ed latent fields.
        """
        if self.scan_chunk is not None:
            return max(1, int(self.scan_chunk))
        if jax.default_backend() == 'cpu':
            return 64
        chunk = max(64, -(-size // 16)) if with_bar else size
        if self.track:
            per_draw = sum(
                state0[t].size * state0[t].dtype.itemsize
                for t in self.track
            )
            cap = max(1, self._auto_chunk_output_budget // max(per_draw, 1))
            chunk = min(chunk, cap)
        return max(1, min(size, chunk))

    def sample(
        self, size, burnin=0, start=None, chains=2, progressbar=True,
        resume_from=None,
    ):
        """Draw posterior samples (API of reference gibbs/base.py:243-291).

        ``progressbar`` accepts True (one aggregate bar), False, or
        ``'per-chain'`` (one positioned tqdm row per chain, the
        reference's multi-chain display; rows tick in lockstep because
        the chains share one compiled scan).

        Returns a :class:`~occuspytial_tpu.posterior.PosteriorParameter`
        over parameters ('alpha', 'beta', 'tau') with per-chain arrays of
        shape (chains, size - burnin[, dim]). After the call,
        ``self.final_carry`` holds the resumable (keys, states) carry;
        pass it back via ``resume_from`` (or through
        :meth:`save_carry`/:meth:`load_carry`) to continue the run
        exactly where it stopped.
        """
        if burnin >= size:
            raise ValueError('burnin value cannot be larger than sample size')
        if chains < 1:
            raise ValueError('chains must a positive integer.')
        # trigger NotImplementedError eagerly for abstract samplers
        if type(self)._step is GibbsBase._step:
            self._step(None, None, None)

        run, init = _get_runner(type(self), self._static_config())

        if resume_from is not None:
            run_keys, state0 = resume_from
        else:
            run_keys, state0 = self.init_carry(chains, start)

        # progressbar=True: one aggregate bar. progressbar='per-chain':
        # one positioned row per chain (the reference gives each joblib
        # worker its own tqdm position, gibbs/parallel.py:38-41 /
        # gibbs/base.py:222-224); here every chain lives in the same
        # compiled SPMD scan, so the rows advance in lockstep — which is
        # also the truth.
        bars = []
        if progressbar:
            try:
                from tqdm.auto import tqdm
            except ImportError:  # tqdm is an optional extra
                import warnings

                warnings.warn(
                    'tqdm is not installed; sampling without a progress '
                    "bar (pip install 'occuspytial-tpu[analysis]')",
                    stacklevel=2,
                )
            else:
                n_chains = jnp.shape(run_keys)[0]
                if progressbar == 'per-chain' and n_chains > 1:
                    bars = [
                        tqdm(total=size, position=i, desc=f'chain {i}')
                        for i in range(n_chains)
                    ]
                else:
                    bars = [tqdm(total=size)]

        # All sampling runs as repeats of one fixed-length compiled scan
        # (resumed from the carried per-chain keys, so the result is
        # bitwise-identical to a single fused scan). The executable
        # depends only on (model config, chains, chunk length) — chunking
        # never changes the draws; a trailing remainder chunk (compiled
        # once per distinct remainder) keeps ``final_carry`` exactly at
        # iteration ``size`` for resumption.
        chunk = self._resolve_chunk(size, bool(bars), state0)
        lengths = [chunk] * (size // chunk)
        if size % chunk:
            lengths.append(size % chunk)
        carry, outs = (run_keys, state0), []
        try:
            for i, ln in enumerate(lengths):
                carry, out = run(carry[0], carry[1], self.fixed, size=ln)
                if self.track:
                    # move each chunk's draws to host immediately —
                    # otherwise every chunk's device output stays alive
                    # in ``outs`` until the run ends and the auto-chunk
                    # output budget would bound nothing. Scalar-only
                    # outputs are negligible and stay lazy.
                    out = {k: np.asarray(v) for k, v in out.items()}
                outs.append(out)
                if bars:
                    _force_completion(out)
                    for bar in bars:
                        bar.update(ln)
                elif (i + 1) % 4 == 0:
                    # bound the async in-flight dispatch queue: tunneled
                    # TPU runtimes reject new executions past a queue
                    # depth limit (observed as InvalidArgument ~17 scan
                    # chunks deep at n=1600)
                    _force_completion(out)
        finally:
            for bar in bars:
                bar.close()

        #: resumable end-of-run carry (see docstring)
        self.final_carry = carry
        self._check_run_solver_health(carry)

        merged = {}
        for name in tuple(self.posterior_names) + tuple(self.track):
            arr = np.concatenate([np.asarray(o[name]) for o in outs])
            merged[name] = np.moveaxis(arr, 0, 1)[:, burnin:]
        return PosteriorParameter(merged)

    def sample_until(
        self, rhat_tol=1.01, min_ess=400.0, chains=4, check_every=512,
        max_size=32768, start=None, discard_frac=0.5, progressbar=False,
    ):
        """Sample adaptively until convergence (rebuild addition).

        Extends the run in ``check_every``-draw blocks (each a resumed
        dispatch of the same compiled scan — no recompilation, bitwise
        identical to one long run) until, over the retained window (the
        last ``1 - discard_frac`` of draws — the adaptive analog of
        burn-in), every recorded scalar has rank-normalized split-R-hat
        <= ``rhat_tol`` and pooled bulk ESS >= ``min_ess`` (``None``
        disables either criterion). Returns the window's
        :class:`~occuspytial_tpu.posterior.PosteriorParameter`; raises
        ``RuntimeError`` naming the worst parameter if ``max_size``
        draws do not converge. The reference has no analog — its run
        length is fixed up front (gibbs/base.py:243-291).
        """
        from .. import diagnostics as dg

        if check_every < 8:
            raise ValueError('check_every must be at least 8')
        acc = {}
        carry = None
        total = 0
        while True:
            post = self.sample(
                check_every, chains=chains, start=start,
                progressbar=progressbar, resume_from=carry,
            )
            carry, start = self.final_carry, None
            total += check_every
            for name in post.data:
                arr = np.asarray(post[name])
                acc[name] = (
                    arr if name not in acc
                    else np.concatenate([acc[name], arr], axis=1)
                )
            keep = max(int(total * (1.0 - discard_frac)), 4)
            window = {k: v[:, -keep:] for k, v in acc.items()}
            worst_name, worst_rhat = None, 0.0
            worst_ess_name, worst_ess = None, np.inf
            for name, arr in window.items():
                scalar = arr.ndim == 2
                cols = arr[..., None] if scalar else arr
                for j in range(cols.shape[2]):
                    label = name if scalar else f'{name}[{j}]'
                    r = float(dg.rhat(cols[:, :, j]))
                    e = float(dg.ess_bulk(cols[:, :, j]))
                    if r > worst_rhat:
                        worst_name, worst_rhat = label, r
                    if e < worst_ess:
                        worst_ess_name, worst_ess = label, e
            ok_rhat = rhat_tol is None or worst_rhat <= rhat_tol
            ok_ess = min_ess is None or worst_ess >= min_ess
            if ok_rhat and ok_ess:
                return PosteriorParameter(window)
            if total >= max_size:
                raise RuntimeError(
                    f'no convergence after {total} draws: worst r_hat '
                    f'{worst_rhat:.4f} on {worst_name} (tol {rhat_tol}), '
                    f'min pooled ess_bulk {worst_ess:.0f} on '
                    f'{worst_ess_name} (need {min_ess})'
                )

    def copy(self):
        """Return a same-model sampler with an independent random stream
        (API parity with reference gibbs/base.py:293-306). Shares the
        compiled runner with the original — no recompilation.

        Each successive copy gets a distinct stream: the seed is derived
        from (parent seed, spawn counter) through ``SeedSequence.spawn``
        — the analog of the reference's per-copy spawned child streams —
        so ``[s.copy() for _ in range(4)]`` never yields two identical
        chains and never collides with ``random_state=seed+1``.
        """
        out = self.__class__.__new__(self.__class__)
        out.__dict__.update(self.__dict__)
        self._n_spawned = getattr(self, '_n_spawned', 0) + 1
        children = np.random.SeedSequence(self._seed).spawn(self._n_spawned)
        out._seed = int(children[-1].generate_state(1)[0])
        out._n_spawned = 0
        return out
