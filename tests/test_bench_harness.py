"""Unit tests for the benchmark harness's fault machinery.

Round 3's bench produced ZERO fresh measurements because the harness
could not classify or recover from the tunneled runtime's process-
poisoning fault (see docs/design.md "Operational notes"). These tests
drive ``bench.run_worker_batch`` against scripted fake workers
(``BENCH_WORKER_CMD`` seam) so the harvest loop, the activity watchdog,
the backend-fault classification and the reason codes are pinned
without touching a device — the machinery that decides whether a round
ships numbers must itself be tested.
"""

import os
import sys
import textwrap
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)
)))
import bench  # noqa: E402


def fake_worker(tmp_path, monkeypatch, body):
    """Install a scripted worker: ``body`` runs with ``configs`` (the
    comma-split argv[1]) in scope and prints HB/RESULT lines."""
    script = tmp_path / 'worker.py'
    script.write_text(textwrap.dedent(
        '''
        import json, sys, time
        configs = sys.argv[1].split(',')
        '''
    ) + textwrap.dedent(body))
    monkeypatch.setenv(
        'BENCH_WORKER_CMD', f'{sys.executable} {script}'
    )


def harvest(configs, deadline_s=30.0, idle_cap=5.0):
    got = []

    def on_result(which, parsed):
        got.append((which, parsed))

    pend, reason = bench.run_worker_batch(
        list(configs), time.time() + deadline_s, on_result,
        idle_cap=idle_cap,
    )
    return pend, reason, got


def test_all_results_reason_done(tmp_path, monkeypatch):
    fake_worker(tmp_path, monkeypatch, '''
        for w in configs:
            print('HB working on ' + w, flush=True)
            print('RESULT ' + json.dumps(
                {'which': w, 'ess_per_sec': 1.0}), flush=True)
        ''')
    pend, reason, got = harvest(['4', '1'])
    assert pend == []
    assert reason == 'done'
    assert [w for w, _ in got] == ['4', '1']


def test_worker_exit_returns_remaining(tmp_path, monkeypatch):
    """A retiring worker (clean exit mid-list) yields reason='exit' and
    the un-produced configs stay pending, in order."""
    fake_worker(tmp_path, monkeypatch, '''
        print('RESULT ' + json.dumps(
            {'which': configs[0], 'ess_per_sec': 2.0}), flush=True)
        ''')
    pend, reason, got = harvest(['4', '1', '2'])
    assert reason == 'exit'
    assert pend == ['1', '2']
    assert got[0][0] == '4'


def test_two_backend_faults_classified(tmp_path, monkeypatch):
    """Two consecutive backend-signature error rows mean the WORKER is
    sick: the batch ends with reason='backend'."""
    fake_worker(tmp_path, monkeypatch, '''
        for w in configs:
            print('RESULT ' + json.dumps({'which': w, 'error':
                'INVALID_ARGUMENT: TPU backend error'}), flush=True)
            time.sleep(0.1)
        time.sleep(30)
        ''')
    pend, reason, got = harvest(['4', '1', '2'])
    assert reason == 'backend'
    assert len(got) == 2      # killed after the second fault row
    assert pend == ['2']


def test_one_fault_then_success_not_backend(tmp_path, monkeypatch):
    """A single backend-looking error followed by a success resets the
    consecutive-fault counter — one flaky config is config-local."""
    fake_worker(tmp_path, monkeypatch, '''
        print('RESULT ' + json.dumps({'which': configs[0], 'error':
            'INVALID_ARGUMENT: TPU backend error'}), flush=True)
        for w in configs[1:]:
            print('RESULT ' + json.dumps(
                {'which': w, 'ess_per_sec': 3.0}), flush=True)
        ''')
    pend, reason, got = harvest(['4', '1', '2'])
    assert reason == 'done'
    assert pend == []


def test_idle_watchdog_kills(tmp_path, monkeypatch):
    fake_worker(tmp_path, monkeypatch, '''
        print('RESULT ' + json.dumps(
            {'which': configs[0], 'ess_per_sec': 1.0}), flush=True)
        time.sleep(60)
        ''')
    t0 = time.time()
    pend, reason, got = harvest(['4', '1'], idle_cap=2.0)
    assert reason == 'idle'
    assert pend == ['1']
    assert time.time() - t0 < 30          # killed by the cap, not deadline


def test_slow_stage_marker_extends_cap(tmp_path, monkeypatch):
    """An HB naming a known slow stage (warmup/init) buys the 420s
    allowance: a 6s silence under a 2s idle_cap survives."""
    fake_worker(tmp_path, monkeypatch, '''
        # a plain HB first drops the allowance to idle_cap; the warmup
        # marker must then raise it back for the 6s silent compile
        print('HB plain stage', flush=True)
        print('HB [config 4] warmup run (compile + dispatch)',
              flush=True)
        time.sleep(6)
        for w in configs:
            print('RESULT ' + json.dumps(
                {'which': w, 'ess_per_sec': 1.0}), flush=True)
        ''')
    pend, reason, got = harvest(['4'], idle_cap=2.0)
    assert reason == 'done'
    assert pend == []


def test_malformed_result_line_ignored(tmp_path, monkeypatch):
    fake_worker(tmp_path, monkeypatch, '''
        print('RESULT {"which": "4", "ess_per', flush=True)
        print('RESULT ' + json.dumps(
            {'which': '4', 'ess_per_sec': 1.0}), flush=True)
        ''')
    pend, reason, got = harvest(['4'])
    assert reason == 'done'
    assert got == [('4', {'which': '4', 'ess_per_sec': 1.0})]


def test_deadline_stops_batch(tmp_path, monkeypatch):
    fake_worker(tmp_path, monkeypatch, '''
        time.sleep(60)
        ''')
    t0 = time.time()
    pend, reason, got = harvest(['4'], deadline_s=2.0, idle_cap=60.0)
    assert reason == 'deadline'
    assert pend == ['4']
    assert time.time() - t0 < 30


@pytest.mark.parametrize('err,expect', [
    ('INVALID_ARGUMENT: TPU backend error (InvalidArgument).', True),
    ('Error reading persistent compilation cache entry', True),
    ('UNAVAILABLE: socket closed', True),
    ("ValueError('burnin value cannot be larger than sample size')",
     False),
    ('', False),
])
def test_backend_fault_signatures(err, expect):
    assert bench._is_backend_fault(err) is expect


def test_worker_retires_after_cap(tmp_path, monkeypatch):
    """The REAL worker loop (run_worker) retires after
    MAX_CONFIGS_PER_WORKER configs; exercised through compute_one
    stubbed to avoid any device work."""
    calls = []

    def fake_compute(which, stage):
        calls.append(which)
        return {'which': which, 'ess_per_sec': 1.0}

    monkeypatch.setattr(bench, 'compute_one', fake_compute)
    monkeypatch.setattr(bench, '_init_jax', lambda stage: None)
    bench.run_worker(['4', '1', '2', '3'])
    assert calls == ['4', '1'][:bench.MAX_CONFIGS_PER_WORKER]


def test_worker_exits_on_backend_fault_row(tmp_path, monkeypatch):
    calls = []

    def fake_compute(which, stage):
        calls.append(which)
        return {'which': which,
                'error': 'INVALID_ARGUMENT: TPU backend error'}

    monkeypatch.setattr(bench, 'compute_one', fake_compute)
    monkeypatch.setattr(bench, '_init_jax', lambda stage: None)
    bench.run_worker(['4', '1'])
    assert calls == ['4']     # exited after the first fault row
