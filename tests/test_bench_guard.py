"""Wedge-guard tests for bench.py (VERDICT r5 item 6).

The tunnel-attached TPU can wedge in two distinct ways, both observed:
(a) a probed section's dispatch never completes (19-minute outlier step),
(b) client creation hangs in the bench process itself even though a fresh
subprocess round-trips fine.  bench.py must survive both with the wedge
flagged in its one JSON line instead of hanging the round driver.

Both tests run bench.py in a subprocess on the CPU backend with synthetic
hangs injected via environment knobs."""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BENCH = os.path.join(_REPO, 'bench.py')


def _run_bench(extra_env, timeout=900):
    # strip accelerator-runtime variables so the subprocess's sitecustomize
    # does not attach the tunnel TPU (same pattern as test_multihost)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_', 'PALLAS_', 'AXON_',
                                'TPU_', 'PYLABFEA_BENCH_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    # tiny workload: 4k return-map points, no FE/scale/3d/ref sections
    # unless the test turns them back on
    env.update({'PYLABFEA_BENCH_PROBE': '0', 'PYLABFEA_BENCH_N': '4096',
                'PYLABFEA_BENCH_FE': '0'})
    env.update(extra_env)
    res = subprocess.run([sys.executable, _BENCH], env=env, timeout=timeout,
                         capture_output=True, text=True, cwd=_REPO)
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    return json.loads(line), res.stderr


def test_synthetic_section_wedge_skips_and_flags():
    """A section whose probe (and its retry) hangs is skipped, counted in
    wedge_events, and listed in wedge_skipped — the JSON line still
    appears."""
    rec, err = _run_bench({'PYLABFEA_BENCH_FE': '1',
                           'PYLABFEA_BENCH_SCALE': '0',
                           'PYLABFEA_BENCH_3D': '0',
                           'PYLABFEA_BENCH_128': '0',
                           'PYLABFEA_BENCH_REF': '0',
                           'PYLABFEA_BENCH_FORCE_WEDGE': 'fe'})
    assert rec['wedge_events'] == 2, rec
    assert rec['wedge_skipped'] == ['fe'], rec
    assert 'section skipped' in err
    # the fe section never ran, so no step fields
    assert 'step_s' not in rec


def test_synthetic_section_wedge_retry_recovers():
    """FORCE_WEDGE='once': the first probe attempt hangs, the retry
    recovers — one event, nothing skipped."""
    rec, _ = _run_bench({'PYLABFEA_BENCH_FE': '1',
                         'PYLABFEA_BENCH_FE_N': '64',
                         'PYLABFEA_BENCH_SCALE': '0',
                         'PYLABFEA_BENCH_3D': '0',
                         'PYLABFEA_BENCH_128': '0',
                         'PYLABFEA_BENCH_REF': '0',
                         'PYLABFEA_BENCH_FORCE_WEDGE': 'once'})
    assert rec['wedge_events'] == 1, rec
    assert 'wedge_skipped' not in rec
    assert rec.get('step_s', 0) > 0, rec   # the fe section DID run


def test_client_creation_watchdog_emits_flagged_line():
    """A hang in the bench process's own first device touch (client
    creation) is cut by the watchdog: the JSON line appears with
    tpu_client_creation_wedged set, within the watchdog timeout."""
    rec, err = _run_bench({'PYLABFEA_BENCH_FORCE_CLIENT_WEDGE': '1',
                           'PYLABFEA_BENCH_CLIENT_TIMEOUT': '3'},
                          timeout=300)
    assert rec['tpu_client_creation_wedged'] is True, rec
    assert rec['value'] == 0.0
    assert 'client creation did not complete' in err
