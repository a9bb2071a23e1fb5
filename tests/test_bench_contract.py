"""Driver-contract smoke tests: bench.py must always print one valid JSON
line (the driver records it as BENCH_r{N}.json), and __graft_entry__.entry
must return a jittable (fn, args)."""

import json
import os
import subprocess
import sys

import jax
import pytest


@pytest.mark.slow
def test_bench_smoke_offtpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # force CPU via jax.config BEFORE bench runs: on this image a
    # sitecustomize overrides the JAX_PLATFORMS env var, so env alone
    # silently left this "off-TPU" smoke running on the real TPU
    # (CLAUDE.md "environment quirks")
    res = subprocess.run(
        [sys.executable, "-c",
         "import sys, runpy; import jax; "
         "jax.config.update('jax_platforms', 'cpu'); "
         "sys.argv = ['bench.py', '--budget', '180']; "
         "runpy.run_path('bench.py', run_name='__main__')"],
        capture_output=True, text=True, timeout=560, cwd=repo, env=env,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    line = res.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(data)
    assert data["value"] > 0, data
    assert data["paths"].get("xla", 0) > 0, data


def test_bench_watchdog_fires_json_line():
    """If the TPU stack wedges (backend init / compile blocking in C++ —
    seen live during a relay outage), bench must STILL print one valid
    JSON line and exit, because the driver records stdout as BENCH_r{N}:
    a silent hang loses the round's benchmark entirely."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, %r); import bench; "
         "bench._arm_watchdog(1.0, {'metric': 'm', 'value': 0.0, "
         "'unit': 'fps/chip', 'vs_baseline': 0.0, 'error': 'wedged'}); "
         "time.sleep(30)" % repo],
        capture_output=True, text=True, timeout=25,
    )
    assert res.returncode == 3, (res.returncode, res.stderr[-300:])
    data = json.loads(res.stdout.strip().splitlines()[-1])
    assert data["error"] == "wedged" and data["value"] == 0.0


def test_bench_watchdog_budget_parse():
    import bench

    assert bench._watchdog_budget(["--budget", "60"]) == 960.0
    assert bench._watchdog_budget([]) == 1380.0
    # malformed --budget must not crash the watchdog (main errors later)
    assert bench._watchdog_budget(["--budget"]) == 1380.0


def test_graft_entry_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] == 3
