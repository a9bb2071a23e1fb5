"""Driver-contract smoke tests: bench.py must always print one valid JSON
line (the driver records it as BENCH_r{N}.json), and __graft_entry__.entry
must return a jittable (fn, args)."""

import json
import os
import subprocess
import sys

import jax


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


def test_graft_entry_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] == 3
