"""Environment diagnostics (reve_tpu.doctor)."""

import json


def test_doctor_all_probes_pass(capsys):
    from reve_tpu import doctor

    rc = doctor.main(["--json"])
    out = capsys.readouterr().out
    data = json.loads(out.strip().splitlines()[-1])
    assert rc == 0 and data["ok"] is True
    names = {p["probe"] for p in data["probes"]}
    assert {"accelerator", "native core", "native mp4/mkv mux",
            "mini pipeline e2e"} <= names
    for p in data["probes"]:
        assert p["status"] in ("ok", "warn"), p


def test_doctor_watchdog_reports_wedged_stack():
    """A wedged accelerator stack (jax.devices() blocking forever in
    native code — the live round-3 relay outage mode) must produce an
    honest diagnostic + JSON line and exit 2 instead of hanging."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import time
from reve_tpu import doctor
doctor._jax_device = lambda: time.sleep(3600)
raise SystemExit(doctor.main(["--json", "--timeout", "2"]))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60, cwd=".")
    assert r.returncode == 2, (r.stdout, r.stderr)
    assert "accelerator stack wedged" in r.stdout
    data = json.loads(r.stdout.strip().splitlines()[-1])
    assert data["ok"] is False
    assert data["probes"][-1]["probe"] == "watchdog"
