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
