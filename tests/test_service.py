"""Service layer tests: config validation/regeneration, gated logger,
suffix util, and a full HTTP job round-trip with a fake engine."""

import fractions
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from reve_tpu.io import reader, writer
from reve_tpu.service import config as config_mod
from reve_tpu.service.jobs import JobManager, replace_file_suffix
from reve_tpu.service.logger import ServiceLogger


# -- replace_file_suffix: the cases the reference's (stale) unit tests
#    document (reve-gui/src-tauri/src/utils.rs:90-149) ---------------------

def test_suffix_linux_path():
    assert replace_file_suffix("/a/b/video.mkv", 2) == \
        "/a/b/video_upscaled-2x.mp4"


def test_suffix_spaces_and_ext():
    assert replace_file_suffix("/a/my video.mp4", 4, "mkv") == \
        "/a/my video_upscaled-4x.mkv"


def test_suffix_no_ext():
    assert replace_file_suffix("/a/video", 3) == "/a/video_upscaled-3x.mp4"


# -- config ----------------------------------------------------------------

def test_config_roundtrip(tmp_path):
    path = str(tmp_path / "cfg.json")
    cfg = config_mod.ServiceConfig(application_logs=True, default_scale=3)
    config_mod.save(cfg, path)
    loaded = config_mod.load(path)
    assert loaded == cfg


def test_config_regenerates_on_invalid(tmp_path):
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as f:
        f.write("{broken json")
    cfg = config_mod.load(path)
    assert cfg == config_mod.ServiceConfig()
    # file was rewritten with valid defaults
    with open(path) as f:
        assert json.load(f)["default-upscale-type"] == "realesr-animevideov3"


def test_config_rejects_unknown_model(tmp_path):
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as f:
        json.dump({"default-upscale-type": "not-a-model"}, f)
    assert config_mod.load(path) == config_mod.ServiceConfig()


def test_save_invalid_raises(tmp_path):
    with pytest.raises(ValueError):
        config_mod.save(
            config_mod.ServiceConfig(default_scale=7),
            str(tmp_path / "x.json"),
        )


# -- logger (config-gated, utils.rs:28-35 semantics) -----------------------

def test_logger_gated(tmp_path):
    log_path = str(tmp_path / "log.txt")
    off = ServiceLogger(config_mod.ServiceConfig(application_logs=False),
                        path=log_path)
    assert off.write("hidden") is False
    import os

    assert not os.path.exists(log_path)
    on = ServiceLogger(config_mod.ServiceConfig(application_logs=True),
                       path=log_path)
    assert on.write("hello") is True
    content = open(log_path).read()
    assert "hello" in content and "#####" in content


# -- HTTP API round trip ---------------------------------------------------

class FakeEngine:
    batch_size = 3
    scale = 2

    def submit(self, frames):
        out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

        class _P:
            def result(self):
                return out

        return _P()


@pytest.fixture
def server(tmp_path):
    from reve_tpu.service import server as server_mod

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(
        cfg, engine_factory=lambda m, s: FakeEngine(), io_backend="y4m"
    )
    srv = server_mod.make_server("127.0.0.1", 0, cfg=cfg, manager=manager)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    manager.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _post(url, data):
    req = urllib.request.Request(
        url, data=json.dumps(data).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_api_version(server):
    from reve_tpu.version import __version__

    assert _get(server + "/api/version")["version"] == __version__


def test_api_suffix(server):
    out = _post(server + "/api/suffix", {"path": "/x/v.mp4", "factor": 3})
    assert out["path"] == "/x/v_upscaled-3x.mp4"


def test_api_job_end_to_end(server, tmp_path):
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(12):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))
    out = str(tmp_path / "out.y4m")
    job = _post(server + "/api/jobs",
                {"input": inp, "scale": 2, "output": out})
    assert job["status"] in ("queued", "running")

    deadline = time.time() + 60
    while time.time() < deadline:
        j = _get(server + f"/api/jobs/{job['id']}")
        if j["status"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert j["status"] == "done", j["error"]
    assert j["progress"]["encode"]["done"] == 12
    # end-to-end x-realtime factor rides the progress snapshot
    assert j["progress"]["x_realtime"] > 0
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (64, 48, 12)


def test_api_job_missing_input(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/api/jobs", {"input": "/nope.mp4"})
    assert ei.value.code == 400


def test_index_page(server):
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        html = r.read().decode()
    assert "reve-tpu" in html


def test_api_job_cancel_queued(server, tmp_path):
    # a job with a nonexistent-but-created input that will sit queued briefly
    inp = str(tmp_path / "q.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(60):
            wr.write(np.full((24, 32, 3), 100, np.uint8))
    # submit two: the second stays queued while the first runs
    j1 = _post(server + "/api/jobs",
               {"input": inp, "scale": 2,
                "output": str(tmp_path / "o1.y4m")})
    j2 = _post(server + "/api/jobs",
               {"input": inp, "scale": 2,
                "output": str(tmp_path / "o2.y4m")})
    req = urllib.request.Request(
        server + f"/api/jobs/{j2['id']}", method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["cancelled"] == j2["id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        s2 = _get(server + f"/api/jobs/{j2['id']}")["status"]
        s1 = _get(server + f"/api/jobs/{j1['id']}")["status"]
        if s2 == "cancelled" and s1 in ("done", "error"):
            break
        time.sleep(0.2)
    assert s2 == "cancelled"
    assert s1 == "done"


def test_api_cancel_unknown_job(server):
    req = urllib.request.Request(server + "/api/jobs/9999", method="DELETE")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 409


def test_api_models(server):
    models = _get(server + "/api/models")
    names = [m["name"] for m in models]
    assert "realesr-animevideov3" in names
    assert any(m["arch"] == "rrdb" for m in models)

def test_resubmit_resumes_from_parts(tmp_path):
    """cancel() documents that completed parts remain so a re-submitted job
    resumes; _run_job must keep the workspace's parts and repair the queue
    instead of wiping and restarting from frame 0 (round-1 advisor
    finding)."""
    from reve_tpu.pipeline import state as state_mod
    from reve_tpu.pipeline.planner import plan_segments as plan

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(12):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))
    out = str(tmp_path / "out.y4m")

    # plant an interrupted workspace: segment 0 (5 frames) already encoded
    ws = state_mod.Workspace(out + ".revework")
    ws.create()
    st = state_mod.JobState(
        input_path=inp, output_path=out, scale=2, segment_size=5,
        frame_count=12, fps_num=24, fps_den=1, width=32, height=24,
        pending=plan(12, 5),
    )
    with writer.Y4MWriter(ws.part_tmp_path(0, ".y4m"), 64, 48,
                          fractions.Fraction(24)) as wr:
        for i in range(5):
            up = np.full((24, 32, 3), 30 + i * 10, np.uint8)
            wr.write(np.repeat(np.repeat(up, 2, axis=0), 2, axis=1))
    ws.commit_part(0, ".y4m")
    ws.save(st)

    class CountingEngine(FakeEngine):
        frames_seen = 0

        def submit(self, frames):
            CountingEngine.frames_seen += len(frames)
            return super().submit(frames)

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(cfg, engine_factory=lambda m, s: CountingEngine(),
                         io_backend="y4m")
    try:
        job = manager.submit(inp, 2, output_path=out)
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        assert job.status == "done", job.error
        rd = reader.Y4MReader(out)
        assert rd.frame_count() == 12
        # only segments 1..2 (7 frames) were re-processed, not all 12
        assert CountingEngine.frames_seen < 12
    finally:
        manager.shutdown()

def test_api_batch_of_three_sequential(server, tmp_path):
    """The GUI's multi-select batch flow (reve-gui Index.vue:340-353): three
    files submitted together process sequentially with per-job progress and
    all complete."""
    inputs = []
    for k in range(3):
        p = str(tmp_path / f"b{k}.y4m")
        with writer.Y4MWriter(p, 32, 24, fractions.Fraction(24)) as wr:
            for i in range(6):
                wr.write(np.full((24, 32, 3), 40 + 10 * i, np.uint8))
        inputs.append(p)
    jobs = [
        _post(server + "/api/jobs",
              {"input": p, "scale": 2,
               "output": str(tmp_path / f"o{k}.y4m")})
        for k, p in enumerate(inputs)
    ]
    deadline = time.time() + 120
    done = {}
    while time.time() < deadline and len(done) < 3:
        for j in jobs:
            s = _get(server + f"/api/jobs/{j['id']}")
            if s["status"] in ("done", "error"):
                done[j["id"]] = s
        time.sleep(0.2)
    assert len(done) == 3
    for s in done.values():
        assert s["status"] == "done", s["error"]
        assert s["progress"]["encode"]["done"] == 6
    for k in range(3):
        rd = reader.Y4MReader(str(tmp_path / f"o{k}.y4m"))
        assert rd.frame_count() == 6


def test_api_browse(server, tmp_path):
    sub = tmp_path / "clips"
    sub.mkdir()
    with writer.Y4MWriter(str(sub / "a.y4m"), 16, 16,
                          fractions.Fraction(24)) as wr:
        wr.write(np.zeros((16, 16, 3), np.uint8))
    (sub / "notes.txt").write_text("x")
    d = _get(server + "/api/browse?dir=" + str(tmp_path))
    names = {e["name"]: e for e in d["entries"]}
    assert names["clips"]["is_dir"] is True
    d2 = _get(server + "/api/browse?dir=" + str(sub))
    names2 = {e["name"]: e for e in d2["entries"]}
    assert names2["a.y4m"]["is_video"] is True
    assert names2["notes.txt"]["is_video"] is False
    assert d2["parent"] == str(tmp_path)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/api/browse?dir=" + str(tmp_path / "nope"))
    assert ei.value.code == 400


def test_api_log_tail(server, tmp_path):
    # enable logging, write, then read the tail back
    cfg = _get(server + "/api/config")
    cfg["application-logs"] = True
    _post(server + "/api/config", cfg)
    _post(server + "/api/log", {"message": "hello from the ui"})
    out = _get(server + "/api/log?lines=50")
    assert "hello from the ui" in out["log"]
    assert out["enabled"] is True


def test_index_page_has_all_sections(server):
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        html = r.read().decode()
    for needle in ("Settings", "Log", "About", "Browse", "drop file paths",
                   "Upscale all", "api/browse", "api/config"):
        assert needle in html, needle


def test_progressive_parts_streaming(tmp_path):
    """Progressive output (ROADMAP #7): committed segment parts are listed
    and downloadable while the job is still running."""
    import urllib.request as rq

    from reve_tpu.service import server as server_mod

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(30):
            wr.write(np.full((24, 32, 3), 30 + i * 5, np.uint8))

    class SlowEngine(FakeEngine):
        def submit(self, frames):
            time.sleep(0.15)
            return super().submit(frames)

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(cfg, engine_factory=lambda m, s: SlowEngine(),
                         io_backend="y4m")
    srv = server_mod.make_server("127.0.0.1", 0, cfg=cfg, manager=manager)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        out = str(tmp_path / "o.y4m")
        job = _post(base + "/api/jobs", {"input": inp, "scale": 2,
                                         "output": out})
        # poll until at least one part commits while the job still runs
        deadline = time.time() + 60
        got_partial = None
        while time.time() < deadline:
            s = _get(base + f"/api/jobs/{job['id']}")
            parts = _get(base + f"/api/jobs/{job['id']}/parts")["parts"]
            if parts and s["status"] == "running":
                got_partial = parts
                break
            if s["status"] in ("done", "error"):
                break
            time.sleep(0.05)
        assert got_partial, "no part committed while running"
        # download the first committed part: a decodable upscaled segment
        with rq.urlopen(
            base + f"/api/jobs/{job['id']}/parts/{got_partial[0]['index']}",
            timeout=10,
        ) as r:
            data = r.read()
        assert data.startswith(b"YUV4MPEG2")
        part_file = tmp_path / "part0.y4m"
        part_file.write_bytes(data)
        rd = reader.Y4MReader(str(part_file))
        assert rd.frame_count() == 5 and rd.width == 64
        # and the job still finishes correctly
        deadline = time.time() + 60
        while time.time() < deadline:
            s = _get(base + f"/api/jobs/{job['id']}")
            if s["status"] in ("done", "error"):
                break
            time.sleep(0.1)
        assert s["status"] == "done", s["error"]
        assert reader.Y4MReader(out).frame_count() == 30
    finally:
        srv.shutdown()
        manager.shutdown()


def test_api_metrics(server, tmp_path):
    inp = str(tmp_path / "m.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 50, np.uint8))
    job = _post(server + "/api/jobs",
                {"input": inp, "scale": 2,
                 "output": str(tmp_path / "mo.y4m")})
    deadline = time.time() + 60
    while time.time() < deadline:
        if _get(server + f"/api/jobs/{job['id']}")["status"] in ("done",
                                                                "error"):
            break
        time.sleep(0.1)
    with urllib.request.urlopen(server + "/api/metrics", timeout=10) as r:
        text = r.read().decode()
    assert 'reve_jobs_total{status="done"}' in text
    assert "reve_frames_encoded_total" in text
    done_line = [ln for ln in text.splitlines()
                 if ln.startswith('reve_jobs_total{status="done"}')][0]
    assert int(done_line.rsplit(" ", 1)[1]) >= 1


def test_api_output_download(server, tmp_path):
    import urllib.request as rq

    inp = str(tmp_path / "d.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 90, np.uint8))
    out = str(tmp_path / "do.y4m")
    job = _post(server + "/api/jobs", {"input": inp, "scale": 2,
                                       "output": out})
    # not ready while queued/running
    deadline = time.time() + 60
    while time.time() < deadline:
        s = _get(server + f"/api/jobs/{job['id']}")["status"]
        if s in ("done", "error"):
            break
        time.sleep(0.1)
    assert s == "done"
    with rq.urlopen(server + f"/api/jobs/{job['id']}/output",
                    timeout=10) as r:
        data = r.read()
    assert data.startswith(b"YUV4MPEG2")
    assert data == open(out, "rb").read()
    with pytest.raises(urllib.error.HTTPError) as ei:
        rq.urlopen(server + "/api/jobs/99999/output", timeout=10)
    assert ei.value.code == 404


def test_job_dtype_turbo_plumbing(tmp_path):
    """dtype reaches the Job and a 3-arg engine factory; a 2-arg factory
    errors the job on non-default dtype (no silent bf16 run) but still
    serves default-dtype jobs; invalid dtype rejected at submit."""
    cfg = config_mod.ServiceConfig(segment_size=5)
    seen = []

    def factory3(m, s, dtype):
        seen.append((m, s, dtype))
        return FakeEngine()

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))

    def _wait(job):
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        return job

    manager = JobManager(cfg, engine_factory=factory3, io_backend="y4m")
    try:
        out = str(tmp_path / "out.y4m")
        job = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   output_path=out))
        assert job.dtype == "int8"
        assert job.to_json()["dtype"] == "int8"
        assert job.status == "done", job.error
        assert seen == [("realesr-animevideov3", 2, "int8")]
        with pytest.raises(ValueError, match="dtype"):
            manager.submit(inp, scale=2, dtype="float16")
    finally:
        manager.shutdown()

    manager = JobManager(cfg, engine_factory=lambda m, s: FakeEngine(),
                         io_backend="y4m")
    try:
        ok = _wait(manager.submit(inp, scale=2,
                                  output_path=str(tmp_path / "ok.y4m")))
        assert ok.status == "done", ok.error
        bad = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   output_path=str(tmp_path / "bad.y4m")))
        assert bad.status == "error"
        assert "dtype" in bad.error
    finally:
        manager.shutdown()


def test_job_int8_calib_plumbing(tmp_path):
    """int8_calib reaches the Job, the engine cache key, and a 4-arg
    factory; a 3-arg factory errors the job on a non-default calib (no
    silent max run); invalid calib rejected at submit."""
    cfg = config_mod.ServiceConfig(segment_size=5)
    seen = []

    def factory4(m, s, dtype, calib):
        seen.append((m, s, dtype, calib))
        return FakeEngine()

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))

    def _wait(job):
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        return job

    manager = JobManager(cfg, engine_factory=factory4, io_backend="y4m")
    try:
        job = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   int8_calib="p99.9",
                                   output_path=str(tmp_path / "o.y4m")))
        assert (job.int8_calib, job.to_json()["int8_calib"]) == \
            ("p99.9", "p99.9")
        assert job.status == "done", job.error
        assert seen == [("realesr-animevideov3", 2, "int8", "p99.9")]
        with pytest.raises(ValueError, match="int8_calib"):
            manager.submit(inp, scale=2, dtype="int8", int8_calib="q9")
        # range-checked at submit too, not just syntax (p101/p0 would
        # otherwise only explode later in the worker thread)
        for bad_calib in ("p101", "p0", "p-3"):
            with pytest.raises(ValueError, match="int8_calib"):
                manager.submit(inp, scale=2, dtype="int8",
                               int8_calib=bad_calib)
    finally:
        manager.shutdown()

    manager = JobManager(cfg, engine_factory=lambda m, s, d: FakeEngine(),
                         io_backend="y4m")
    try:
        # a 3-arg factory cannot honor a NON-default calibration statistic
        # (the engine default is p99.9 since round 4): explicit error, no
        # silent p99.9 run
        bad = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   int8_calib="max",
                                   output_path=str(tmp_path / "b.y4m")))
        assert bad.status == "error" and "int8_calib" in bad.error
        # ...but it still serves default-calibration int8 jobs
        ok = _wait(manager.submit(inp, scale=2, dtype="int8",
                                  output_path=str(tmp_path / "ok.y4m")))
        assert ok.status == "done", ok.error
    finally:
        manager.shutdown()


def test_job_tta_plumbing(tmp_path):
    """tta reaches the Job (to_json, persisted opts), the engine cache
    key, and a 5-arg factory; a shorter factory errors a tta job instead
    of silently running single-pass; non-bool tta rejected at submit."""
    cfg = config_mod.ServiceConfig(segment_size=5)
    seen = []

    def factory5(m, s, dtype, calib, tta):
        seen.append((m, s, dtype, calib, tta))
        return FakeEngine()

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))

    def _wait(job):
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        return job

    manager = JobManager(cfg, engine_factory=factory5, io_backend="y4m")
    try:
        job = _wait(manager.submit(inp, scale=2, tta=True,
                                   output_path=str(tmp_path / "o.y4m")))
        assert job.status == "done", job.error
        assert (job.tta, job.to_json()["tta"]) == (True, True)
        assert seen == [("realesr-animevideov3", 2, "bfloat16",
                         "p99.9", True)]
        with pytest.raises(ValueError, match="tta"):
            manager.submit(inp, scale=2, tta="yes")
    finally:
        manager.shutdown()

    manager = JobManager(cfg, engine_factory=lambda m, s: FakeEngine(),
                         io_backend="y4m")
    try:
        bad = _wait(manager.submit(inp, scale=2, tta=True,
                                   output_path=str(tmp_path / "b.y4m")))
        assert bad.status == "error" and "tta" in bad.error
        # default-tta jobs through the 2-arg factory keep working
        ok = _wait(manager.submit(inp, scale=2,
                                  output_path=str(tmp_path / "c.y4m")))
        assert ok.status == "done", ok.error
    finally:
        manager.shutdown()


# -- hardening: Host/Origin checks, bearer token, browse jail ---------------


def _req(url, method="GET", headers=None, data=None):
    req = urllib.request.Request(url, method=method, data=data,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_host_header_rebinding_refused(server):
    """DNS rebinding: the victim's browser resolves evil.com to 127.0.0.1
    and sends Host: evil.com — every endpoint must refuse it."""
    code, body = _req(server + "/api/jobs",
                      headers={"Host": "evil.example:8321"})
    assert code == 403 and "Host" in body["error"]
    code, _ = _req(server + "/api/config", method="POST", data=b"{}",
                   headers={"Host": "evil.example",
                            "Content-Type": "application/json"})
    assert code == 403
    # normal loopback Host still works (urllib sets it automatically)
    assert _req(server + "/api/version")[0] == 200


def test_cross_site_origin_refused_on_state_change(server):
    """A browser CSRF attempt carries the attacker page's Origin on the
    POST — refuse it; same-origin and origin-less (curl) POSTs pass."""
    code, body = _req(server + "/api/suffix", method="POST",
                      data=b'{"path": "/x/v.mp4"}',
                      headers={"Origin": "http://evil.example",
                               "Content-Type": "application/json"})
    assert code == 403 and "Origin" in body["error"]
    code, _ = _req(server + "/api/suffix", method="POST",
                   data=b'{"path": "/x/v.mp4"}',
                   headers={"Origin": "http://127.0.0.1:999",
                            "Content-Type": "application/json"})
    assert code == 200
    # GETs are not blocked by Origin (reads are safe; Host already checked)
    code, _ = _req(server + "/api/jobs",
                   headers={"Origin": "http://evil.example"})
    assert code == 200
    # "Origin: null" (sandboxed iframe / data: URI attacker page) is
    # cross-site too — must not slip past the check
    code, body = _req(server + "/api/suffix", method="POST",
                      data=b'{"path": "/x/v.mp4"}',
                      headers={"Origin": "null",
                               "Content-Type": "application/json"})
    assert code == 403 and "Origin" in body["error"]


@pytest.fixture
def tokened_server(tmp_path):
    from reve_tpu.service import server as server_mod

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(
        cfg, engine_factory=lambda m, s: FakeEngine(), io_backend="y4m"
    )
    srv = server_mod.make_server("127.0.0.1", 0, cfg=cfg, manager=manager,
                                 token="sekrit",
                                 browse_root=str(tmp_path / "jail"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    manager.shutdown()


def test_bearer_token_required(tokened_server):
    assert _req(tokened_server + "/api/jobs")[0] == 401
    code, _ = _req(tokened_server + "/api/jobs",
                   headers={"Authorization": "Bearer wrong"})
    assert code == 401
    code, _ = _req(tokened_server + "/api/jobs",
                   headers={"Authorization": "Bearer sekrit"})
    assert code == 200
    assert _req(tokened_server + "/api/jobs?token=sekrit")[0] == 200
    # the landing page itself needs no token (static html, no data)
    req = urllib.request.Request(tokened_server + "/")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
    # the /metrics alias serves the same data as /api/metrics — the token
    # covers it too
    assert _req(tokened_server + "/metrics")[0] == 401
    req = urllib.request.Request(  # Prometheus text, not JSON
        tokened_server + "/metrics",
        headers={"Authorization": "Bearer sekrit"})
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200


def test_browse_root_jail(tokened_server, tmp_path):
    jail = tmp_path / "jail"
    (jail / "sub").mkdir(parents=True)
    (jail / "clip.mp4").write_bytes(b"x")
    auth = {"Authorization": "Bearer sekrit"}
    code, body = _req(tokened_server + "/api/browse?dir=" + str(jail),
                      headers=auth)
    assert code == 200
    assert body["parent"] is None  # jail root has no browsable parent
    names = {e["name"] for e in body["entries"]}
    assert names == {"sub", "clip.mp4"}
    # escapes are refused: absolute outside, and ../ traversal
    code, body = _req(tokened_server + "/api/browse?dir=/etc", headers=auth)
    assert code == 403 and "browse-root" in body["error"]
    code, _ = _req(tokened_server + "/api/browse?dir="
                   + str(jail / "sub" / ".." / ".."), headers=auth)
    assert code == 403


@pytest.mark.slow
def test_job_int8_psnr_reported(tmp_path):
    """An int8 job through the JobManager reports the measured
    quantization PSNR (parity with the CLI's --dtype int8 report)."""
    from reve_tpu.pipeline.engine import UpscaleEngine

    cfg = config_mod.ServiceConfig(segment_size=5)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(5):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    manager = JobManager(
        cfg,
        engine_factory=lambda m, s, d: UpscaleEngine(
            model=m, scale=s, batch_size=3, compute_dtype=d),
        io_backend="y4m")
    try:
        job = manager.submit(inp, scale=2, dtype="int8",
                             output_path=str(tmp_path / "out.y4m"))
        deadline = time.time() + 120
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.2)
        assert job.status == "done", job.error
        assert job.int8_psnr is not None and job.int8_psnr > 30.0
        assert job.to_json()["int8_psnr"] == job.int8_psnr
    finally:
        manager.shutdown()


@pytest.mark.slow
def test_job_auto_fallback_has_no_int8_certificate(tmp_path, monkeypatch):
    """A --dtype auto job that falls back to bf16 must NOT carry
    int8_psnr: the field means 'ran the turbo, certified N dB' (Job
    docstring), and a quantization certificate on an exact-path job
    misleads any consumer keying on its presence (round-4 review fix).
    The measured dB still surfaces in dtype_note."""
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.engine import UpscaleEngine

    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    # an unclearable gate forces the bf16 fallback deterministically
    monkeypatch.setattr(sched_mod, "AUTO_INT8_GATE_DB", 10000.0)
    cfg = config_mod.ServiceConfig(segment_size=5)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(5):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    manager = JobManager(
        cfg,
        engine_factory=lambda m, s, d, c: UpscaleEngine(
            model=m, scale=s, batch_size=3, compute_dtype=d, int8_calib=c),
        io_backend="y4m")
    try:
        job = manager.submit(inp, scale=2, dtype="auto",
                             output_path=str(tmp_path / "out.y4m"))
        deadline = time.time() + 120
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.2)
        assert job.status == "done", job.error
        assert job.dtype == "bfloat16"
        assert job.int8_psnr is None
        assert "below the 10000 dB gate" in (job.dtype_note or "")
    finally:
        manager.shutdown()


@pytest.mark.slow
def test_job_int8_decodes_calibration_sample_once(tmp_path, monkeypatch):
    """An explicit int8 job certifies BEFORE the pipeline is built, so the
    pipeline's sampled-calibration pass reuses the certification's
    calibration instead of decoding + uploading the same 16 frames twice
    (round-4 review fix — double startup cost on the slow relay)."""
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.engine import UpscaleEngine

    calls = []
    real = sched_mod.read_sampled_frames

    def counting(state, io_backend=None, indices=None):
        calls.append(indices)
        return real(state, io_backend, indices)

    monkeypatch.setattr(sched_mod, "read_sampled_frames", counting)
    cfg = config_mod.ServiceConfig(segment_size=5)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(5):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    manager = JobManager(
        cfg,
        engine_factory=lambda m, s, d, c: UpscaleEngine(
            model=m, scale=s, batch_size=3, compute_dtype=d, int8_calib=c),
        io_backend="y4m")
    try:
        job = manager.submit(inp, scale=2, dtype="int8",
                             output_path=str(tmp_path / "out.y4m"))
        deadline = time.time() + 120
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.2)
        assert job.status == "done", job.error
        assert job.int8_psnr is not None
        assert len(calls) == 1, calls
    finally:
        manager.shutdown()


def test_resubmit_restores_engine_opts(tmp_path):
    """A resumed service job must run with the dtype/int8_calib the job
    was STARTED with, not the resubmission's settings — one output video
    must never mix bf16- and int8-upscaled segments (the CLI resume
    contract, cli.run; round-3 review found the service side missing)."""
    from reve_tpu.pipeline import state as state_mod
    from reve_tpu.pipeline.planner import plan_segments as plan

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(12):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))
    out = str(tmp_path / "out.y4m")

    # plant an interrupted int8/p99.9 workspace with segment 0 committed
    ws = state_mod.Workspace(out + ".revework")
    ws.create()
    st = state_mod.JobState(
        input_path=inp, output_path=out, scale=2, segment_size=5,
        frame_count=12, fps_num=24, fps_den=1, width=32, height=24,
        pending=plan(12, 5), model="realesr-animevideov3",
        opts={"dtype": "int8", "int8_calib": "p99.9"},
    )
    with writer.Y4MWriter(ws.part_tmp_path(0, ".y4m"), 64, 48,
                          fractions.Fraction(24)) as wr:
        for i in range(5):
            up = np.full((24, 32, 3), 30 + i * 10, np.uint8)
            wr.write(np.repeat(np.repeat(up, 2, axis=0), 2, axis=1))
    ws.commit_part(0, ".y4m")
    ws.save(st)

    seen = []

    def factory(m, s, dtype, calib):
        seen.append((dtype, calib))
        return FakeEngine()

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(cfg, engine_factory=factory, io_backend="y4m")
    try:
        # resubmitted with DEFAULTS — the saved opts must win
        job = manager.submit(inp, 2, output_path=out)
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        assert job.status == "done", job.error
        assert seen == [("int8", "p99.9")]
        assert job.dtype == "int8" and job.int8_calib == "p99.9"
    finally:
        manager.shutdown()


def test_engine_factory_varargs_and_partial(tmp_path):
    """Factory arity dispatch binds the longest CALLABLE prefix (round-3
    review: raw parameter counting broke on *args factories and
    functools.partial).  A *args factory receives the full
    (model, scale, dtype, int8_calib, tta); a partial over a 4-arg
    function still binds."""
    import functools

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))

    def _wait(job):
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        return job

    seen = []

    def varargs_factory(*a):
        seen.append(a)
        return FakeEngine()

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(cfg, engine_factory=varargs_factory,
                         io_backend="y4m")
    try:
        job = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   int8_calib="p99.9",
                                   output_path=str(tmp_path / "a.y4m")))
        assert job.status == "done", job.error
        assert seen == [("realesr-animevideov3", 2, "int8", "p99.9",
                         False)]
    finally:
        manager.shutdown()

    def full(extra, m, s, dtype, calib):
        seen.append((extra, dtype, calib))
        return FakeEngine()

    manager = JobManager(cfg,
                         engine_factory=functools.partial(full, "x"),
                         io_backend="y4m")
    try:
        job = _wait(manager.submit(inp, scale=2, dtype="int8",
                                   output_path=str(tmp_path / "b.y4m")))
        assert job.status == "done", job.error
        assert seen[-1] == ("x", "int8", "p99.9")
    finally:
        manager.shutdown()


def test_browse_default_dir_is_jail_root(tokened_server, tmp_path):
    """The UI's entry-point request (no dir param / dir=.) must land at
    the jail root, not 403 on the daemon's cwd being outside the jail
    (round-3 review: the file browser was unusable under --browse-root)."""
    import os

    jail = tmp_path / "jail"
    (jail / "clip.mp4").parent.mkdir(parents=True, exist_ok=True)
    (jail / "clip.mp4").write_bytes(b"x")
    auth = {"Authorization": "Bearer sekrit"}
    for q in ("", "?dir=.", "?dir="):
        code, body = _req(tokened_server + "/api/browse" + q, headers=auth)
        assert code == 200, body
        assert body["dir"] == os.path.realpath(str(jail))
        assert {e["name"] for e in body["entries"]} == {"clip.mp4"}


def test_wildcard_bind_accepts_machine_hostname():
    """Binding 0.0.0.0 means clients address the machine by name/IP —
    the Host allowlist must include the machine's own names (round-3
    review: every request to a wildcard-bound server was refused as
    DNS rebinding), while foreign names stay refused."""
    import socket

    from reve_tpu.service import server as server_mod

    cfg = config_mod.ServiceConfig(segment_size=5)
    manager = JobManager(cfg, engine_factory=lambda m, s: FakeEngine(),
                         io_backend="y4m")
    srv = server_mod.make_server("0.0.0.0", 0, cfg=cfg, manager=manager)
    try:
        allowed = srv.RequestHandlerClass.allowed_hosts
        assert socket.gethostname().lower() in allowed
        assert "localhost" in allowed
        assert "evil.example" not in allowed
    finally:
        srv.server_close()
        manager.shutdown()


def test_resume_restores_io_backend(tmp_path):
    """A workspace started with io_backend=y4m (e.g. by the CLI) and
    resubmitted through a JobManager configured differently must restore
    the SAVED io_backend: part_ext is derived from it, so trusting the
    manager's setting would make repair_pending see zero committed .mp4
    parts and silently redo (and orphan) every finished segment."""
    from reve_tpu.pipeline import state as state_mod
    from reve_tpu.pipeline.planner import plan_segments as plan

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(12):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))
    out = str(tmp_path / "out.y4m")

    ws = state_mod.Workspace(out + ".revework")
    ws.create()
    st = state_mod.JobState(
        input_path=inp, output_path=out, scale=2, segment_size=5,
        frame_count=12, fps_num=24, fps_den=1, width=32, height=24,
        pending=plan(12, 5),
        opts={"dtype": "bfloat16", "io_backend": "y4m"},
    )
    with writer.Y4MWriter(ws.part_tmp_path(0, ".y4m"), 64, 48,
                          fractions.Fraction(24)) as wr:
        for i in range(5):
            up = np.full((24, 32, 3), 30 + i * 10, np.uint8)
            wr.write(np.repeat(np.repeat(up, 2, axis=0), 2, axis=1))
    ws.commit_part(0, ".y4m")
    ws.save(st)

    class CountingEngine(FakeEngine):
        frames_seen = 0

        def submit(self, frames):
            CountingEngine.frames_seen += len(frames)
            return super().submit(frames)

    cfg = config_mod.ServiceConfig(segment_size=5)
    # manager deliberately NOT configured for y4m: the saved opts must win
    manager = JobManager(cfg, engine_factory=lambda m, s: CountingEngine(),
                         io_backend=None)
    try:
        job = manager.submit(inp, 2, output_path=out)
        deadline = time.time() + 60
        while time.time() < deadline and job.status not in ("done", "error"):
            time.sleep(0.1)
        assert job.status == "done", job.error
        assert job.part_ext == ".y4m"
        rd = reader.Y4MReader(out)
        assert rd.frame_count() == 12
        # segment 0's committed part was honored, not redone
        assert CountingEngine.frames_seen < 12
    finally:
        manager.shutdown()


def test_job_refuses_live_foreign_workspace_owner(server, tmp_path):
    """A service job whose output workspace is flock-held by a live
    foreign process (e.g. a CLI run) must error with a clear message
    instead of racing it."""
    import os

    from test_pipeline import _flock_holder
    from reve_tpu.pipeline.state import Workspace

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(4):
            wr.write(np.full((24, 32, 3), 30 + i * 10, np.uint8))
    out = str(tmp_path / "held.y4m")
    ws = Workspace(out + ".revework")
    os.makedirs(ws.root, exist_ok=True)
    child = _flock_holder(ws.owner_path)
    try:
        job = _post(server + "/api/jobs",
                    {"input": inp, "output": out, "scale": 2})
        deadline = time.time() + 30
        while time.time() < deadline:
            j = _get(server + f"/api/jobs/{job['id']}")
            if j["status"] in ("done", "error"):
                break
            time.sleep(0.2)
        assert j["status"] == "error", j
        assert "another live process" in j["error"]
    finally:
        child.kill()
        child.wait()
