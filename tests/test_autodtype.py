"""--dtype auto (certified int8 turbo selection) + sampled calibration.

Round-4 directives (VERDICT r3 #1/#2): the product's default path is the
int8 turbo WHEN on-content certification clears the quality gate, with
automatic bf16 fallback; and calibration/certification measure frames
sampled across the WHOLE video, not whatever batch arrives first — a
video with a cold open and a hot finale must not be certified on the
cold open alone.
"""

import fractions
import os

import numpy as np
import pytest

from reve_tpu import cli
from reve_tpu.io import reader, writer
from reve_tpu.pipeline import scheduler
from reve_tpu.pipeline.engine import UpscaleEngine
from reve_tpu.pipeline.planner import plan_segments
from reve_tpu.pipeline.state import JobState, Workspace


# -- frame sampling ---------------------------------------------------------

def test_sample_frame_indices_properties():
    for n in (1, 2, 7, 16, 17, 1000, 123457):
        idx = scheduler.sample_frame_indices(n)
        assert idx == sorted(set(idx))
        assert all(0 <= i < n for i in idx)
        assert len(idx) == min(n, scheduler.CALIB_SAMPLE_FRAMES)
        if n >= 32:
            # strata actually span the video: something from the first
            # and last tenth
            assert idx[0] < n // 10 and idx[-1] > n - n // 10 - 1
    assert scheduler.sample_frame_indices(0) == []
    # deterministic in frame_count (resume/shard contract)
    assert scheduler.sample_frame_indices(997) == \
        scheduler.sample_frame_indices(997)


def _two_scene_y4m(tmp_path, n=32, h=32, w=48, hot_scale=8):
    """A video whose first half is DIM (low-contrast) and second half is
    HOT (full-range, high-contrast): activation maxima measured on the
    opening frames underestimate the finale by ~hot_scale."""
    path = str(tmp_path / "two_scene.y4m")
    rs = np.random.RandomState(3)
    with writer.Y4MWriter(path, w, h, fractions.Fraction(24)) as wr:
        for i in range(n):
            f = reader.SyntheticReader.frame(i, h, w).astype(np.float32)
            if i < n // 2:
                f = f / hot_scale  # cold open
            else:
                f = np.clip(f + rs.uniform(-40, 40, f.shape), 0, 255)
            wr.write(f.astype(np.uint8))
    return path


def _job_state(inp, out, scale=2, seg=8):
    from reve_tpu.io import probe

    info = probe.probe(inp, backend="y4m")
    pending = plan_segments(info.frame_count, seg)
    return JobState(
        input_path=inp, output_path=out, scale=scale, segment_size=seg,
        frame_count=info.frame_count, fps_num=24, fps_den=1,
        width=info.width, height=info.height, pending=pending,
        plan=list(pending), opts={"dtype": "int8"},
    )


def _shallow_int8_engine():
    """A 2-conv SRVGG: shallow enough that hidden-activation magnitudes
    still track scene brightness (a deep RANDOM-init stack forgets the
    input scale after ~4 layers, hiding the calibration hazard that
    trained weights — which propagate content — exhibit)."""
    from reve_tpu.models import srvgg
    import jax

    cfg = srvgg.SRVGGConfig(num_feat=16, num_conv=2, upscale=2)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    return UpscaleEngine(preloaded=(cfg, params), batch_size=4,
                         compute_dtype="int8")


def test_two_scene_first_batch_miscertifies_sampled_does_not(tmp_path):
    """THE round-4 done-bar test (VERDICT r3 #2): on a cold-open/
    hot-finale video, first-batch calibration certifies a PSNR the hot
    scenes do not live up to (the finale actually lands BELOW the 50 dB
    gate); sampled calibration sees the finale, fixes the scales, and
    certifies honestly."""
    inp = _two_scene_y4m(tmp_path)
    st = _job_state(inp, str(tmp_path / "o.y4m"))
    with reader.open_reader(inp, backend="y4m") as rd:
        frames = np.stack(list(rd.read_range(0, st.frame_count)))
    first = frames[:4]
    hot = frames[-4:]

    # legacy behavior: calibrate AND certify on the first batch only
    e_first = _shallow_int8_engine()
    cert_first = e_first.certify_int8(first)      # calibrates on `first`
    hot_truth = e_first.certify_int8(hot)         # same scales, hot scene
    # the mis-certification this round exists to close: the cold-open
    # certificate clears the 50 dB gate while the finale actually fails it
    assert cert_first > 50.0 > hot_truth, (cert_first, hot_truth)

    # sampled path: calibration + certification over whole-video strata
    ws = Workspace(str(tmp_path / "ws"))
    ws.create()
    e_sampled = _shallow_int8_engine()
    db_sampled = scheduler.certify_int8_on_input(
        e_sampled, ws, st, io_backend="y4m")
    # the sampled CALIBRATION saw the finale: its scales rescue the hot
    # scenes above the gate, and the sampled certificate is honest about
    # the whole video
    hot_sampled = e_sampled.certify_int8(hot)
    assert hot_sampled > 50.0, (hot_sampled, hot_truth)
    assert hot_sampled > hot_truth + 10.0
    assert db_sampled > 50.0  # honest pass (all strata measured)
    # the chosen sample indices are persisted for resume determinism
    assert st.opts["calib_frames"] == \
        scheduler.sample_frame_indices(st.frame_count)


@pytest.mark.slow
def test_certify_uses_persisted_indices(tmp_path):
    """A state that already carries calib_frames (resume) measures on
    exactly those frames, not a recomputed set."""
    inp = _two_scene_y4m(tmp_path, n=16)
    st = _job_state(inp, str(tmp_path / "o.y4m"))
    st.opts["calib_frames"] = [0, 1, 2, 3]  # cold open only, on purpose
    ws = Workspace(str(tmp_path / "ws"))
    ws.create()
    e = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    db_pinned = scheduler.certify_int8_on_input(e, ws, st, io_backend="y4m")
    e2 = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    with reader.open_reader(inp, backend="y4m") as rd:
        first = np.stack(list(rd.read_range(0, 4)))
    assert db_pinned == pytest.approx(e2.certify_int8(first), abs=1e-4)


# -- resolve_auto_dtype -----------------------------------------------------

def _mk_ws_state(tmp_path, name="v"):
    inp = _two_scene_y4m(tmp_path, n=16)
    st = _job_state(inp, str(tmp_path / f"{name}.y4m"))
    st.opts = {"int8_calib": "p99.9"}
    ws = Workspace(str(tmp_path / f"{name}.ws"))
    ws.create()
    return ws, st


def _engine_factory(dtype, calib):
    return UpscaleEngine(scale=2, batch_size=4, compute_dtype=dtype,
                         int8_calib=calib)


def test_auto_dtype_ineligible_off_tpu(tmp_path, monkeypatch):
    monkeypatch.delenv("REVE_TPU_AUTO_INT8", raising=False)
    ws, st = _mk_ws_state(tmp_path)
    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m")
    assert (dtype, engine, db) == ("bfloat16", None, None)
    assert "TPU-only" in notes[0]


@pytest.mark.slow
def test_auto_dtype_selects_int8_when_certified(tmp_path, monkeypatch):
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    ws, st = _mk_ws_state(tmp_path)
    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m", gate_db=5.0)
    assert dtype == "int8" and engine is not None and db >= 5.0
    assert "certified" in notes[0]
    # the returned engine is the calibrated trial engine, reusable as-is
    assert engine.get_calibration() is not None
    # and the job's calibration is already persisted first-wins
    assert ws.load_calibration() is not None


@pytest.mark.slow
def test_auto_dtype_falls_back_below_gate(tmp_path, monkeypatch):
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    ws, st = _mk_ws_state(tmp_path)
    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m", gate_db=200.0)
    assert (dtype, engine) == ("bfloat16", None)
    assert db is not None and db < 200.0
    assert "below the 200 dB gate" in notes[0]


def test_auto_dtype_falls_back_on_non_srvgg(tmp_path, monkeypatch):
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    ws, st = _mk_ws_state(tmp_path)

    def rrdb_factory(dtype, calib):
        return UpscaleEngine(model="realesrgan-x4plus", scale=4,
                             compute_dtype=dtype, int8_calib=calib)

    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        rrdb_factory, ws, st, io_backend="y4m")
    assert (dtype, engine, db) == ("bfloat16", None, None)
    # RRDB has an int8 path since round-4 session 3, but auto never picks
    # it (opt-in via --dtype int8; see resolve_auto_dtype)
    assert "opt-in" in notes[0]


def test_auto_dtype_fails_safe_on_cert_error(tmp_path, monkeypatch):
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    import dataclasses

    ws, st = _mk_ws_state(tmp_path)
    st = dataclasses.replace(st, input_path="/nonexistent.y4m")
    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m")
    assert (dtype, engine, db) == ("bfloat16", None, None)
    assert "certification failed" in notes[0]


# -- CLI surface ------------------------------------------------------------

def _small_y4m(tmp_path, frames=10, w=24, h=16):
    path = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(path, w, h, fractions.Fraction(24)) as wr:
        for i in range(frames):
            wr.write(reader.SyntheticReader.frame(i, h, w))
    return path


@pytest.mark.slow
def test_cli_auto_selects_int8_and_reports(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "auto_out.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3", "--int8-gate", "5"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "auto dtype: int8 turbo (certified" in err
    assert "path: int8 turbo" in err
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (48, 32, 10)


def test_cli_auto_falls_back_and_still_succeeds(tmp_path, monkeypatch,
                                                capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "fb_out.y4m")
    # an unclearable gate: auto must FALL BACK to bf16 and run, not abort
    # (only explicit --dtype int8 + gate refuses)
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3", "--int8-gate", "200"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "auto dtype: bfloat16" in err and "below the 200 dB gate" in err
    assert "path: bfloat16" in err
    assert os.path.exists(out)


@pytest.mark.slow
def test_cli_auto_resolved_dtype_persists_across_resume(tmp_path,
                                                        monkeypatch,
                                                        capsys):
    """The RESOLVED dtype (not 'auto') is saved in the workspace, and a
    resume restores it — committed int8 segments are never continued in
    bf16."""
    from reve_tpu.pipeline import scheduler as sched_mod

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "res_out.y4m")

    real_run = sched_mod.PipelineJob.run

    def crash(self):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    with pytest.raises(RuntimeError):
        cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                 "y4m", "-S", "4", "--batch", "3", "--int8-gate", "5"])
    st = Workspace(out + ".revework").load()
    assert st.opts["dtype"] == "int8"          # resolved, not "auto"
    assert st.opts["calib_frames"]             # sampling persisted

    monkeypatch.setattr(sched_mod.PipelineJob, "run", real_run)
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "continuing on the saved --dtype='int8' path" in err


def test_cli_auto_off_tpu_is_bf16(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("REVE_TPU_AUTO_INT8", raising=False)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "cpu_out.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "auto dtype: bfloat16" in err and "TPU-only" in err


def test_certify_and_calibrate_pad_to_mesh_dp(tmp_path):
    """Certification/calibration batches (16 sampled frames, or fewer on
    short clips) are padded to a dp multiple before device_put: a dp=3
    mesh must not crash — or worse, silently lose the auto turbo to a
    'certification failed' fallback — just because dp does not divide the
    sample count (round-4 review fix)."""
    import jax

    from reve_tpu.models import srvgg
    from reve_tpu.parallel import mesh as mesh_lib

    cfg = srvgg.SRVGGConfig(num_feat=16, num_conv=2, upscale=2)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(jax.devices()[:3], max_sp=1)  # dp=3
    kw = dict(preloaded=(cfg, params), compute_dtype="int8",
              int8_calib="max")
    e_mesh = UpscaleEngine(mesh=mesh, batch_size=3, **kw)
    e_one = UpscaleEngine(batch_size=4, **kw)
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 256, (16, 16, 24, 3), np.uint8)  # 16 % 3 != 0
    db_mesh = e_mesh.certify_int8(frames)
    db_one = e_one.certify_int8(frames)
    assert np.isfinite(db_mesh)
    # 'max' maxima are invariant to the cyclic pad duplicates, so the two
    # engines quantize identically; the certificate agrees to reduction-
    # order noise and the pad frames are excluded from the PSNR mean
    assert db_mesh == pytest.approx(db_one, abs=1e-3)
    np.testing.assert_allclose(e_mesh.get_calibration(),
                               e_one.get_calibration(), rtol=1e-6)
    # short clip too: 2 frames on dp=3 pads UP past the frame count
    db_short = e_mesh.certify_int8(frames[:2])
    assert np.isfinite(db_short)


@pytest.mark.slow
def test_cli_resume_saved_auto_accepts_gate(tmp_path, monkeypatch, capsys):
    """A job interrupted DURING auto resolution leaves opts['dtype']='auto'
    in the workspace; re-running the identical command (including
    --int8-gate) must resume and resolve, not refuse with exit 2
    (round-4 review fix — the gate check now exempts the unresolved
    'auto')."""
    from reve_tpu.pipeline import scheduler as sched_mod

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "ar.y4m")

    real = sched_mod.resolve_auto_dtype

    def boom(*a, **k):
        raise RuntimeError("simulated crash during certification")

    monkeypatch.setattr(sched_mod, "resolve_auto_dtype", boom)
    with pytest.raises(RuntimeError):
        cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                 "y4m", "-S", "4", "--batch", "3", "--int8-gate", "5"])
    st = Workspace(out + ".revework").load()
    assert st.opts["dtype"] == "auto"  # interrupted before resolution

    monkeypatch.setattr(sched_mod, "resolve_auto_dtype", real)
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3", "--int8-gate", "5"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "auto dtype:" in err


def test_cli_image_mode_rejects_int8_calib_under_auto(tmp_path, monkeypatch,
                                                      capsys):
    """Image modes resolve auto to the exact path, so an explicit
    --int8-calib would configure nothing — refuse instead of silently
    ignoring a quality option (round-4 review fix)."""
    import cv2

    monkeypatch.chdir(tmp_path)
    img = str(tmp_path / "in.png")
    cv2.imwrite(img, np.zeros((8, 8, 3), np.uint8))
    rc = cli.run(["-i", img, "-s", "2", str(tmp_path / "out.png"),
                  "--yes", "--int8-calib", "max"])
    assert rc == 2
    assert "--int8-calib has no effect in image mode" in \
        capsys.readouterr().err


def test_cli_int8_calib_requires_turbo_path(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "x.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--dtype",
                  "bfloat16", "--int8-calib", "p99.9", "--io-backend",
                  "y4m"])
    assert rc == 2
    assert "--int8-calib requires" in capsys.readouterr().err
    # but it is fine with auto (configures the candidate turbo path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--int8-calib",
                  "max", "--int8-gate", "5", "--io-backend", "y4m",
                  "-S", "4", "--batch", "3"])
    assert rc == 0


# -- first-wins arbitration across workers/resumes ----------------------------
# (round-4 review findings: the resolved dtype and the measured certificate
# are claimed through the workspace like the quantization scales — shard
# workers racing a fresh workspace, resumes, and heterogeneous fleets all
# follow ONE decision, and re-certification never re-decodes the input.)

def test_auto_dtype_resolution_first_wins(tmp_path, monkeypatch):
    """A claimed resolution binds every later resolver: worker B follows
    worker A's decision even when B's own policy (gate-edge noise, a
    different gate, per-worker errors) would differ — one output must
    never mix int8- and bf16-upscaled segments."""
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    ws, st = _mk_ws_state(tmp_path)
    dtype_a, eng_a, db_a, _ = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m", gate_db=5.0)
    assert dtype_a == "int8"
    # worker B's own (absurd) gate would say bf16 — but it inherits A
    dtype_b, eng_b, db_b, notes_b = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m", gate_db=200.0)
    assert dtype_b == "int8" and eng_b is not None
    assert db_b == pytest.approx(db_a)
    assert "inherited" in notes_b[0]
    # B's engine carries A's persisted scales (never recalibrated)
    np.testing.assert_allclose(np.asarray(eng_b.get_calibration()),
                               np.asarray(eng_a.get_calibration()))


def test_auto_dtype_ineligible_claims_for_whole_job(tmp_path, monkeypatch):
    """An off-TPU bf16 resolution CLAIMS the decision: a later worker on
    eligible hardware (heterogeneous fleet / resumed elsewhere) must not
    flip the job to int8 mid-output."""
    monkeypatch.delenv("REVE_TPU_AUTO_INT8", raising=False)
    ws, st = _mk_ws_state(tmp_path)
    dtype, _, _, _ = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m")
    assert dtype == "bfloat16"
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    dtype2, eng2, _, notes2 = scheduler.resolve_auto_dtype(
        _engine_factory, ws, st, io_backend="y4m", gate_db=0.0)
    assert (dtype2, eng2) == ("bfloat16", None)
    assert "inherited" in notes2[0]


def test_certificate_reused_without_redecoding(tmp_path, monkeypatch):
    """Resume/shard re-certification returns the persisted certificate
    without re-reading the video (the sampled strata span ~the whole
    input, so a re-measurement is a near-full sequential decode)."""
    ws, st = _mk_ws_state(tmp_path)
    e = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    db1 = scheduler.certify_int8_on_input(e, ws, st, io_backend="y4m")
    assert db1 is not None
    assert ws.load_int8_cert() == pytest.approx(db1)

    def boom(*a, **k):
        raise AssertionError("re-certification decoded the input")

    monkeypatch.setattr(scheduler, "read_sampled_frames", boom)
    e2 = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    db2 = scheduler.certify_int8_on_input(e2, ws, st, io_backend="y4m")
    assert db2 == pytest.approx(db1)


def test_auto_int8_env_falsy_strings_disable(tmp_path, monkeypatch):
    """REVE_TPU_AUTO_INT8=false/no/off/0 (any case) must DISABLE
    eligibility — an operator turning the turbo OFF must not force it
    on."""
    for v in ("false", "no", "OFF", "0", "False"):
        ws, st = _mk_ws_state(tmp_path, name=f"v{v}")
        monkeypatch.setenv("REVE_TPU_AUTO_INT8", v)
        dtype, engine, db, notes = scheduler.resolve_auto_dtype(
            _engine_factory, ws, st, io_backend="y4m")
        assert (dtype, engine, db) == ("bfloat16", None, None), v
        assert "TPU-only" in notes[0]


# -- resolution visibility (round-4 VERDICT #6) + inherit audit (ADVICE #1)

def test_auto_resolution_visibility(tmp_path, monkeypatch, capsys):
    """The auto-resolution pre-pass must be visible: a note BEFORE the
    certification starts, an `auto_resolve` trace span with a duration,
    and the resolution wall time in the done-line accounting."""
    import json

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REVE_TPU_AUTO_INT8", "1")
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "vis_out.y4m")
    trace_path = str(tmp_path / "trace.jsonl")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "-S", "4", "--batch", "3", "--int8-gate", "5",
                  "--trace", trace_path])
    assert rc == 0
    err = capsys.readouterr().err
    # the "this is running" note precedes the decision note
    i_pre = err.index("certifying int8 turbo vs f32 on")
    i_dec = err.index("auto dtype: int8 turbo (certified")
    assert i_pre < i_dec
    assert "resolved in" in err          # decision note carries wall time
    assert ", auto-resolve " in err      # done-line accounting
    recs = [json.loads(line) for line in open(trace_path)]
    spans = [r for r in recs if r["ev"] == "auto_resolve"]
    assert spans and spans[0]["dur"] >= 0 and spans[0]["frames"] > 0


def test_inherited_cert_still_records_calib_frames(tmp_path):
    """Round-4 ADVICE #1: a worker that INHERITS a persisted certificate
    (resume with a state whose opts were not carried over) still
    populates state.opts['calib_frames'], so the audit contract and the
    'on N sampled frame(s)' reporting hold on the inherit path."""
    ws, st = _mk_ws_state(tmp_path)
    e = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    db1 = scheduler.certify_int8_on_input(e, ws, st, io_backend="y4m")
    assert db1 is not None

    st2 = _job_state(st.input_path, st.output_path)
    st2.opts = {"int8_calib": "p99.9"}  # fresh view: no calib_frames
    e2 = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    db2 = scheduler.certify_int8_on_input(e2, ws, st2, io_backend="y4m")
    assert db2 == pytest.approx(db1)
    assert st2.opts["calib_frames"] == \
        scheduler.sample_frame_indices(st2.frame_count)
