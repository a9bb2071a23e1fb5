"""int8 turbo mode: quantization math, model parity, engine integration.

The hidden stack is quantized (weights/quantize.py, srvgg.apply_int8);
first/last conv + epilogue stay float.  These tests pin the scheme's
invariants on CPU; throughput claims live in PERF.md (TPU-measured).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg
from reve_tpu.pipeline.engine import UpscaleEngine
from reve_tpu.weights import quantize


@pytest.fixture(scope="module")
def small():
    cfg = srvgg.SRVGGConfig(num_feat=16, num_conv=4, upscale=2)
    params = srvgg.init_params(jax.random.key(0), cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 17, 24, 3).astype(np.float32))  # odd H
    return cfg, params, x


def test_weight_quantization_per_channel(small):
    cfg, params, x = small
    maxima = quantize.collect_act_maxima(params, x, cfg=cfg)
    assert maxima.shape == (cfg.num_conv + 1,)
    qb = quantize.quantize_hidden(params, cfg, maxima)
    for i in range(cfg.num_conv):
        w = np.asarray(params["convs"][i + 1]["w"])
        q = np.asarray(qb.w8[i])
        s = np.asarray(qb.sw[i])
        assert q.dtype == np.int8 and q.min() >= -127
        # per-output-channel reconstruction error bounded by scale/2
        err = np.abs(q.astype(np.float32) * s - w)
        assert (err <= s / 2 + 1e-7).all()
        # every channel uses most of the int8 range (symmetric max scaling)
        assert np.abs(q).max(axis=(0, 1, 2)).min() == 127
    # head conv quantized too
    assert np.asarray(qb.w8_last).dtype == np.int8
    assert qb.w8_last.shape == (3, 3, cfg.num_feat,
                                cfg.num_out_ch * cfg.upscale ** 2)


def test_act_maxima_shape_validation(small):
    cfg, params, _ = small
    with pytest.raises(ValueError, match="act_maxima"):
        quantize.quantize_hidden(params, cfg, np.ones(3))


def test_apply_int8_close_to_f32_and_s2d_classic_agree(small):
    cfg, params, x = small
    qb = quantize.quantize_hidden(
        params, cfg, quantize.collect_act_maxima(params, x, cfg=cfg))
    ref = np.asarray(srvgg.apply(params, x, cfg=cfg,
                                 compute_dtype=jnp.float32))
    outs = {}
    for s2d in (True, False):
        got = np.asarray(srvgg.apply_int8(params, qb, x, cfg=cfg,
                                          compute_dtype=jnp.float32,
                                          s2d=s2d))
        mse = float(np.mean((ref - got) ** 2))
        psnr = 10 * np.log10(1.0 / mse)
        assert psnr > 45.0, f"s2d={s2d}: {psnr:.1f} dB"
        outs[s2d] = got
    # hidden convs are exact integer math; only float first/last differ
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-6)


@pytest.mark.slow
def test_engine_int8_end_to_end_and_tiled_exact():
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 256, (3, 33, 40, 3), np.uint8)
    e8 = UpscaleEngine(scale=2, batch_size=3, compute_dtype="int8")
    ef = UpscaleEngine(scale=2, batch_size=3, compute_dtype="float32")
    o8 = e8.upscale_frames(frames)
    of = ef.upscale_frames(frames)
    assert o8.shape == of.shape == (3, 66, 80, 3)
    mse = np.mean((o8.astype(np.float64) - of.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 45.0
    # tiled int8 is bit-exact vs whole-frame int8 (same function per tile)
    et = UpscaleEngine(scale=2, batch_size=3, compute_dtype="int8", tile=16)
    np.testing.assert_array_equal(et.upscale_frames(frames), o8)


def test_engine_int8_warmup_recalibrates_on_real_frames():
    rs = np.random.RandomState(2)
    frames = rs.randint(0, 256, (2, 16, 20, 3), np.uint8)
    e = UpscaleEngine(scale=2, batch_size=2, compute_dtype="int8")
    e.warmup(16, 20)
    assert e._qbody_provisional  # dummy calibration
    out = e.upscale_frames(frames)
    assert not e._qbody_provisional  # replaced by real-batch calibration
    ref = UpscaleEngine(scale=2, batch_size=2,
                        compute_dtype="int8").upscale_frames(frames)
    np.testing.assert_array_equal(out, ref)


# -- RRDB int8 (round-4 extension: every model family has a turbo path) ------


@pytest.fixture(scope="module")
def small_rrdb():
    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8,
                          upscale=4)
    params = rrdb.init_params(jax.random.key(0), cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 18, 24, 3).astype(np.float32))
    return cfg, params, x


def test_rrdb_quantization_layout(small_rrdb):
    """Stats count = num_block * 15 + 1; per-part activation scales are
    folded into int8 kernels quantized per output channel."""
    from reve_tpu.models import rrdb

    cfg, params, x = small_rrdb
    maxima = quantize.collect_act_maxima_rrdb(params, x, cfg=cfg)
    assert maxima.shape == (quantize.rrdb_num_stats(cfg),) == (31,)
    qb = quantize.quantize_rrdb(params, cfg, maxima)
    assert np.asarray(qb["act_scale"]).shape == (31,)
    rdb0 = qb["body"][0][0]
    for i in range(5):
        q = np.asarray(rdb0["w8"][i])
        assert q.dtype == np.int8 and q.min() >= -127
        cin = cfg.num_feat + i * cfg.num_grow_ch
        cout = cfg.num_grow_ch if i < 4 else cfg.num_feat
        assert q.shape == (3, 3, cin, cout)
        # symmetric per-out-channel max scaling saturates every channel
        assert np.abs(q).max(axis=(0, 1, 2)).min() == 127
    assert np.asarray(qb["conv_body"]["w8"]).dtype == np.int8
    with pytest.raises(ValueError, match="act_maxima"):
        quantize.quantize_rrdb(params, cfg, np.ones(7))


def test_rrdb_apply_int8_close_to_f32_and_s2d_classic_agree(small_rrdb):
    from reve_tpu.models import rrdb

    cfg, params, x = small_rrdb
    qb = quantize.quantize_rrdb(
        params, cfg, quantize.collect_act_maxima_rrdb(params, x, cfg=cfg))
    ref = np.asarray(rrdb.apply(params, x, cfg=cfg,
                                compute_dtype=jnp.float32))
    outs = {}
    for s2d in (True, False):
        got = np.asarray(rrdb.apply_int8(params, qb, x, cfg=cfg,
                                         compute_dtype=jnp.float32,
                                         s2d=s2d))
        assert got.shape == ref.shape
        mse = float(np.mean((ref - got) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 45.0, f"s2d={s2d}: {psnr:.1f} dB"
        outs[s2d] = got
    # trunk convs are exact integer math in both domains; only the float
    # conv_first / head convs can differ (reduction order)
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5)


@pytest.mark.slow
def test_engine_int8_rrdb_end_to_end_certify_and_persistence(tmp_path):
    """The full engine contract SRVGG's turbo mode has, on RRDB: close to
    f32, certifiable, and calibration scales persist/inject verbatim."""
    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8,
                          upscale=4)
    params = rrdb.init_params(jax.random.key(1), cfg)
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 256, (2, 18, 24, 3), np.uint8)
    e8 = UpscaleEngine(scale=4, batch_size=2, compute_dtype="int8",
                       preloaded=(cfg, params))
    ef = UpscaleEngine(scale=4, batch_size=2, compute_dtype="float32",
                       preloaded=(cfg, params))
    o8 = e8.upscale_frames(frames)
    of = ef.upscale_frames(frames)
    assert o8.shape == of.shape == (2, 72, 96, 3)
    mse = np.mean((o8.astype(np.float64) - of.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 45.0
    db = e8.certify_int8(frames)
    assert db > 45.0
    cal = e8.get_calibration()
    assert cal is not None and len(cal) == 31
    # injected scales reproduce the output byte-for-byte (resume contract)
    e2 = UpscaleEngine(scale=4, batch_size=2, compute_dtype="int8",
                       preloaded=(cfg, params))
    e2.set_calibration(cal)
    np.testing.assert_array_equal(e2.upscale_frames(frames), o8)


def test_auto_dtype_rrdb_stays_exact(tmp_path):
    """Auto mode never turns RRDB jobs int8 (the turbo path is opt-in for
    this family): the resolver decides bfloat16 with an explanatory note
    even on an eligible TPU-like platform."""
    from reve_tpu.models import rrdb
    from reve_tpu.pipeline import scheduler, state as state_mod
    from reve_tpu.pipeline.planner import plan_segments

    cfg = rrdb.RRDBConfig(num_feat=16, num_block=1, num_grow_ch=8,
                          upscale=4)
    params = rrdb.init_params(jax.random.key(0), cfg)

    def make_engine(dtype, calib):
        return UpscaleEngine(scale=4, batch_size=2, compute_dtype=dtype,
                             int8_calib=calib, preloaded=(cfg, params))

    ws = state_mod.Workspace(str(tmp_path / "ws"))
    ws.create()
    st = state_mod.JobState(
        input_path="unused.y4m", output_path=str(tmp_path / "o.y4m"),
        scale=4, segment_size=8, frame_count=8, fps_num=24, fps_den=1,
        width=24, height=18, pending=plan_segments(8, 8),
    )
    dtype, engine, db, notes = scheduler.resolve_auto_dtype(
        make_engine, ws, st, platform="tpu")
    assert dtype == "bfloat16" and engine is None and db is None
    assert any("opt-in" in n for n in notes)


@pytest.mark.slow
def test_engine_int8_percentile_calibration():
    """int8_calib="p99.9" (the frontier's best single lever, PERF.md)
    yields tighter scales than max-calibration, still-close output, and
    the persisted-scales contract is statistic-agnostic."""
    rs = np.random.RandomState(7)
    frames = rs.randint(0, 256, (3, 33, 40, 3), np.uint8)
    ep = UpscaleEngine(scale=2, batch_size=3, compute_dtype="int8")
    assert ep.int8_calib == "p99.9"  # the default (best on both frontier
    # seeds, PERF.md int8 frontier; flipped from max in round 4)
    em = UpscaleEngine(scale=2, batch_size=3, compute_dtype="int8",
                       int8_calib="max")
    op = ep.upscale_frames(frames)
    om = em.upscale_frames(frames)
    # a percentile stat can never exceed the true max, and on random
    # frames the tail clip must actually bite somewhere
    assert np.all(ep.get_calibration() <= em.get_calibration() + 1e-6)
    assert np.any(ep.get_calibration() < em.get_calibration() * 0.999)
    ef = UpscaleEngine(scale=2, batch_size=3, compute_dtype="float32")
    of = ef.upscale_frames(frames)
    for o in (op, om):
        mse = np.mean((o.astype(np.float64) - of.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / mse) > 45.0
    # injected scales are used verbatim regardless of the engine's own
    # calibration statistic (resume/shard determinism contract)
    e2 = UpscaleEngine(scale=2, batch_size=3, compute_dtype="int8",
                       int8_calib="p99.9")
    e2.set_calibration(em.get_calibration())
    np.testing.assert_array_equal(e2.upscale_frames(frames), om)


def test_engine_int8_calib_validation():
    for bad in ("p", "q99", "p0", "p101", "pxyz"):
        with pytest.raises(ValueError):
            UpscaleEngine(scale=2, compute_dtype="int8", int8_calib=bad)


def test_apply_int8_float_head_variant(small):
    """int8_head=False runs the head conv in float: output is at least as
    close to f32 as the all-int8 path (the head feeds the pixel shuffle
    directly), and s2d/classic still agree."""
    cfg, params, x = small
    qb = quantize.quantize_hidden(
        params, cfg, quantize.collect_act_maxima(params, x, cfg=cfg))
    ref = np.asarray(srvgg.apply(params, x, cfg=cfg,
                                 compute_dtype=jnp.float32))

    def psnr(a):
        return 10 * np.log10(1.0 / max(np.mean((ref - a) ** 2), 1e-12))

    outs = {}
    for s2d in (True, False):
        got = np.asarray(srvgg.apply_int8(params, qb, x, cfg=cfg,
                                          compute_dtype=jnp.float32,
                                          s2d=s2d, int8_head=False))
        outs[s2d] = got
        assert psnr(got) > 45.0
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-6)
    full8 = np.asarray(srvgg.apply_int8(params, qb, x, cfg=cfg,
                                        compute_dtype=jnp.float32))
    assert psnr(outs[True]) >= psnr(full8) - 0.5  # head-f32 never worse


@pytest.mark.slow
def test_cli_int8_gate_refuses_and_reports(tmp_path, monkeypatch, capsys):
    """--dtype int8 always reports the measured quantization PSNR; an
    unmeetable --int8-gate refuses with exit 3 and leaves no resume
    droppings; a meetable gate proceeds."""
    import fractions

    from reve_tpu import cli
    from reve_tpu.io import writer

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    out = str(tmp_path / "o.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "--dtype", "int8", "--batch", "3", "--int8-gate", "200"])
    err = capsys.readouterr().err
    assert rc == 3
    assert "int8 turbo:" in err and "refusing" in err
    assert not os.path.exists(out + ".revework")  # no resume droppings

    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "--dtype", "int8", "--batch", "3", "--int8-gate", "30"])
    err = capsys.readouterr().err
    assert rc == 0 and "int8 turbo:" in err
    assert os.path.exists(out)


def test_cli_int8_gate_fails_closed(tmp_path, monkeypatch, capsys):
    """If certification itself errors while --int8-gate is set, the run
    must refuse (exit 3), not silently proceed past the user's explicit
    quality threshold; without a gate, the error downgrades to a skip."""
    import fractions

    from reve_tpu import cli
    from reve_tpu.io import writer
    from reve_tpu.pipeline import engine as engine_mod

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    out = str(tmp_path / "o.y4m")

    def boom(self, frames):
        raise RuntimeError("synthetic certifier failure")

    monkeypatch.setattr(engine_mod.UpscaleEngine, "certify_int8", boom)
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "--dtype", "int8", "--batch", "3", "--int8-gate", "50"])
    err = capsys.readouterr().err
    assert rc == 3 and "refusing" in err and "certification failed" in err
    assert not os.path.exists(out)

    # no gate -> certification failure is reported but non-fatal
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "--dtype", "int8", "--batch", "3"])
    err = capsys.readouterr().err
    assert rc == 0 and "certification skipped" in err
    assert os.path.exists(out)


# -- calibration determinism across resume / shard workers ------------------


def _varied_y4m(tmp_path, num_frames=24, w=32, h=24):
    """Input whose brightness RAMPS across frames: an engine calibrating on
    segment k sees different activation maxima than one calibrating on
    segment j, so any un-persisted recalibration changes output bytes."""
    import fractions

    from reve_tpu.io import writer

    path = str(tmp_path / "ramp.y4m")
    rs = np.random.RandomState(7)
    with writer.Y4MWriter(path, w, h, fractions.Fraction(24)) as wr:
        for i in range(num_frames):
            base = 10 * (i + 1)
            wr.write((rs.rand(h, w, 3) * base).astype(np.uint8))
    return path


def _int8_state(tmp_path, inp, name, num_frames=24, seg=8, w=32, h=24):
    from reve_tpu.pipeline import planner, state

    ws = state.Workspace(str(tmp_path / f"work_{name}"))
    ws.create()
    st = state.JobState(
        input_path=inp, output_path=str(tmp_path / f"{name}.y4m"),
        scale=2, segment_size=seg, frame_count=num_frames,
        fps_num=24, fps_den=1, width=w, height=h,
        pending=planner.plan_segments(num_frames, seg),
    )
    ws.save(st)
    return ws, st


def _run_job(st, ws, engine):
    from reve_tpu.pipeline import scheduler

    job = scheduler.PipelineJob(st, ws, engine, io_backend="y4m",
                                part_ext=".y4m")
    final = job.run()
    scheduler.finalize(final, ws, io_backend="y4m", part_ext=".y4m")


@pytest.mark.slow
def test_int8_crash_resume_byte_identical(tmp_path):
    """An int8 job killed mid-run and resumed must produce output
    byte-identical to an uninterrupted run: the first calibration is
    persisted in the workspace and the resumed engine reuses it instead
    of recalibrating on its first PENDING segment (whose frames differ)."""
    from reve_tpu.pipeline import scheduler, state

    inp = _varied_y4m(tmp_path)

    # reference: uninterrupted run
    ws_a, st_a = _int8_state(tmp_path, inp, "a")
    e_a = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    _run_job(st_a, ws_a, e_a)
    with open(st_a.output_path, "rb") as f:
        want = f.read()

    # crashed run: engine fault after segment 0 commits
    ws_b, st_b = _int8_state(tmp_path, inp, "b")
    e_crash = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    real_submit, count = e_crash.submit, [0]

    def faulty_submit(frames):
        count[0] += 1
        if count[0] > 3:  # seg 0 = 8 frames = 2 batches; die in seg 1
            raise RuntimeError("injected crash")
        return real_submit(frames)

    e_crash.submit = faulty_submit
    job = scheduler.PipelineJob(st_b, ws_b, e_crash, io_backend="y4m",
                                part_ext=".y4m")
    with pytest.raises(RuntimeError, match="injected"):
        job.run()
    assert 0 in ws_b.completed_parts(".y4m")
    assert ws_b.load_calibration() is not None  # persisted before the crash

    # resume with a FRESH engine (new process semantics)
    st_b2 = state.repair_pending(ws_b.load(), ws_b, ext=".y4m")
    e_resume = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    _run_job(st_b2, ws_b, e_resume)
    np.testing.assert_array_equal(e_resume.get_calibration(),
                                  e_a.get_calibration())
    with open(st_b.output_path, "rb") as f:
        assert f.read() == want


@pytest.mark.slow
def test_int8_shard_workers_share_calibration(tmp_path):
    """Every shard worker of one job must quantize with the SAME scales:
    the first worker's calibration is claimed into the shared workspace
    and later workers adopt it (first-wins), so one output video never
    mixes differently-quantized segments — and the result is byte-equal
    to a single-worker run."""
    import dataclasses

    from reve_tpu.pipeline import scheduler

    inp = _varied_y4m(tmp_path)

    ws_a, st_a = _int8_state(tmp_path, inp, "solo")
    e_solo = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    _run_job(st_a, ws_a, e_solo)
    with open(st_a.output_path, "rb") as f:
        want = f.read()

    # "worker 1" processes segment 0, then a separate engine ("worker 2",
    # fresh process semantics) processes segments 1-2 of the same job
    ws_b, st_b = _int8_state(tmp_path, inp, "shard")
    e1 = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    e2 = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    job1 = scheduler.PipelineJob(
        dataclasses.replace(st_b, pending=st_b.pending[:1]), ws_b, e1,
        io_backend="y4m", part_ext=".y4m")
    job1.run()
    job2 = scheduler.PipelineJob(
        dataclasses.replace(st_b, pending=st_b.pending[1:]), ws_b, e2,
        io_backend="y4m", part_ext=".y4m")
    job2.run()
    np.testing.assert_array_equal(e1.get_calibration(), e2.get_calibration())
    scheduler.finalize(dataclasses.replace(st_b, pending=[]), ws_b,
                       io_backend="y4m", part_ext=".y4m")
    with open(st_b.output_path, "rb") as f:
        assert f.read() == want


@pytest.mark.slow
def test_int8_engine_reuse_recalibrates_per_job(tmp_path):
    """An engine cached across service jobs must NOT carry job A's
    activation scales into job B (a hotter video would clip beyond the
    margin with no recovery): with no persisted calibration in B's
    workspace, stale scales are dropped and B recalibrates on its own
    first batch."""
    import fractions

    from reve_tpu.io import writer

    dark = str(tmp_path / "dark.y4m")
    with writer.Y4MWriter(dark, 32, 24, fractions.Fraction(24)) as wr:
        for _ in range(8):
            wr.write(np.full((24, 32, 3), 16, np.uint8))
    bright = str(tmp_path / "bright.y4m")
    with writer.Y4MWriter(bright, 32, 24, fractions.Fraction(24)) as wr:
        for _ in range(8):
            wr.write(np.full((24, 32, 3), 235, np.uint8))

    engine = UpscaleEngine(scale=2, batch_size=4, compute_dtype="int8")
    ws_a, st_a = _int8_state(tmp_path, dark, "dark", num_frames=8)
    _run_job(st_a, ws_a, engine)
    scales_a = np.array(engine.get_calibration())

    ws_b, st_b = _int8_state(tmp_path, bright, "bright", num_frames=8)
    _run_job(st_b, ws_b, engine)
    scales_b = np.array(engine.get_calibration())
    # brighter input -> larger early-layer activation maxima (deep layers
    # converge regardless of input level, so only the head is decisive)
    assert scales_b[0] > scales_a[0] * 2, (scales_a, scales_b)
    assert not np.array_equal(scales_a, scales_b)


@pytest.mark.slow
def test_engine_int8_sharded_matches_single_device():
    from reve_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(jax.devices(), max_sp=1)
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 256, (8, 16, 24, 3), np.uint8)
    em = UpscaleEngine(scale=2, batch_size=8, compute_dtype="int8",
                       mesh=mesh)
    es = UpscaleEngine(scale=2, batch_size=8, compute_dtype="int8")
    np.testing.assert_array_equal(em.upscale_frames(frames),
                                  es.upscale_frames(frames))


def test_cli_resume_refuses_dropped_int8_gate(tmp_path, monkeypatch,
                                              capsys):
    """Resume restores the SAVED dtype; if that drops int8 while the
    command line carries --int8-gate, the gate would silently never run —
    the CLI must refuse instead (exit 2)."""
    import fractions

    from reve_tpu import cli
    from reve_tpu.io import writer
    from reve_tpu.pipeline import state as state_mod
    from reve_tpu.pipeline.planner import plan_segments as plan

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    out = str(tmp_path / "o.y4m")
    ws = state_mod.Workspace(out + ".revework")
    ws.create()
    ws.save(state_mod.JobState(
        input_path=inp, output_path=out, scale=2, segment_size=5,
        frame_count=6, fps_num=24, fps_den=1, width=32, height=24,
        pending=plan(6, 5),
        opts={"dtype": "bfloat16", "io_backend": "y4m"},
    ))
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "--dtype", "int8", "--int8-gate", "50"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "--int8-gate" in err and "saved job" in err
    # the workspace is untouched: the operator can still resume properly
    assert ws.has_state()


def test_cli_int8_gate_shard_worker_keeps_workspace(tmp_path, monkeypatch,
                                                    capsys):
    """A shard worker's workspace is SHARED with sibling workers: a gate
    refusal must exit 3 but never destroy the workspace out from under
    them (the single-owner cleanup only applies without --shard-worker)."""
    import fractions
    import os

    from reve_tpu import cli
    from reve_tpu.io import writer

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "in.y4m")
    rs = np.random.RandomState(0)
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(6):
            wr.write((rs.rand(24, 32, 3) * 255).astype(np.uint8))
    out = str(tmp_path / "o.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "--dtype", "int8", "--batch", "3", "--int8-gate", "200",
                  "--shard-worker", "w1"])
    err = capsys.readouterr().err
    assert rc == 3 and "refusing" in err
    assert os.path.exists(out + ".revework/state.json")
