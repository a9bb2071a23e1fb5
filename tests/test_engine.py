"""Engine-level tests: tiled vs whole-frame equality, batch padding, stats."""

import numpy as np
import pytest

from reve_tpu.pipeline.engine import UpscaleEngine


def _engine(**kw):
    base = dict(model="realesr-animevideov3", scale=2, batch_size=2,
                compute_dtype="float32")
    base.update(kw)
    return UpscaleEngine(**base)


def test_tiled_equals_whole_frame():
    frames = np.random.RandomState(0).randint(0, 256, (2, 40, 56, 3),
                                              np.uint8)
    whole = _engine(tile=-1).submit(frames).result()
    tiled = _engine(tile=24).submit(frames).result()
    np.testing.assert_array_equal(whole, tiled)


def test_chunked_execution_exact(monkeypatch):
    """Shrinking the HBM budget so the plan chunks (whole-frame batch
    chunking AND tiled window chunking) must not change a single byte of
    output vs the one-call paths."""
    from reve_tpu.pipeline import engine as engine_mod

    frames = np.random.RandomState(3).randint(0, 256, (5, 40, 56, 3),
                                              np.uint8)
    ref = _engine(tile=-1, batch_size=5).upscale_frames(frames)

    # budget below one batch but above one frame -> whole-frame chunked
    e = _engine(tile=0, batch_size=5)
    # the chunk cost model (round 5): per-frame working set + the u8
    # output buffer, with an in-flight IO reserve for the batches the
    # pipeline holds while the encoder drains (small frames reserve
    # _PLAN_INFLIGHT_SETS sets; outputs outlive the graph in production)
    per = e._frame_bytes(40, 56) + e._out_bytes(40, 56)
    reserve = engine_mod._PLAN_INFLIGHT_SETS * 5 * (
        40 * 56 * 3 + e._out_bytes(40, 56))
    monkeypatch.setattr(engine_mod, "_HBM_BUDGET_BYTES",
                        2 * per + reserve)
    tile, wf_chunk, _ = e._plan_execution(40, 56)
    assert tile == 0 and wf_chunk == 2  # 5 frames -> chunks of 2 (padded)
    np.testing.assert_array_equal(e.upscale_frames(frames), ref)

    # budget below one frame -> tiled with chunked windows
    e2 = _engine(tile=0, batch_size=5)
    monkeypatch.setattr(engine_mod, "_HBM_BUDGET_BYTES",
                        e2._frame_bytes(40, 56) - 1)
    monkeypatch.setattr(engine_mod, "_DEFAULT_TILE", 24)
    monkeypatch.setattr(engine_mod, "_TILE_CHUNK", 3)
    tile, _, tile_chunk = e2._plan_execution(40, 56)
    assert tile == 24 and tile_chunk >= 1
    np.testing.assert_array_equal(e2.upscale_frames(frames), ref)


def test_rrdb_chunked_execution_exact(monkeypatch):
    """RRDB has no pixel-shuffle epilogue to split out (apply upsamples
    internally) — the chunked whole-frame path must run it as-is, not
    feed its (B,H*s,W*s,3) output through pixel_shuffle_rowphase
    (regression: round-3 review found that crashed every RRDB upscale
    whose batch exceeded the HBM budget)."""
    from reve_tpu.pipeline import engine as engine_mod

    frames = np.random.RandomState(5).randint(0, 256, (3, 24, 32, 3),
                                              np.uint8)
    kw = dict(model="realesrgan-x4plus-anime", scale=4, batch_size=3,
              compute_dtype="float32", tile=-1)
    ref = UpscaleEngine(**kw).upscale_frames(frames)

    e = UpscaleEngine(**{**kw, "tile": 0})
    per = e._frame_bytes(24, 32) + e._epi_bytes(24, 32)
    monkeypatch.setattr(engine_mod, "_HBM_BUDGET_BYTES", per)
    tile, wf_chunk, _ = e._plan_execution(24, 32)
    assert tile == 0 and wf_chunk == 1
    np.testing.assert_array_equal(e.upscale_frames(frames), ref)


def test_rrdb_execution_plan():
    """RRDB's byte model is calibrated on the measured x4 bf16 whole-frame
    boundary (scripts/perf_rrdb_fit.py: <=1.84 MP total input pixels
    compile+run, >=2.07 MP fail on a 16 GB v5e — the upsample stages hold
    output-resolution feature maps the SRVGG formula misses by ~20x).
    Every plan must stay inside the measured-fit region."""
    def rrdb_engine(b):
        return UpscaleEngine(model="realesrgan-x4plus-anime", scale=4,
                             batch_size=b, compute_dtype="bfloat16",
                             tile=0)

    e = rrdb_engine(1)
    # 1080p+ : a single frame exceeds the budget -> tiled, window batches
    # bounded so tile_chunk * window_px <= 1.84 MP (measured fit)
    for h, w in ((1080, 1920), (2160, 3840)):
        tile, wf_chunk, tile_chunk = e._plan_execution(h, w)
        assert tile > 0 and wf_chunk == 0
        win = (tile + 2 * e.halo) ** 2
        assert tile_chunk * win <= 1_850_000
    # 720p: b2 whole-frame unchunked (measured fit), b4 chunks to 2
    assert rrdb_engine(2)._plan_execution(720, 1280) == (0, 0, 0)
    assert rrdb_engine(4)._plan_execution(720, 1280) == (0, 2, 0)
    # 480x640: b4 unchunked (measured fit), b8 chunks within the boundary
    assert rrdb_engine(4)._plan_execution(480, 640) == (0, 0, 0)
    tile, wf_chunk, _ = rrdb_engine(8)._plan_execution(480, 640)
    assert tile == 0 and 1 <= wf_chunk and wf_chunk * 480 * 640 <= 1_850_000


def test_auto_execution_plan():
    """Measurement-derived plan (PERF.md round-3 "4K story"): whole-frame
    whenever a single frame fits, lax.map-chunking the batch when the
    FULL batch does not (whole-frame beats tiling 2.5x at 4K); tiling
    only when one frame alone exceeds the budget (8K+) or forced."""
    e = _engine(tile=0)
    assert e._plan_execution(100, 100) == (0, 0, 0)   # small: one call
    # 4K bf16: one frame fits; batch 8 does not -> whole-frame, chunked
    b8 = _engine(tile=0, batch_size=8, compute_dtype="bfloat16")
    tile, wf_chunk, _ = b8._plan_execution(2160, 3840)
    assert tile == 0 and 1 <= wf_chunk < 8
    assert b8._plan_execution(1080, 1920) == (0, 0, 0)  # the bench config
    # int8 4K x4 b4: the single-count formula says 12.7 GB "fits", but it
    # was measured RESOURCE_EXHAUSTED — the big-frame epi-double-counted
    # gate chunks it to the measured-safe 2 (round-3 hardware: chunk 2
    # runs, chunk 4 OOMs), with 1 in-flight IO set reserved
    i4 = _engine(tile=0, batch_size=4, scale=4, compute_dtype="int8")
    assert i4._plan_execution(2160, 3840) == (0, 2, 0)
    # 1080p int8 b16 at x2 still fits whole-batch (small outputs)
    i16 = _engine(tile=0, batch_size=16, compute_dtype="int8")
    assert i16._plan_execution(1080, 1920) == (0, 0, 0)
    # ... but the x4 FLAGSHIP config no longer does: unchunked was
    # measured fitting STANDALONE (round 4), while the round-5 PRODUCT
    # run hit a real RESOURCE_EXHAUSTED once ~4 async batches of
    # in-flight 4K outputs stacked on the graph — the in-flight reserve
    # chunks this boundary now
    i16x4 = _engine(tile=0, batch_size=16, scale=4, compute_dtype="int8")
    tile, wf_chunk, _ = i16x4._plan_execution(1080, 1920)
    assert tile == 0 and 1 <= wf_chunk < 16
    # 8K: a single bf16 frame blows the budget -> tiled, chunked windows
    tile, _, tile_chunk = b8._plan_execution(4320, 7680)
    assert tile > 0 and tile_chunk >= 1
    # forced tile: honored, windows chunked
    f = _engine(tile=384, batch_size=4)
    tile, _, tile_chunk = f._plan_execution(2160, 3840)
    assert tile == 384 and tile_chunk >= 1
    # tile=-1 (never tile): whole-frame even at 8K, chunked to fit
    n = _engine(tile=-1, batch_size=8, compute_dtype="bfloat16")
    tile, wf_chunk, _ = n._plan_execution(4320, 7680)
    assert tile == 0 and wf_chunk == 1


def test_plan_chunk_minimizes_padded_waste():
    """The chunk rule minimizes dispatch count, then padded waste: a
    16-frame batch that fits 5 frames per dispatch must chunk to 4
    (4 dispatches, zero padding), NOT 5 (4 dispatches, 20 padded frames
    per 16 useful = 25% wasted MXU time — the measured round-5 product
    regression: the wf=5 flagship plan probed 39.8 fps where wf=8
    benches 75.2)."""
    from reve_tpu.pipeline import engine as engine_mod

    e = _engine(tile=0, batch_size=16, scale=4, compute_dtype="int8")
    per = e._frame_bytes(1080, 1920) + e._out_bytes(1080, 1920)
    io = 16 * (1080 * 1920 * 3 + e._out_bytes(1080, 1920))
    reserve = engine_mod._PLAN_INFLIGHT_SETS * io
    budget = 5 * per + reserve  # 5 frames fit beside the reserve
    orig = engine_mod._HBM_BUDGET_BYTES
    engine_mod._HBM_BUDGET_BYTES = budget
    try:
        assert e._plan_execution(1080, 1920) == (0, 4, 0)
    finally:
        engine_mod._HBM_BUDGET_BYTES = orig


def test_recommended_queue_depth():
    """The scheduler's device-queue depth comes from the plan's leftover
    HBM headroom: flagship int8 1080p x4 b16 (chunked to 8) affords a
    couple of held batches; a tiny job is capped at 3; the floor is 1 so
    the pipeline always overlaps at least one batch."""
    i16 = _engine(tile=0, batch_size=16, scale=4, compute_dtype="int8")
    d = i16.recommended_queue_depth(1080, 1920)
    assert 1 <= d <= 3
    # sanity: the working set the depth was computed against + the held
    # sets must stay inside the budget
    from reve_tpu.pipeline import engine as engine_mod

    _, wf, _ = i16._plan_execution(1080, 1920)
    per = i16._frame_bytes(1080, 1920) + i16._out_bytes(1080, 1920)
    io = 16 * (1080 * 1920 * 3 + i16._out_bytes(1080, 1920))
    assert per * wf + (d + 1) * io <= engine_mod._HBM_BUDGET_BYTES
    # small job: plenty of headroom -> capped at the legacy depth
    small = _engine(tile=0, batch_size=2)
    assert small.recommended_queue_depth(64, 64) == 3


def test_short_batch_padding():
    e = _engine(batch_size=4)
    frames = np.random.RandomState(1).randint(0, 256, (3, 16, 16, 3),
                                              np.uint8)
    out = e.submit(frames).result()
    assert out.shape == (3, 32, 32, 3)  # padding cropped


def test_oversized_batch_rejected():
    e = _engine(batch_size=2)
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="batch 3 > batch_size 2"):
        e.submit(frames)


def test_stats_and_compile_reuse():
    e = _engine(batch_size=2)
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    e.submit(frames).result()
    e.submit(frames).result()
    assert e.stats.frames == 4
    assert e.stats.batches == 2
    assert e.stats.compile_count == 1  # same resolution -> one compile


def test_upscale_frames_convenience():
    e = _engine(batch_size=2)
    frames = np.random.RandomState(2).randint(0, 256, (5, 12, 12, 3),
                                              np.uint8)
    out = e.upscale_frames(frames)
    assert out.shape == (5, 24, 24, 3)
    # same frames through submit path give identical results
    ref = np.concatenate([
        e.submit(frames[:2]).result(),
        e.submit(frames[2:4]).result(),
        e.submit(frames[4:]).result(),
    ])
    np.testing.assert_array_equal(out, ref)


def test_rrdb_tiled_seams_bounded():
    """RRDB halo is an approximation (engine.halo docstring); seams must be
    visually negligible — bounded by ~1 u8 step on random content."""
    frames = np.random.RandomState(3).randint(0, 256, (1, 48, 48, 3),
                                              np.uint8)
    kw = dict(model="realesrgan-x4plus-anime", scale=4, batch_size=1,
              compute_dtype="float32")
    whole = UpscaleEngine(tile=-1, **kw).submit(frames).result()
    tiled = UpscaleEngine(tile=24, **kw).submit(frames).result()
    diff = np.abs(whole.astype(int) - tiled.astype(int))
    assert diff.max() <= 2, diff.max()
    assert (diff > 0).mean() < 0.02  # <2% of pixels differ at all


# ------------------------------------------------------- compiler options


def test_compileopts_env_and_backend(monkeypatch):
    from reve_tpu.utils import compileopts

    monkeypatch.delenv("REVE_TPU_XLA_OPTIONS", raising=False)
    assert compileopts.default_compiler_options("cpu") is None
    opts = compileopts.default_compiler_options("tpu")
    assert opts == compileopts.DEFAULT_TPU_OPTIONS
    assert opts is not compileopts.DEFAULT_TPU_OPTIONS  # caller-safe copy

    monkeypatch.setenv("REVE_TPU_XLA_OPTIONS", "")
    assert compileopts.default_compiler_options("tpu") is None

    monkeypatch.setenv("REVE_TPU_XLA_OPTIONS", "a=1, b = x=y ")
    assert compileopts.default_compiler_options("cpu") == {
        "a": "1", "b": "x=y"}

    monkeypatch.setenv("REVE_TPU_XLA_OPTIONS", "garbage")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k=v"):
        compileopts.default_compiler_options("tpu")

    # env-only helper (RRDB path: no measured defaults, env still honored)
    monkeypatch.delenv("REVE_TPU_XLA_OPTIONS", raising=False)
    assert compileopts.env_compiler_options() is None
    monkeypatch.setenv("REVE_TPU_XLA_OPTIONS", "k=v")
    assert compileopts.env_compiler_options() == {"k": "v"}


def test_engine_compiler_options_plumbing():
    """Explicit dict reaches jax.jit; 'auto' resolves to None on CPU."""
    eng = UpscaleEngine(scale=2, batch_size=1, compute_dtype="float32",
                        compiler_options=None)
    out = eng.upscale_frames(np.zeros((1, 8, 8, 3), np.uint8))
    assert out.shape == (1, 16, 16, 3)


# --------------------------------------------- compile-lottery mitigation


def test_auto_compile_attempts_policy():
    """Best-of-2 only on TPU and only for jobs long enough to amortize the
    extra ~30 s compile (engine.auto_compile_attempts docstring)."""
    from reve_tpu.pipeline.engine import (_AUTO_LOTTERY_MIN_FRAMES,
                                          auto_compile_attempts)

    assert auto_compile_attempts("tpu", _AUTO_LOTTERY_MIN_FRAMES) == 2
    assert auto_compile_attempts("tpu", _AUTO_LOTTERY_MIN_FRAMES - 1) == 1
    assert auto_compile_attempts("cpu", 10 ** 6) == 1


def test_compile_attempts_validation_and_env(monkeypatch):
    with pytest.raises(ValueError, match="compile_attempts"):
        _engine(compile_attempts=0)
    monkeypatch.setenv("REVE_TPU_COMPILE_ATTEMPTS", "3")
    assert _engine().compile_attempts == 3
    assert _engine(compile_attempts=1).compile_attempts == 1  # explicit wins
    monkeypatch.delenv("REVE_TPU_COMPILE_ATTEMPTS")
    assert _engine().compile_attempts == 1


def test_compile_attempts_output_bit_identical():
    """The cache-busting barrier adds +0.0f, so every reroll attempt
    computes byte-identical output; best-of-N only changes which binary
    runs.  N compiles happen per fresh resolution, reused afterwards."""
    frames = np.random.RandomState(7).randint(0, 256, (2, 20, 24, 3),
                                              np.uint8)
    ref = _engine().submit(frames).result()
    e = _engine(compile_attempts=3)
    np.testing.assert_array_equal(e.submit(frames).result(), ref)
    assert e.stats.compile_count == 3  # 3 attempts, one resolution
    e.submit(frames).result()
    assert e.stats.compile_count == 3  # cached binary reused


def test_compile_lottery_reroll_selected(monkeypatch):
    """Simulate attempt 0 drawing a lottery-bad binary: the probe reports
    it slow, the reroll wins, the reroll counter ticks, and output stays
    exact."""
    frames = np.random.RandomState(8).randint(0, 256, (2, 16, 16, 3),
                                              np.uint8)
    ref = _engine().submit(frames).result()
    e = _engine(compile_attempts=2)
    probes = iter([1.0, 50.0])  # attempt 0 catastrophically slow

    monkeypatch.setattr(UpscaleEngine, "_probe_fps",
                        lambda self, fn, wf, h, w: next(probes))
    out = e.submit(frames).result()
    np.testing.assert_array_equal(out, ref)
    assert e.stats.lottery_rerolls == 1


def test_compile_reroll_failure_keeps_working_binary(monkeypatch):
    """A reroll that fails to build/probe must never break the engine —
    attempt 0's working binary is kept."""
    frames = np.random.RandomState(9).randint(0, 256, (2, 16, 16, 3),
                                              np.uint8)
    ref = _engine().submit(frames).result()
    e = _engine(compile_attempts=2)
    orig_build = UpscaleEngine._build

    def build(self, h, w, attempt=0):
        if attempt:
            raise RuntimeError("synthetic reroll compile failure")
        return orig_build(self, h, w, attempt)

    monkeypatch.setattr(UpscaleEngine, "_build", build)
    np.testing.assert_array_equal(e.submit(frames).result(), ref)
    assert e.stats.lottery_rerolls == 0


@pytest.mark.slow
def test_compile_attempts_int8_exact():
    """int8 engines probe with a provisional zero-frame calibration; the
    first REAL batch still owns the job's calibration, so best-of-N output
    equals the single-compile engine bit-for-bit."""
    frames = np.random.RandomState(10).randint(0, 256, (2, 24, 32, 3),
                                               np.uint8)
    kw = dict(model="realesr-animevideov3", scale=2, batch_size=2,
              compute_dtype="int8")
    ref_e = UpscaleEngine(**kw)
    ref = ref_e.submit(frames).result()
    e = UpscaleEngine(compile_attempts=2, **kw)
    np.testing.assert_array_equal(e.submit(frames).result(), ref)
    np.testing.assert_array_equal(e.get_calibration(),
                                  ref_e.get_calibration())
