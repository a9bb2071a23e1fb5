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


def test_auto_tile_threshold():
    e = _engine(tile=0)
    assert e._tile_size_for(100, 100) == 0          # small: whole frame
    assert e._tile_size_for(2160, 3840) > 0         # 4K f32 batch2: tiles
    # HBM-budget decision: 4K fits whole-frame at batch 1 bf16, not batch 8
    b1 = _engine(tile=0, batch_size=1, compute_dtype="bfloat16")
    b8 = _engine(tile=0, batch_size=8, compute_dtype="bfloat16")
    assert b1._tile_size_for(2160, 3840) == 0
    assert b8._tile_size_for(2160, 3840) > 0
    assert b8._tile_size_for(1080, 1920) == 0       # the bench config


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
