"""TTA (8-transform dihedral self-ensemble) tests.

TTA is the surface of the replaced engine's `-x` switch
(realesrgan-ncnn-vulkan; the reference itself never passes it,
reve-shared/src/lib.rs:134-147 — engine-surface parity like
single-image mode).  Contract under test:

  * the ensemble equals an independently computed average of the 8
    inverse-transformed model outputs, and
  * it is EXACTLY dihedral-equivariant (tta(T(x)) == T(tta(x))
    bit-for-bit), because the averaged multiset of outputs is the same
    either way — the property that makes the mode's output orientation-
    independent, which a wiring bug in any forward/inverse transform
    pair would break.
"""

import numpy as np
import pytest

from reve_tpu.pipeline.engine import (
    _TTA_SPECS, UpscaleEngine, _tta_fwd, _tta_inv,
)


def _engine(**kw):
    base = dict(model="realesr-animevideov3", scale=2, batch_size=2,
                compute_dtype="float32")
    base.update(kw)
    return UpscaleEngine(**base)


def _manual_tta(engine, frames):
    """Independent host-side oracle of the ensemble spec: exact u16 sum
    of the 8 inverse-transformed outputs, round-half-up integer mean."""
    acc = None
    for k, flip in _TTA_SPECS:
        y = engine.upscale_frames(_tta_fwd(frames, k, flip))
        y = _tta_inv(y, k, flip).astype(np.uint16)
        acc = y if acc is None else acc + y
    return ((acc + 4) // 8).astype(np.uint8)


def test_tta_specs_are_the_dihedral_group():
    """8 distinct transforms, each undone exactly by its inverse."""
    assert len(set(_TTA_SPECS)) == 8
    x = np.random.RandomState(0).randint(0, 256, (1, 6, 9, 3), np.uint8)
    seen = []
    for k, flip in _TTA_SPECS:
        t = _tta_fwd(x, k, flip)
        np.testing.assert_array_equal(_tta_inv(t, k, flip), x)
        seen.append(t.tobytes() + str(t.shape).encode())
    assert len(set(seen)) == 8, "transforms must be pairwise distinct"


def test_tta_matches_manual_ensemble():
    frames = np.random.RandomState(1).randint(0, 256, (2, 20, 28, 3),
                                              np.uint8)
    plain = _engine()
    expected = _manual_tta(plain, frames)
    got = _engine(tta=True).submit(frames).result()
    np.testing.assert_array_equal(got, expected)
    # and differs from the single-pass output (the ensemble must actually
    # have averaged something)
    assert not np.array_equal(got, plain.upscale_frames(frames))


def test_tta_dihedral_equivariance_exact():
    """tta(rot90(x)) == rot90(tta(x)) bit-for-bit on non-square frames —
    holds exactly because the dihedral group is closed under composition,
    so both sides average the SAME 8 u8 arrays."""
    frames = np.random.RandomState(2).randint(0, 256, (2, 16, 24, 3),
                                              np.uint8)
    e = _engine(tta=True)
    base = e.submit(frames).result()
    for k, flip in ((1, False), (2, False), (0, True), (3, True)):
        transformed = e.submit(_tta_fwd(frames, k, flip)).result()
        np.testing.assert_array_equal(
            transformed, _tta_fwd(base, k, flip),
            err_msg=f"equivariance broken for rot{k * 90}, flip={flip}")


def test_tta_result_is_one_shot():
    """A second result() would re-consume device state with mismatched
    inverse transforms — it must raise, not return corrupt pixels."""
    frames = np.random.RandomState(7).randint(0, 256, (2, 8, 8, 3),
                                              np.uint8)
    pending = _engine(tta=True).submit(frames)
    pending.result()
    with pytest.raises(RuntimeError, match="one-shot"):
        pending.result()


def test_tta_short_batch_padding_and_stats():
    frames = np.random.RandomState(3).randint(0, 256, (1, 12, 12, 3),
                                              np.uint8)
    e = _engine(tta=True, batch_size=2)
    out = e.submit(frames).result()
    assert out.shape == (1, 24, 24, 3)
    assert e.stats.frames == 1 and e.stats.batches == 1


def test_tta_upscale_frames_multi_batch():
    frames = np.random.RandomState(4).randint(0, 256, (5, 10, 14, 3),
                                              np.uint8)
    e = _engine(tta=True, batch_size=2)
    expected = _manual_tta(_engine(batch_size=2), frames)
    np.testing.assert_array_equal(e.upscale_frames(frames), expected)


@pytest.mark.slow
def test_tta_int8_smoke():
    """TTA composes with the int8 turbo path: calibration runs once on the
    untransformed batch, all 8 transform passes quantize with the same
    scales (determinism), and the output is a valid u8 ensemble."""
    frames = np.random.RandomState(5).randint(0, 256, (2, 16, 16, 3),
                                              np.uint8)
    e = _engine(tta=True, compute_dtype="int8")
    out1 = e.submit(frames).result()
    assert out1.shape == (2, 32, 32, 3)
    maxima = e.get_calibration()
    assert maxima is not None
    # resubmitting must reuse the first calibration -> identical bytes
    np.testing.assert_array_equal(e.submit(frames).result(), out1)
    np.testing.assert_array_equal(e.get_calibration(), maxima)


def test_tta_warmup_compiles_rotated_shape():
    e = _engine(tta=True)
    e.warmup(10, 14)
    keys = set(e._compiled)
    assert (10, 14) in keys and (14, 10) in keys


def test_service_factory_without_tta_arity_is_refused():
    """A custom 4-arg engine factory cannot run a tta job — explicit error
    instead of silently dropping the setting (mirrors the int8_calib
    arity contract)."""
    from reve_tpu.service.config import ServiceConfig
    from reve_tpu.service.jobs import JobManager

    mgr = JobManager(
        ServiceConfig(),
        engine_factory=lambda model, scale, dtype, calib: None,
    )
    try:
        with pytest.raises(ValueError, match="tta"):
            mgr._get_engine("m", 2, "bfloat16", "max", True)
        # default-tta jobs through the same factory keep working
        assert mgr._get_engine("m", 2, "bfloat16", "max", False) is None
    finally:
        mgr.shutdown()


def test_tta_on_dp_mesh_matches_single_device():
    """TTA over a mesh engine: the device-side inverse/accumulate runs on
    dp-sharded pieces (jnp.rot90 over the spatial axes of a batch-sharded
    array); the ensemble must equal the single-device TTA bit-for-bit."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    frames = np.random.RandomState(5).randint(0, 256, (2, 12, 20, 3),
                                              np.uint8)
    single = _engine(tta=True).submit(frames).result()
    sharded = _engine(tta=True, mesh=mesh).submit(frames).result()
    np.testing.assert_array_equal(single, sharded)


def test_tta_chunked_pieces_accumulate_exactly(monkeypatch):
    """TTA when the HBM plan splits each batch into sub-batch pieces
    (wf_chunk, the 4K path): accumulation is piece-wise; the result must
    still equal the unchunked ensemble bit-for-bit."""
    from reve_tpu.pipeline import engine as engine_mod

    frames = np.random.RandomState(6).randint(0, 256, (2, 12, 20, 3),
                                              np.uint8)
    expected = _engine(tta=True).submit(frames).result()
    chunked_engine = _engine(tta=True)
    # force the plan into 1-frame whole-frame pieces
    monkeypatch.setattr(
        engine_mod.UpscaleEngine, "_plan_execution",
        lambda self, h, w: (0, 1, 0))
    assert chunked_engine._plan_execution(1, 1) == (0, 1, 0)
    got = chunked_engine.submit(frames).result()
    np.testing.assert_array_equal(expected, got)
