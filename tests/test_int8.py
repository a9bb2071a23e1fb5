"""int8 turbo mode: quantization math, model parity, engine integration.

The hidden stack is quantized (weights/quantize.py, srvgg.apply_int8);
first/last conv + epilogue stay float.  These tests pin the scheme's
invariants on CPU; throughput claims live in PERF.md (TPU-measured).
"""

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


def test_engine_int8_rejects_rrdb():
    with pytest.raises(ValueError, match="SRVGG"):
        UpscaleEngine(model="realesrgan-x4plus", scale=4,
                      compute_dtype="int8")


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
