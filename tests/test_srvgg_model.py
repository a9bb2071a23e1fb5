"""Numeric parity of the JAX SRVGGNetCompact against an independent torch oracle.

The reference runs this network inside realesrgan-ncnn-vulkan as a black box
(reve-shared/src/lib.rs:134-147); published weights target the upstream
Real-ESRGAN torch architecture, so matching torch conv/prelu/pixel_shuffle/
nearest-interp semantics exactly is what guarantees published weights
reproduce ncnn outputs.  Oracle is built from torch primitives directly (not
imported from basicsr) so it is an independent re-statement of the arch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg
from reve_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_srvgg_forward(params, x_nchw, cfg):
    """Oracle forward with torch primitives, mirroring upstream Real-ESRGAN."""
    h = x_nchw
    convs = params["convs"]
    prelus = params["prelus"]

    def conv(h, p):
        w = torch.from_numpy(np.asarray(p["w"])).permute(3, 2, 0, 1)  # HWIO->OIHW
        b = torch.from_numpy(np.asarray(p["b"]))
        return F.conv2d(h, w, b, padding=1)

    def prelu(h, p):
        return F.prelu(h, torch.from_numpy(np.asarray(p["alpha"])))

    h = prelu(conv(h, convs[0]), prelus[0])
    for i in range(cfg.num_conv):
        h = prelu(conv(h, convs[i + 1]), prelus[i + 1])
    h = conv(h, convs[-1])
    h = F.pixel_shuffle(h, cfg.upscale)
    base = F.interpolate(x_nchw, scale_factor=cfg.upscale, mode="nearest")
    return h + base


@pytest.mark.parametrize("upscale", [2, 3, 4])
def test_matches_torch_oracle(upscale):
    cfg = srvgg.SRVGGConfig(num_conv=4, num_feat=16, upscale=upscale)
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = np.random.RandomState(1).rand(2, 17, 23, 3).astype(np.float32)

    got = np.asarray(srvgg.apply(params, jnp.asarray(x), cfg=cfg))

    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch_srvgg_forward(params, x_t, cfg).permute(0, 2, 3, 1).numpy()

    assert got.shape == (2, 17 * upscale, 23 * upscale, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_full_size_config_runs():
    cfg = srvgg.SRVGGConfig()  # 64 feat, 16 convs, x2
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    y = srvgg.apply(params, x, cfg=cfg)
    assert y.shape == (1, 64, 64, 3)
    # zero input -> output equals bias propagation; just check finiteness
    assert bool(jnp.isfinite(y).all())


def test_bfloat16_close_to_f32():
    cfg = srvgg.SRVGGConfig(num_conv=4, num_feat=16, upscale=2)
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 24, 24, 3), jnp.float32)
    y32 = srvgg.apply(params, x, cfg=cfg, compute_dtype=jnp.float32)
    y16 = srvgg.apply(params, x, cfg=cfg, compute_dtype=jnp.bfloat16)
    # bf16 per-op rounding: outputs in [0,1] should stay within ~2/255
    err = float(jnp.max(jnp.abs(y32 - y16)))
    assert err < 8e-3, err


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 7, 12), jnp.float32)
    assert jnp.allclose(pixel_unshuffle(pixel_shuffle(x, 2), 2), x)


def test_pixel_shuffle_matches_torch():
    x = np.random.RandomState(0).rand(2, 5, 7, 18).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 3))
    want = (
        F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 3)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_pixel_shuffle_rowphase_bit_identical():
    """The row-phase reformulation (used on the chunked 4K whole-frame
    path, where the classic transpose crashes this stack's compiler) is a
    pure permutation — bit-identical to pixel_shuffle for every (r, c),
    including uint8 (the dtype the engine feeds it)."""
    from reve_tpu.ops.pixel_shuffle import pixel_shuffle_rowphase

    rs = np.random.RandomState(7)
    for r, c in ((2, 3), (3, 3), (4, 3), (2, 1), (4, 5)):
        x = rs.rand(2, 5, 7, c * r * r).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(pixel_shuffle_rowphase(jnp.asarray(x), r)),
            np.asarray(pixel_shuffle(jnp.asarray(x), r)))
    u8 = rs.randint(0, 256, (1, 4, 6, 3 * 16), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle_rowphase(jnp.asarray(u8), 4)),
        np.asarray(pixel_shuffle(jnp.asarray(u8), 4)))


def test_quantize_u8_epilogue_exact():
    """quantize-before-shuffle is a pure permutation-commute: the u8 output
    must be bit-identical to quantizing the f32 output."""
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=16, upscale=3)
    params = srvgg.init_params(jax.random.key(1), cfg)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 11, 13, 3), jnp.float32)
    y32 = srvgg.apply(params, x, cfg=cfg)
    want = np.asarray(jnp.clip(y32 * 255.0 + 0.5, 0, 255).astype(jnp.uint8))
    got = np.asarray(srvgg.apply(params, x, cfg=cfg, quantize_u8=True))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hw", [(16, 20), (13, 19), (9, 8), (17, 23)])
def test_s2d_hidden_stack_exact(hw):
    """The row space-to-depth reformulation of the hidden stack is exact
    (not an approximation): f32 outputs must match the classic path to
    accumulation-reassociation rounding, for even AND odd heights."""
    H, W = hw
    cfg = srvgg.SRVGGConfig(num_conv=3, num_feat=16, upscale=2)
    params = srvgg.init_params(jax.random.key(4), cfg)
    x = jnp.asarray(np.random.RandomState(6).rand(2, H, W, 3), jnp.float32)
    y_classic = srvgg.apply(params, x, cfg=cfg, s2d=False)
    y_s2d = srvgg.apply(params, x, cfg=cfg, s2d=True)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_classic), atol=1e-5, rtol=1e-5
    )
