"""RRDBNet parity vs a torch-primitive oracle + registry/engine integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reve_tpu.models import rrdb, registry

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def _tconv(h, p):
    w = _t(p["w"]).permute(3, 2, 0, 1)
    return F.conv2d(h, w, _t(p["b"]), padding=1)


def _trdb(x, p):
    feats = [x]
    for i, conv in enumerate(p["convs"]):
        h = _tconv(torch.cat(feats, dim=1), conv)
        if i < 4:
            h = F.leaky_relu(h, 0.2)
        feats.append(h)
    return feats[-1] * 0.2 + x


def torch_rrdb_forward(params, x, cfg):
    h = x
    if cfg.upscale == 2:
        h = F.pixel_unshuffle(h, 2)
    elif cfg.upscale == 1:
        h = F.pixel_unshuffle(h, 4)
    feat = _tconv(h, params["conv_first"])
    body = feat
    for block in params["body"]:
        out = body
        for rdb_p in block["rdbs"]:
            out = _trdb(out, rdb_p)
        body = out * 0.2 + body
    feat = feat + _tconv(body, params["conv_body"])
    feat = F.leaky_relu(
        _tconv(F.interpolate(feat, scale_factor=2, mode="nearest"),
               params["conv_up1"]), 0.2)
    feat = F.leaky_relu(
        _tconv(F.interpolate(feat, scale_factor=2, mode="nearest"),
               params["conv_up2"]), 0.2)
    return _tconv(F.leaky_relu(_tconv(feat, params["conv_hr"]), 0.2),
                  params["conv_last"])


@pytest.mark.parametrize("upscale", [4, 2])
def test_matches_torch_oracle(upscale):
    cfg = rrdb.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8,
                          upscale=upscale)
    params = rrdb.init_params(jax.random.key(0), cfg)
    x = np.random.RandomState(1).rand(1, 12, 16, 3).astype(np.float32)
    got = np.asarray(rrdb.apply(params, jnp.asarray(x), cfg=cfg))
    want = (
        torch_rrdb_forward(params, torch.from_numpy(x).permute(0, 3, 1, 2), cfg)
        .permute(0, 2, 3, 1).numpy()
    )
    assert got.shape == (1, 12 * upscale, 16 * upscale, 3)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pth_roundtrip(tmp_path):
    """Save an upstream-style state dict, reload, verify identical output."""
    cfg = rrdb.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8, upscale=4)
    params = rrdb.init_params(jax.random.key(3), cfg)

    sd = {}

    def put(name, p):
        sd[f"{name}.weight"] = _t(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
        sd[f"{name}.bias"] = _t(p["b"])

    put("conv_first", params["conv_first"])
    for i, block in enumerate(params["body"]):
        for j, rdb_p in enumerate(block["rdbs"]):
            for k, conv in enumerate(rdb_p["convs"]):
                put(f"body.{i}.rdb{j + 1}.conv{k + 1}", conv)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        put(name, params[name])
    path = str(tmp_path / "rrdb.pth")
    torch.save({"params_ema": sd}, path)

    cfg2, params2 = rrdb.load_pth(path)
    assert cfg2 == cfg
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3), jnp.float32)
    y1 = rrdb.apply(params, x, cfg=cfg)
    y2 = rrdb.apply(params2, x, cfg=cfg2)
    assert float(jnp.abs(y1 - y2).max()) < 1e-7


def test_registry_rrdb_fallback():
    cfg, params = registry.load_model("realesrgan-x4plus-anime", scale=4)
    assert isinstance(cfg, rrdb.RRDBConfig)
    assert cfg.num_block == 6


def test_registry_x2plus_runs():
    """x2 RRDB pixel-unshuffles the input (upstream RealESRGAN_x2plus)."""
    cfg, params = registry.load_model("realesrgan-x2plus", scale=2)
    assert isinstance(cfg, rrdb.RRDBConfig)
    assert (cfg.num_block, cfg.upscale) == (23, 2)
    # tiny forward at block depth 2 to keep the test fast
    small = rrdb.RRDBConfig(num_feat=8, num_block=2, num_grow_ch=4, upscale=2)
    sp = rrdb.init_params(jax.random.key(0), small)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 10, 3), jnp.float32)
    y = rrdb.apply(sp, x, cfg=small)
    assert y.shape == (1, 16, 20, 3)


def test_registry_realesrnet_name():
    cfg, _ = registry.load_model("realesrnet-x4plus", scale=4)
    assert isinstance(cfg, rrdb.RRDBConfig)
    assert (cfg.num_block, cfg.upscale) == (23, 4)


def test_rrdb_s2d_exact():
    """The 2D space-to-depth trunk is exact vs the classic path (f32)."""
    cfg = rrdb.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8, upscale=4)
    params = rrdb.init_params(jax.random.key(2), cfg)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 12, 16, 3), jnp.float32)
    y_classic = rrdb.apply(params, x, cfg=cfg, s2d=False)
    y_s2d = rrdb.apply(params, x, cfg=cfg, s2d=True)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_classic), atol=2e-5, rtol=1e-5
    )


def test_rrdb_s2d_odd_dims_fallback():
    """Odd trunk dims take the classic path (still correct)."""
    cfg = rrdb.RRDBConfig(num_feat=16, num_block=1, num_grow_ch=8, upscale=4)
    params = rrdb.init_params(jax.random.key(2), cfg)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 11, 15, 3), jnp.float32)
    y = rrdb.apply(params, x, cfg=cfg)
    assert y.shape == (1, 44, 60, 3)
    assert bool(jnp.isfinite(y).all())


def test_rrdb_pretransformed_params_exact():
    cfg = rrdb.RRDBConfig(num_feat=16, num_block=1, num_grow_ch=8, upscale=4)
    params = rrdb.init_params(jax.random.key(5), cfg)
    x = jnp.asarray(np.random.RandomState(6).rand(1, 8, 12, 3), jnp.float32)
    want = rrdb.apply(params, x, cfg=cfg, s2d=False)
    tp = rrdb.transform_params_s2d(params, cfg)
    got = rrdb.apply(tp, x, cfg=cfg, s2d=True, params_transformed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
