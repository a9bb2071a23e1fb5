"""Weight loading: synthetic ncnn .param/.bin and torch .pth round-trips."""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reve_tpu.models import srvgg, registry
from reve_tpu.weights import ncnn


def make_ncnn_srvgg(cfg: srvgg.SRVGGConfig, params, fp16=True):
    """Serialize a params pytree into ncnn .param text + .bin bytes, the
    layout realesrgan-ncnn-vulkan's models use."""
    lines = ["7767517"]
    layers = []
    blobs = ["data"]

    def add(line):
        layers.append(line)

    add("Input            input    0 1 data")
    bin_parts = []

    def emit_conv(i, w_hwio, b):
        o = w_hwio.shape[-1]
        cin = w_hwio.shape[2]
        wsize = o * cin * 9
        inb, outb = blobs[-1], f"conv{i}_out"
        blobs.append(outb)
        add(
            f"Convolution      conv{i}   1 1 {inb} {outb} "
            f"0={o} 1=3 11=3 2=1 3=1 4=1 5=1 6={wsize}"
        )
        w_oihw = np.transpose(np.asarray(w_hwio), (3, 2, 0, 1)).astype(np.float32)
        if fp16:
            bin_parts.append(struct.pack("<I", 0x01306B47))
            data = w_oihw.astype("<f2").tobytes()
            bin_parts.append(data)
            if len(data) % 4:
                bin_parts.append(b"\0" * (4 - len(data) % 4))
        else:
            bin_parts.append(struct.pack("<I", 0))
            bin_parts.append(w_oihw.astype("<f4").tobytes())
        bin_parts.append(np.asarray(b).astype("<f4").tobytes())

    def emit_prelu(i, alpha):
        inb, outb = blobs[-1], f"prelu{i}_out"
        blobs.append(outb)
        add(f"PReLU            prelu{i}  1 1 {inb} {outb} 0={len(alpha)}")
        bin_parts.append(np.asarray(alpha).astype("<f4").tobytes())

    convs, prelus = params["convs"], params["prelus"]
    emit_conv(0, convs[0]["w"], convs[0]["b"])
    emit_prelu(0, prelus[0]["alpha"])
    for i in range(cfg.num_conv):
        emit_conv(i + 1, convs[i + 1]["w"], convs[i + 1]["b"])
        emit_prelu(i + 1, prelus[i + 1]["alpha"])
    emit_conv(len(convs) - 1, convs[-1]["w"], convs[-1]["b"])
    add(f"PixelShuffle     shuf     1 1 {blobs[-1]} shuf_out 0={cfg.upscale}")
    add("Interp           up       1 1 data up_out "
        f"0=1 1={cfg.upscale}.0 2={cfg.upscale}.0")
    add("BinaryOp         add      2 1 shuf_out up_out out 0=0")
    param_text = "\n".join(
        ["7767517", f"{len(layers)} {len(blobs) + 3}"] + layers
    )
    return param_text, b"".join(bin_parts)


@pytest.mark.parametrize("fp16", [False, True])
def test_ncnn_roundtrip(fp16):
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8, upscale=3)
    params = srvgg.init_params(jax.random.key(42), cfg)
    param_text, bin_data = make_ncnn_srvgg(cfg, params, fp16=fp16)

    net = ncnn.load_srvgg(param_text, bin_data)
    assert net.upscale == 3 and net.num_feat == 8 and net.num_conv == 2
    cfg2, params2 = ncnn.to_params(net)
    assert cfg2 == cfg

    x = jnp.asarray(np.random.RandomState(0).rand(1, 12, 12, 3), jnp.float32)
    y1 = srvgg.apply(params, x, cfg=cfg)
    y2 = srvgg.apply(params2, x, cfg=cfg2)
    tol = 2e-3 if fp16 else 1e-7  # fp16 storage rounds weights
    assert float(jnp.abs(y1 - y2).max()) < tol


def test_pth_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from reve_tpu.weights.torch_loader import load_srvgg_pth

    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8, upscale=2)
    params = srvgg.init_params(jax.random.key(7), cfg)

    # Build the upstream-style state dict (body.N alternating conv/prelu).
    sd = {}
    convs, prelus = params["convs"], params["prelus"]
    order = [("conv", 0), ("prelu", 0)]
    for i in range(cfg.num_conv):
        order += [("conv", i + 1), ("prelu", i + 1)]
    order += [("conv", len(convs) - 1)]
    for n, (kind, idx) in enumerate(order):
        if kind == "conv":
            w = np.transpose(np.asarray(convs[idx]["w"]), (3, 2, 0, 1))
            sd[f"body.{n}.weight"] = torch.from_numpy(w.copy())
            sd[f"body.{n}.bias"] = torch.from_numpy(
                np.asarray(convs[idx]["b"]).copy()
            )
        else:
            sd[f"body.{n}.weight"] = torch.from_numpy(
                np.asarray(prelus[idx]["alpha"]).copy()
            )
    path = tmp_path / "model.pth"
    torch.save({"params": sd}, str(path))

    cfg2, params2 = load_srvgg_pth(str(path))
    assert cfg2 == cfg
    x = jnp.asarray(np.random.RandomState(1).rand(1, 10, 14, 3), jnp.float32)
    y1 = srvgg.apply(params, x, cfg=cfg)
    y2 = srvgg.apply(params2, x, cfg=cfg2)
    assert float(jnp.abs(y1 - y2).max()) < 1e-7


def test_save_srvgg_pth_roundtrip(tmp_path):
    """save_srvgg_pth is the exact inverse of load_srvgg_pth: a distilled
    student exported to .pth loads back bit-identical (the path by which
    locally trained variants become product weights)."""
    pytest.importorskip("torch")
    from reve_tpu.weights.torch_loader import load_srvgg_pth, save_srvgg_pth

    cfg = srvgg.SRVGGConfig(num_conv=3, num_feat=8, upscale=4)
    params = srvgg.init_params(jax.random.key(3), cfg)
    path = tmp_path / "student.pth"
    save_srvgg_pth(str(path), cfg, params)

    cfg2, params2 = load_srvgg_pth(str(path))
    assert cfg2 == cfg
    for a, b in zip(params["convs"], params2["convs"]):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))
    for a, b in zip(params["prelus"], params2["prelus"]):
        np.testing.assert_array_equal(np.asarray(a["alpha"]),
                                      np.asarray(b["alpha"]))

    # registry picks it up under a models dir like any published weight
    stem = tmp_path / "realesr-animevideov3-x4.pth"
    save_srvgg_pth(str(stem), cfg, params)
    assert registry.resolve_weights(
        "realesr-animevideov3", 4, dirs=[str(tmp_path)]) == str(stem)


def test_save_srvgg_pth_shape_mismatch(tmp_path):
    pytest.importorskip("torch")
    from reve_tpu.weights.torch_loader import save_srvgg_pth

    cfg = srvgg.SRVGGConfig(num_conv=3, num_feat=8, upscale=4)
    params = srvgg.init_params(jax.random.key(3), cfg)
    bad = srvgg.SRVGGConfig(num_conv=5, num_feat=8, upscale=4)
    with pytest.raises(ValueError, match="mismatch"):
        save_srvgg_pth(str(tmp_path / "x.pth"), bad, params)


def test_registry_names():
    spec, scale = registry.parse_model_name("realesr-animevideov3-x2")
    assert spec.arch == "srvgg" and scale == 2
    spec, scale = registry.parse_model_name("realesr-animevideov3")
    assert scale is None
    spec, scale = registry.parse_model_name("realesr-general-x4v3")
    assert scale == 4 and spec.num_conv == 32
    with pytest.raises(ValueError):
        registry.parse_model_name("nope")


def test_registry_fast_variant():
    """The distilled opt-in student (PERF.md round-4 depth frontier):
    8-conv SRVGG, scale from -s, weights via the -fast canonical stem, and
    the service whitelist accepts it."""
    spec, scale = registry.parse_model_name("realesr-animevideov3-fast")
    assert spec.arch == "srvgg" and spec.num_conv == 8 and scale is None
    spec, scale = registry.parse_model_name("realesr-animevideov3-fast-x4")
    assert spec.num_conv == 8 and scale == 4
    cfg, params = registry.load_model("realesr-animevideov3-fast", scale=4)
    assert cfg.num_conv == 8 and cfg.upscale == 4
    assert len(params["convs"]) == 10  # first + 8 hidden + last

    from reve_tpu.service.config import VALID_MODELS, ServiceConfig

    assert "realesr-animevideov3-fast" in VALID_MODELS
    sc = ServiceConfig(default_upscale_type="realesr-animevideov3-fast")
    assert sc.validate()


def test_registry_fast_variant_weight_resolution(tmp_path):
    """scripts/distill.py --out models/realesr-animevideov3-fast-x4.pth is
    the documented recipe; prove the registry resolves and loads it."""
    pytest.importorskip("torch")
    from reve_tpu.weights.torch_loader import save_srvgg_pth

    cfg = srvgg.SRVGGConfig(num_conv=8, num_feat=8, upscale=4)
    params = srvgg.init_params(jax.random.key(5), cfg)
    path = tmp_path / "realesr-animevideov3-fast-x4.pth"
    save_srvgg_pth(str(path), cfg, params)
    assert registry.resolve_weights(
        "realesr-animevideov3-fast", 4, dirs=[str(tmp_path)]) == str(path)


def test_registry_random_fallback(caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        cfg, params = registry.load_model("realesr-animevideov3", scale=2)
    assert cfg.upscale == 2 and cfg.num_conv == 16
    assert any("random init" in r.message for r in caplog.records)


def test_registry_refuses_missing_weights_without_optin(monkeypatch,
                                                        tmp_path):
    """Weights are a product requirement (round-4 VERDICT #1): without the
    explicit opt-in, a model with no resolvable weights raises
    MissingWeightsError (the reference fails hard when its model files
    are absent, reve-shared/src/lib.rs:140-143) — for BOTH architectures."""
    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)  # no stray ./models dir can resolve
    with pytest.raises(registry.MissingWeightsError) as ei:
        registry.load_model("realesr-animevideov3", scale=2)
    msg = str(ei.value)
    assert "realesr-animevideov3" in msg
    assert "realesr-animevideov3-x2.pth" in msg      # what was searched for
    assert "--allow-random-init" in msg              # how to opt in
    assert "REVE_TPU_ALLOW_RANDOM_INIT" in msg
    with pytest.raises(registry.MissingWeightsError):
        registry.load_model("realesrgan-x4plus", scale=4)  # rrdb arch
    # MissingWeightsError is a FileNotFoundError so generic handlers work
    assert issubclass(registry.MissingWeightsError, FileNotFoundError)
    # the explicit per-call opt-in overrides the missing env var
    cfg, _ = registry.load_model("realesr-animevideov3", scale=2,
                                 allow_random_init=True)
    assert cfg.upscale == 2


def test_registry_optin_env_values(monkeypatch):
    """Falsy spellings of the env var do NOT opt in."""
    for v in ("0", "", "off", "false", "no"):
        monkeypatch.setenv("REVE_TPU_ALLOW_RANDOM_INIT", v)
        assert not registry.random_init_allowed()
    monkeypatch.setenv("REVE_TPU_ALLOW_RANDOM_INIT", "1")
    assert registry.random_init_allowed()
    # an explicit argument always wins over the env var
    assert not registry.random_init_allowed(False)
    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT")
    assert registry.random_init_allowed(True)


def test_registry_loads_ncnn_from_models_dir(tmp_path, monkeypatch):
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8, upscale=2)
    params = srvgg.init_params(jax.random.key(3), cfg)
    param_text, bin_data = make_ncnn_srvgg(cfg, params)
    stem = tmp_path / "realesr-animevideov3-x2"
    stem.with_suffix(".param").write_text(param_text)
    stem.with_suffix(".bin").write_bytes(bin_data)
    monkeypatch.setenv("REVE_TPU_MODELS_DIR", str(tmp_path))
    cfg2, _ = registry.load_model("realesr-animevideov3", scale=2)
    assert cfg2.num_conv == 2  # proves it loaded our files, not the default


def test_weight_interpolation():
    from reve_tpu.weights import interpolate as interp

    cfg = srvgg.SRVGGConfig(num_conv=1, num_feat=8, upscale=2)
    pa = srvgg.init_params(jax.random.key(0), cfg)
    pb = srvgg.init_params(jax.random.key(1), cfg)
    mid = interp.interpolate(pa, pb, 0.5)
    w = np.asarray(mid["convs"][0]["w"])
    want = 0.5 * np.asarray(pa["convs"][0]["w"]) + \
        0.5 * np.asarray(pb["convs"][0]["w"])
    np.testing.assert_allclose(w, want, rtol=1e-6)
    # endpoints
    np.testing.assert_allclose(
        np.asarray(interp.interpolate(pa, pb, 0.0)["convs"][0]["w"]),
        np.asarray(pa["convs"][0]["w"]),
    )
    with pytest.raises(ValueError, match="weight must be"):
        interp.interpolate(pa, pb, 1.5)


def test_interpolation_shape_mismatch():
    from reve_tpu.weights import interpolate as interp

    cfg_a = srvgg.SRVGGConfig(num_conv=1, num_feat=8, upscale=2)
    cfg_b = srvgg.SRVGGConfig(num_conv=1, num_feat=16, upscale=2)
    pa = srvgg.init_params(jax.random.key(0), cfg_a)
    pb = srvgg.init_params(jax.random.key(0), cfg_b)
    with pytest.raises(ValueError, match="mismatch"):
        interp.interpolate(pa, pb, 0.5)


def test_load_dni_direction(tmp_path):
    """Pin the upstream dni convention (round-1 advisor finding: it was
    inverted): params = (1-d)*wdn + d*plain, so strength 1.0 returns the
    plain (full-denoise) model and 0.0 the wdn twin."""
    torch = pytest.importorskip("torch")
    from test_acceptance import make_pth
    from reve_tpu.weights.interpolate import load_dni

    cfg = srvgg.SRVGGConfig(num_conv=1, num_feat=8, upscale=2)
    p_plain = srvgg.init_params(jax.random.key(0), cfg)
    p_wdn = srvgg.init_params(jax.random.key(1), cfg)
    f_plain = tmp_path / "plain.pth"
    f_wdn = tmp_path / "wdn.pth"
    make_pth(cfg, p_plain, f_plain)
    make_pth(cfg, p_wdn, f_wdn)

    _, at_one = load_dni(str(f_wdn), str(f_plain), 1.0)
    np.testing.assert_allclose(
        np.asarray(at_one["convs"][0]["w"]),
        np.asarray(p_plain["convs"][0]["w"]), rtol=1e-6)
    _, at_zero = load_dni(str(f_wdn), str(f_plain), 0.0)
    np.testing.assert_allclose(
        np.asarray(at_zero["convs"][0]["w"]),
        np.asarray(p_wdn["convs"][0]["w"]), rtol=1e-6)


def test_registry_resolve_weights(tmp_path):
    """resolve_weights (--models-dir backend) finds .pth and .param/.bin
    pairs for both archs; absent -> None (the CLI turns that into an
    error for an explicitly named directory)."""
    from reve_tpu.models import registry

    zoo = tmp_path / "zoo"
    zoo.mkdir()
    assert registry.resolve_weights("realesr-animevideov3", 2,
                                    [str(zoo)]) is None
    (zoo / "realesr-animevideov3-x2.pth").write_bytes(b"x")
    got = registry.resolve_weights("realesr-animevideov3", 2, [str(zoo)])
    assert got.endswith("realesr-animevideov3-x2.pth")
    # scale names a different file
    assert registry.resolve_weights("realesr-animevideov3", 3,
                                    [str(zoo)]) is None
    # RRDB canonical stems + ncnn pairs resolve too
    (zoo / "RealESRGAN_x4plus.param").write_bytes(b"x")
    assert registry.resolve_weights("realesrgan-x4plus",
                                    dirs=[str(zoo)]) is None  # .bin missing
    (zoo / "RealESRGAN_x4plus.bin").write_bytes(b"x")
    got = registry.resolve_weights("realesrgan-x4plus", dirs=[str(zoo)])
    assert got.endswith("RealESRGAN_x4plus.param")
