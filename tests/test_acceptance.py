"""Quality acceptance loop (BASELINE.json: PSNR >= 50 dB vs the reference
engine), closed as far as a weightless, no-egress image allows:

  * torch-oracle parity at the FULL production shape (num_feat=64,
    num_conv=16, x2/x3/x4) — round 1 only tested reduced shapes;
  * the 50 dB gate asserted END-TO-END through the real pipeline
    (y4m decode -> engine upscale -> 10-bit y4m encode) against oracle
    frames pushed through the same encode path, using a synthesized
    full-size .pth checkpoint loaded via --weights;
  * scripts/compare_reference.py (the acceptance command that will certify
    PSNR the day real weights land) wired into the suite.
"""

import fractions
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg
from reve_tpu.io import reader, writer

torch = pytest.importorskip("torch")

from test_srvgg_model import torch_srvgg_forward  # noqa: E402


def make_pth(cfg, params, path):
    """Serialize a params pytree as an upstream-style Real-ESRGAN .pth."""
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
                np.asarray(convs[idx]["b"]).copy())
        else:
            sd[f"body.{n}.weight"] = torch.from_numpy(
                np.asarray(prelus[idx]["alpha"]).copy())
    torch.save({"params": sd}, str(path))


@pytest.mark.parametrize("upscale", [2, 3, 4])
def test_torch_oracle_full_production_shape(upscale):
    """Exact-arch parity at the shipping config (realesr-animevideov3:
    num_feat=64, num_conv=16) — what guarantees published weights reproduce
    ncnn outputs (reve-shared/src/lib.rs:134-147 runs this net)."""
    cfg = srvgg.SRVGGConfig(num_feat=64, num_conv=16, upscale=upscale)
    params = srvgg.init_params(jax.random.key(0), cfg)
    x = np.random.RandomState(1).rand(1, 20, 28, 3).astype(np.float32)

    got = np.asarray(srvgg.apply(params, jnp.asarray(x), cfg=cfg))
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch_srvgg_forward(params, x_t, cfg).permute(0, 2, 3, 1).numpy()

    assert got.shape == (1, 20 * upscale, 28 * upscale, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _compare_reference_main(ours, ref, capsys, *extra):
    spec = importlib.util.spec_from_file_location(
        "compare_reference",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "compare_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["compare_reference.py", ours, ref] + list(extra)
    try:
        mod.main()
    finally:
        sys.argv = old
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_pipeline_psnr_gate_end_to_end(tmp_path, capsys):
    """decode -> upscale -> 10-bit y4m through the REAL pipeline with a
    full-production-shape checkpoint, then certify >= 50 dB with the
    acceptance script against oracle frames through the same encoder."""
    from reve_tpu import cli

    cfg = srvgg.SRVGGConfig(num_feat=64, num_conv=16, upscale=2)
    params = srvgg.init_params(jax.random.key(5), cfg)
    pth = tmp_path / "realesr-animevideov3-x2.pth"
    make_pth(cfg, params, pth)

    # input: smooth gradients (natural-image-like; avoids chroma-subsample
    # noise dominating the comparison, which affects ANY yuv420 encoder)
    h, w, n = 24, 32, 6
    rs = np.random.RandomState(2)
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 3 + xx * 2 + i * 11) % 200 + 20
        f = np.stack([base, base + 10, base - 10], axis=-1)
        f = (f + rs.randint(-3, 3, (h, w, 3))).clip(0, 255).astype(np.uint8)
        frames.append(f)
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, w, h, fractions.Fraction(24)) as wr:
        for f in frames:
            wr.write(f)

    ours = str(tmp_path / "ours.y4m")
    rc = cli.run([
        "-i", inp, "-s", "2", ours, "--yes", "--io-backend", "y4m",
        "-S", "3", "--batch", "2", "--dtype", "float32",
        "--weights", str(pth),
    ])
    assert rc == 0

    # oracle: the torch forward on the DECODED input frames, quantized and
    # written through the same 10-bit y4m path
    decoded = list(reader.Y4MReader(inp).read_range(0, n))
    ref_path = str(tmp_path / "oracle.y4m")
    with writer.Y4MWriter(ref_path, w * 2, h * 2, fractions.Fraction(24),
                          bits=10) as wr:
        for f in decoded:
            x_t = torch.from_numpy(
                f[None].astype(np.float32) / 255.0).permute(0, 3, 1, 2)
            y = torch_srvgg_forward(params, x_t, cfg)
            y = y.permute(0, 2, 3, 1).numpy()[0]
            u8 = np.clip(y * 255.0 + 0.5, 0, 255).astype(np.uint8)
            wr.write(u8)

    report = _compare_reference_main(ours, ref_path, capsys)
    assert report["frames"] == n
    assert report["pass_50db"] is True, report
    assert report["psnr_min"] >= 50.0, report

    # and the gate actually discriminates: a corrupted output fails it
    bad = str(tmp_path / "bad.y4m")
    with writer.Y4MWriter(bad, w * 2, h * 2, fractions.Fraction(24)) as wr:
        for f in reader.Y4MReader(ours).read_range(0, n):
            wr.write(np.roll(f, 5, axis=1))  # 5-px shift ~= badly wrong
    report_bad = _compare_reference_main(bad, ref_path, capsys)
    assert report_bad["pass_50db"] is False, report_bad


@pytest.mark.slow
def test_int8_turbo_acceptance_end_to_end(tmp_path, capsys):
    """The documented int8 certification flow: run the pipeline twice
    (bf16-default vs --dtype int8) on the same clip and certify the turbo
    output against the default output with the acceptance script's --gate
    knob (int8 trades some PSNR for ~1.6x throughput; PERF.md)."""
    from reve_tpu import cli

    h, w, n = 24, 32, 6
    yy, xx = np.mgrid[0:h, 0:w]
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, w, h, fractions.Fraction(24)) as wr:
        for i in range(n):
            base = (yy * 3 + xx * 2 + i * 11) % 200 + 20
            f = np.stack([base, base + 10, base - 10], axis=-1)
            wr.write(f.clip(0, 255).astype(np.uint8))

    outs = {}
    for dtype in ("float32", "int8"):
        out = str(tmp_path / f"{dtype}.y4m")
        rc = cli.run(["-i", inp, "-s", "2", out, "--yes",
                      "--io-backend", "y4m", "-S", "3", "--batch", "2",
                      "--dtype", dtype])
        assert rc == 0
        outs[dtype] = out

    report = _compare_reference_main(outs["int8"], outs["float32"], capsys,
                                     "--gate", "40")
    assert report["frames"] == n
    assert report["gate_db"] == 40.0
    assert report["pass"] is True, report
