"""Quality metric tests: PSNR/SSIM identities and video comparison."""

import fractions

import numpy as np
import pytest

from reve_tpu.io import writer, reader
from reve_tpu.utils import quality


def test_psnr_identity_and_scale():
    a = np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
    assert quality.psnr(a, a) == float("inf")
    noisy = np.clip(a.astype(int) + 4, 0, 255).astype(np.uint8)
    p = quality.psnr(a, noisy)
    # uniform +4 offset: mse<=16 -> psnr >= 10*log10(255^2/16) ~= 36.1
    assert 35.0 < p < 40.0


def test_ssim_identity():
    a = np.random.RandomState(1).randint(0, 256, (32, 32, 3), np.uint8)
    assert quality.ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    b = 255 - a
    assert quality.ssim(a, b) < 0.3


def test_compare_videos(tmp_path):
    pa = str(tmp_path / "a.y4m")
    pb = str(tmp_path / "b.y4m")
    rs = np.random.RandomState(2)
    frames = [
        (rs.rand(24, 32, 3) * 200 + 20).astype(np.uint8) for _ in range(5)
    ]
    for path, jitter in ((pa, 0), (pb, 2)):
        with writer.Y4MWriter(path, 32, 24, fractions.Fraction(24)) as wr:
            for f in frames:
                wr.write(np.clip(f.astype(int) + jitter, 0, 255).astype(np.uint8))
    rep = quality.compare_videos(pa, pb)
    assert rep["frames"] == 5
    assert 25 < rep["psnr_mean"] < 60
    assert rep["psnr_min"] <= rep["psnr_mean"]
    assert 0.5 < rep["ssim_mean"] <= 1.0


def test_upscale_beats_nearest_baseline(tmp_path):
    """Sanity: PSNR machinery detects that identical content scores higher
    than shifted content — used later to rank model outputs vs references."""
    base = reader.SyntheticReader.frame(3, 48, 64)
    shifted = np.roll(base, 2, axis=1)
    assert quality.psnr(base, base) > quality.psnr(base, shifted)


def test_temporal_consistency_metric():
    from reve_tpu.utils.quality import temporal_consistency

    rs = np.random.RandomState(0)
    base = rs.randint(0, 200, (16, 16, 3)).astype(np.uint8)
    steady = [base + i for i in range(5)]  # smooth ramp
    noisy = [
        (base.astype(np.int32) + rs.randint(-40, 40, base.shape)).clip(
            0, 255).astype(np.uint8)
        for _ in range(5)
    ]
    m_steady = temporal_consistency(steady)
    m_noisy = temporal_consistency(noisy)
    assert m_noisy["flicker_mean"] > 5 * m_steady["flicker_mean"]
    # ratio vs an input: identical content upsampled -> ratio ~ 1
    inp = [f[::2, ::2] for f in steady]
    m = temporal_consistency(steady, inp, scale=2)
    assert m["flicker_ratio"] is not None
    assert 0.5 < m["flicker_ratio"] < 2.0
