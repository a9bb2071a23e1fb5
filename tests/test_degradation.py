"""Real-ESRGAN second-order degradation pipeline (reve_tpu.train.degradation).

The published models (the nets inside the reference's ncnn engine) were
trained on this recipe; these tests pin kernel math, stage behavior, and the
end-to-end pipeline feeding the trainer.
"""

import numpy as np
import pytest

from reve_tpu.train import degradation as dg
from reve_tpu.train.data import DataConfig, degrade


def test_gaussian_kernel_normalized_and_symmetric():
    k = dg.gaussian_kernel(13, 1.4)
    assert k.shape == (13, 13)
    assert abs(k.sum() - 1.0) < 1e-6
    np.testing.assert_allclose(k, k.T, atol=1e-7)          # isotropic
    np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-7)
    assert k[6, 6] == k.max()


def test_anisotropic_kernel_rotates():
    k0 = dg.gaussian_kernel(21, 3.0, 0.5, theta=0.0)
    k90 = dg.gaussian_kernel(21, 3.0, 0.5, theta=np.pi / 2)
    # 90-degree rotation swaps the axes
    np.testing.assert_allclose(k90, k0.T, atol=1e-6)
    assert abs(k0.sum() - 1.0) < 1e-6


def test_generalized_and_plateau_shapes():
    base = dg.gaussian_kernel(15, 2.0)
    gen = dg.gaussian_kernel(15, 2.0, beta=3.0)            # boxier
    plat = dg.gaussian_kernel(15, 2.0, beta=1.5, plateau=True)  # heavy tails
    # plateau has heavier tails than the plain gaussian
    assert plat[0, 0] > base[0, 0]
    # generalized with beta>1 is boxier: flatter top, sharper cutoff
    c = 7
    assert gen[c, c + 2] / gen[c, c] > base[c, c + 2] / base[c, c]
    assert gen[c, c + 5] / gen[c, c] < base[c, c + 5] / base[c, c]


def test_sinc_kernel_lowpass():
    k = dg.sinc_kernel(21, np.pi / 2)
    assert abs(k.sum() - 1.0) < 1e-6
    assert np.isfinite(k).all()
    # a sinc filter rings: some taps must be negative
    assert k.min() < 0
    # filtering a constant image is identity (DC gain 1)
    img = np.full((32, 32, 3), 0.5, np.float32)
    out = dg._filter2d(img, k)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_noise_gray_vs_color():
    rng = np.random.RandomState(0)
    img = np.full((24, 24, 3), 0.5, np.float32)
    out = dg.add_noise(img, rng, gaussian_prob=1.0, noise_range=(20, 20),
                       poisson_range=(1, 1), gray_prob=1.0)
    # gray noise: all channels move together
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    out2 = dg.add_noise(img, rng, gaussian_prob=1.0, noise_range=(20, 20),
                        poisson_range=(1, 1), gray_prob=0.0)
    assert (out2[..., 0] != out2[..., 1]).any()
    assert out.min() >= 0 and out.max() <= 1


def test_poisson_noise_scales_with_strength():
    img = np.full((64, 64, 3), 0.5, np.float32)
    errs = []
    for strength in (0.1, 3.0):
        rng = np.random.RandomState(1)
        out = dg.add_noise(img, rng, gaussian_prob=0.0,
                           noise_range=(1, 1),
                           poisson_range=(strength, strength), gray_prob=0.0)
        errs.append(float(np.abs(out - img).mean()))
    assert errs[1] > errs[0] * 2  # stronger setting -> visibly more noise


def test_jpeg_quality_monotone():
    rs = np.random.RandomState(0)
    img = (rs.rand(48, 48, 3) * 0.5 + 0.25).astype(np.float32)
    e95 = np.abs(dg.jpeg_compress(img, 95) - img).mean()
    e30 = np.abs(dg.jpeg_compress(img, 30) - img).mean()
    assert e30 > e95 > 0


def test_pipeline_end_to_end_shapes_and_determinism():
    cfg = dg.DegradationConfig(scale=4)
    rs = np.random.RandomState(3)
    hr = rs.rand(96, 128, 3).astype(np.float32)
    lr1 = dg.degrade_realesrgan(hr, cfg, np.random.RandomState(7))
    lr2 = dg.degrade_realesrgan(hr, cfg, np.random.RandomState(7))
    assert lr1.shape == (24, 32, 3)
    assert lr1.dtype == np.float32
    assert lr1.min() >= 0 and lr1.max() <= 1
    np.testing.assert_array_equal(lr1, lr2)  # deterministic per seed
    lr3 = dg.degrade_realesrgan(hr, cfg, np.random.RandomState(8))
    assert (lr1 != lr3).any()                # and seed-sensitive


def test_pipeline_rejects_indivisible_dims():
    cfg = dg.DegradationConfig(scale=4)
    with pytest.raises(ValueError, match="not divisible"):
        dg.degrade_realesrgan(np.zeros((30, 32, 3), np.float32), cfg,
                              np.random.RandomState(0))


def test_data_config_selects_pipeline():
    rs = np.random.RandomState(0)
    hr = rs.rand(32, 32, 3).astype(np.float32)
    light = degrade(hr, DataConfig(scale=2), np.random.RandomState(0))
    full = degrade(hr, DataConfig(scale=2, pipeline="realesrgan"),
                   np.random.RandomState(0))
    assert light.shape == full.shape == (16, 16, 3)
    # the full pipeline degrades more than plain area downscale
    up = np.repeat(np.repeat(light, 2, 0), 2, 1)
    upf = np.repeat(np.repeat(full, 2, 0), 2, 1)
    assert np.abs(upf - hr).mean() > np.abs(up - hr).mean()


def test_trainer_accepts_realesrgan_batches():
    """One optimization step on pipeline-produced pairs (tiny net)."""
    import jax

    from reve_tpu.models import srvgg
    from reve_tpu.train.trainer import Trainer, TrainConfig
    from reve_tpu.train.data import patch_pairs_from_frames

    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 256, (64, 80, 3), np.uint8) for _ in range(2)]
    cfg = DataConfig(scale=2, patch=32, batch=4, pipeline="realesrgan")
    pairs = list(patch_pairs_from_frames(iter(frames), cfg,
                                         patches_per_frame=2))
    assert len(pairs) == 4
    lr = np.stack([p[0] for p in pairs])
    hr = np.stack([p[1] for p in pairs])
    assert lr.shape == (4, 16, 16, 3) and hr.shape == (4, 32, 32, 3)
    trainer = Trainer(srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2),
                      TrainConfig())
    loss = trainer.step(lr, hr)
    assert np.isfinite(loss)
