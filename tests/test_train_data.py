"""Training data pipeline tests + a short end-to-end fine-tune."""

import fractions

import numpy as np

from reve_tpu.io import writer, reader
from reve_tpu.train import data


def test_area_downscale_exact():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = data._area_downscale(img, 2)
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == (0 + 1 + 4 + 5) / 4


def test_degrade_shapes_and_range():
    cfg = data.DataConfig(scale=2, patch=32, noise_std=0.05)
    rng = np.random.RandomState(0)
    hr = rng.rand(32, 32, 3).astype(np.float32)
    lr = data.degrade(hr, cfg, rng)
    assert lr.shape == (16, 16, 3)
    assert lr.min() >= 0 and lr.max() <= 1


def test_batches_from_video(tmp_path):
    path = str(tmp_path / "train.y4m")
    with writer.Y4MWriter(path, 96, 72, fractions.Fraction(24)) as wr:
        for i in range(30):
            wr.write(reader.SyntheticReader.frame(i, 72, 96))
    cfg = data.DataConfig(scale=2, patch=48, batch=4, seed=1)
    batches = list(data.batches_from_video(path, cfg, frame_stride=5))
    assert len(batches) >= 2
    lr, hr = batches[0]
    assert lr.shape == (4, 24, 24, 3)
    assert hr.shape == (4, 48, 48, 3)
    assert lr.dtype == np.float32


def test_finetune_reduces_loss(tmp_path):
    """Real data path + real trainer: loss must drop on a tiny model."""
    import jax

    from reve_tpu.models import srvgg
    from reve_tpu.parallel import mesh as mesh_lib
    from reve_tpu.train.trainer import Trainer, TrainConfig

    path = str(tmp_path / "train.y4m")
    with writer.Y4MWriter(path, 96, 72, fractions.Fraction(24)) as wr:
        for i in range(20):
            wr.write(reader.SyntheticReader.frame(i, 72, 96))

    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    trainer = Trainer(cfg, TrainConfig(learning_rate=3e-3),
                      mesh=mesh_lib.make_mesh(jax.devices()))
    dcfg = data.DataConfig(scale=2, patch=32, batch=8, seed=0)
    losses = []
    for epoch in range(6):
        for lr, hr in data.batches_from_video(path, dcfg, frame_stride=4):
            losses.append(trainer.step(lr, hr))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
