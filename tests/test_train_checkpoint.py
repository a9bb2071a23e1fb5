"""Trainer checkpoint/resume: save mid-training, restore, bit-identical."""

import numpy as np
import jax

from reve_tpu.models import srvgg
from reve_tpu.parallel import mesh as mesh_lib
from reve_tpu.train import checkpoint
from reve_tpu.train.trainer import Trainer, TrainConfig


def _data():
    rs = np.random.RandomState(0)
    hr = rs.rand(8, 16, 16, 3).astype(np.float32)
    return hr[:, ::2, ::2, :], hr


def test_save_restore_roundtrip(tmp_path):
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(jax.devices())
    lr, hr = _data()

    t1 = Trainer(cfg, TrainConfig(learning_rate=1e-3), mesh=mesh, seed=5)
    for _ in range(3):
        t1.step(lr, hr)
    checkpoint.save(str(tmp_path / "ckpt"), t1, step=3)
    loss_after_4 = t1.step(lr, hr)

    # fresh trainer (different seed -> different params before restore)
    t2 = Trainer(cfg, TrainConfig(learning_rate=1e-3), mesh=mesh, seed=99)
    step = checkpoint.restore(str(tmp_path / "ckpt"), t2)
    assert step == 3
    # restored params equal t1's state AT step 3, so one more step must
    # reproduce t1's step-4 loss exactly
    loss2 = t2.step(lr, hr)
    assert loss2 == loss_after_4


def test_latest_step(tmp_path):
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    t = Trainer(cfg, mesh=mesh_lib.make_mesh(jax.devices()))
    assert checkpoint.latest_step(str(tmp_path / "none")) is None
    checkpoint.save(str(tmp_path / "c"), t, step=1)
    checkpoint.save(str(tmp_path / "c"), t, step=7)
    assert checkpoint.latest_step(str(tmp_path / "c")) == 7


def test_ema_roundtrip_and_pre_ema_compat(tmp_path):
    """EMA params survive save/restore bit-exactly; a checkpoint written
    without EMA (ema_decay=0 trainer) restores into an EMA trainer by
    seeding EMA from params."""
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(jax.devices())
    lr, hr = _data()

    t1 = Trainer(cfg, TrainConfig(learning_rate=1e-3, ema_decay=0.5),
                 mesh=mesh, seed=5)
    for _ in range(3):
        t1.step(lr, hr)
    checkpoint.save(str(tmp_path / "ck"), t1, step=3)
    t2 = Trainer(cfg, TrainConfig(learning_rate=1e-3, ema_decay=0.5),
                 mesh=mesh, seed=99)
    checkpoint.restore(str(tmp_path / "ck"), t2)
    for a, b in zip(jax.tree_util.tree_leaves(t1.ema_params),
                    jax.tree_util.tree_leaves(t2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pre-EMA checkpoint -> EMA trainer
    t3 = Trainer(cfg, TrainConfig(learning_rate=1e-3, ema_decay=0.0),
                 mesh=mesh, seed=5)
    t3.step(lr, hr)
    checkpoint.save(str(tmp_path / "old"), t3, step=1)
    t4 = Trainer(cfg, TrainConfig(learning_rate=1e-3, ema_decay=0.9),
                 mesh=mesh, seed=99)
    checkpoint.restore(str(tmp_path / "old"), t4)
    for a, b in zip(jax.tree_util.tree_leaves(t3.params),
                    jax.tree_util.tree_leaves(t4.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
