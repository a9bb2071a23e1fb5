"""GAN fine-tuning phase (reve_tpu.train.gan): U-Net SN discriminator +
alternating G/D updates, sharded over the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # GAN training steps

from reve_tpu.models import srvgg
from reve_tpu.parallel import mesh as mesh_lib
from reve_tpu.train import gan


@pytest.fixture(scope="module")
def d_params():
    return gan.unet_init(jax.random.key(0), gan.UNetDConfig(num_feat=8))


def test_unet_shapes_and_u_refresh(d_params):
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 24, 3), jnp.float32)
    logits, new_u = gan.unet_apply(d_params, x)
    assert logits.shape == (2, 16, 24, 1)
    assert set(new_u) == set(d_params)
    # power iteration must move u (fresh random u is far from converged)
    moved = sum(
        float(jnp.abs(new_u[k] - d_params[k]["u"]).max()) > 1e-4
        for k in new_u
    )
    assert moved >= 8


def test_spectral_norm_bounds_singular_value(d_params):
    """After a few power iterations, the normalized kernel's top singular
    value is ~1 regardless of the raw kernel's scale."""
    p = {**d_params["conv0"]}
    p["w"] = p["w"] * 37.0  # blow up the raw scale
    for _ in range(8):
        _, u = gan._sn_normalize(p)
        p = {**p, "u": u}
    w_sn, _ = gan._sn_normalize(p)
    sigma = jnp.linalg.norm(
        w_sn.reshape(-1, w_sn.shape[-1]), 2
    )
    assert 0.9 < float(sigma) < 1.1


def test_bce_logits_direction():
    good = gan.bce_logits(jnp.full((4, 4, 4, 1), 5.0), 1.0)
    bad = gan.bce_logits(jnp.full((4, 4, 4, 1), -5.0), 1.0)
    assert float(good) < 0.1 < float(bad)


def test_gan_trainer_steps_and_d_learns():
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(jax.devices()[:2], max_sp=1)
    trainer = gan.GANTrainer(
        cfg, gan.GANConfig(g_lr=1e-3, d_lr=1e-3), mesh=mesh)
    # make D's job easy: real images are smooth, G starts ~random
    rs = np.random.RandomState(0)
    lr_batch = rs.rand(2, 16, 16, 3).astype(np.float32)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    hr = np.stack([np.stack([yy, xx, (yy + xx) / 2], -1)] * 2)
    hr_batch = hr.astype(np.float32)

    m0 = trainer.step(lr_batch, hr_batch)
    assert all(np.isfinite(v) for v in m0.values())
    d_losses = [m0["d_loss"]]
    for _ in range(12):
        d_losses.append(trainer.step(lr_batch, hr_batch)["d_loss"])
    # D separates real from fake on a fixed batch within a few steps
    assert min(d_losses[4:]) < d_losses[0]
    assert min(d_losses) < 1.2  # below the ~1.39 chance level


def test_gan_trainer_uses_full_mesh():
    """The alternating step compiles and runs with batch sharded over all
    8 virtual devices (dp x sp)."""
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(max_sp=2)
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8
    trainer = gan.GANTrainer(cfg, mesh=mesh)
    rs = np.random.RandomState(1)
    lr_batch = rs.rand(4, 16, 16, 3).astype(np.float32)
    hr_batch = rs.rand(4, 32, 32, 3).astype(np.float32)
    m = trainer.step(lr_batch, hr_batch)
    assert all(np.isfinite(v) for v in m.values())


def test_extra_g_loss_hook():
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(jax.devices()[:1], max_sp=1)

    def extra(fake, hr):
        return 123.0 * jnp.mean((fake - hr) ** 2) * 0 + 50.0

    trainer = gan.GANTrainer(cfg, mesh=mesh, extra_g_loss=extra)
    rs = np.random.RandomState(2)
    m = trainer.step(rs.rand(1, 16, 16, 3).astype(np.float32),
                     rs.rand(1, 32, 32, 3).astype(np.float32))
    assert m["g_total"] > 49.0  # the hook's constant landed in the loss


def test_gan_trainer_ema_generator():
    """GAN phase keeps an EMA generator (upstream net_g_ema convention):
    seeded from init, updated leafwise, returned by export_params."""
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    mesh = mesh_lib.make_mesh(jax.devices()[:2], max_sp=1)
    trainer = gan.GANTrainer(
        cfg, gan.GANConfig(g_lr=1e-3, d_lr=1e-3, ema_decay=0.5), mesh=mesh)
    g0 = jax.tree_util.tree_map(np.asarray, trainer.g_params)
    rs = np.random.RandomState(0)
    lr_batch = rs.rand(2, 16, 16, 3).astype(np.float32)
    hr_batch = rs.rand(2, 32, 32, 3).astype(np.float32)
    trainer.step(lr_batch, hr_batch)
    g1 = jax.tree_util.tree_map(np.asarray, trainer.g_params)
    want = jax.tree_util.tree_map(lambda a, b: 0.5 * a + 0.5 * b, g0, g1)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, trainer.g_ema))):
        np.testing.assert_allclose(g, w, rtol=1e-6)
    assert trainer.export_params() is trainer.g_ema

    off = gan.GANTrainer(cfg, gan.GANConfig(ema_decay=0.0), mesh=mesh)
    assert off.g_ema is None
    assert off.export_params() is off.g_params
