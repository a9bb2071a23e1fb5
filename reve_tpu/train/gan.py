"""GAN fine-tuning: U-Net discriminator + adversarial loss.

The published Real-ESRGAN models (the nets inside the reference's ncnn
engine, reve-shared/src/lib.rs:134-147) are trained in two phases: a
PSNR-oriented phase (reve_tpu.train.trainer) and a GAN phase with a U-Net
discriminator under spectral normalization and a vanilla (BCE-with-logits,
per-pixel) adversarial loss.  This module provides that second phase as a
from-scratch functional-JAX implementation:

  * `unet_init` / `unet_apply` — the U-Net discriminator: 3 downsampling
    stride-2 convs, 3 bilinear-upsample convs with skip connections, two
    3x3 tail convs to 1-channel per-pixel logits.
  * Spectral normalization, functionally: every conv kernel carries a
    power-iteration vector `u` in its param dict; each forward pass
    normalizes w by its leading singular value estimated from `u`
    (stop-gradient) and returns refreshed `u`s as an aux output, which the
    train step writes back — SN state advances exactly once per D step.
  * `GANTrainer` — alternating G/D optimization over a dp(x sp) mesh with
    the same sharding-annotation-driven parallelism as the PSNR trainer.
    G loss = pixel loss + gan_weight * BCE(D(fake), 1); the perceptual
    term in the published recipe needs pretrained VGG19 features, which
    this image cannot ship — the hook (`extra_g_loss`) is exposed.

Everything here is new capability relative to the reference (which cannot
train at all); it completes the published models' training recipe together
with reve_tpu.train.degradation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from reve_tpu.models import srvgg
from reve_tpu.parallel import mesh as mesh_lib
from reve_tpu.train import losses
from reve_tpu.train import trainer as trainer_mod
from reve_tpu.train.trainer import TrainConfig, make_optimizer


@dataclasses.dataclass(frozen=True)
class UNetDConfig:
    num_in_ch: int = 3
    num_feat: int = 64


# ------------------------------------------------------- spectral-norm conv


def _sn_conv_init(key, cin, cout, k=3):
    wkey, ukey = jax.random.split(key)
    fan = cin * k * k
    w = jax.random.normal(wkey, (k, k, cin, cout), jnp.float32) \
        * (2.0 / fan) ** 0.5
    u = jax.random.normal(ukey, (cout,), jnp.float32)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32),
            "u": u / (jnp.linalg.norm(u) + 1e-12)}


def _sn_normalize(p):
    """One power iteration from the stored u; returns (w_sn, new_u).

    Standard (Miyato) SN: the power-iteration VECTORS are detached, but
    sigma = v^T W u keeps its dependence on W, so dL/dW carries the
    -(v^T g u) W / sigma^2 correction — exactly what torch's
    spectral_norm (the published Real-ESRGAN discriminator) does."""
    w = p["w"]
    mat = w.reshape(-1, w.shape[-1])          # (k*k*cin, cout)
    u = p["u"]
    v = mat @ u
    v = jax.lax.stop_gradient(v / (jnp.linalg.norm(v) + 1e-12))
    u_new = mat.T @ v
    u_new = jax.lax.stop_gradient(
        u_new / (jnp.linalg.norm(u_new) + 1e-12))
    sigma = v @ (mat @ u_new)
    w_sn = w / (sigma + 1e-12)
    return w_sn, u_new


def _sn_conv(x, p, stride=1):
    w, u_new = _sn_normalize(p)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"], u_new


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


# ---------------------------------------------------------- discriminator


_LAYERS = ("conv0", "down1", "down2", "down3",
           "up3", "up2", "up1", "tail1", "tail2", "out")


def unet_init(key: jax.Array, cfg: UNetDConfig):
    nf = cfg.num_feat
    keys = jax.random.split(key, len(_LAYERS))
    dims = {
        "conv0": (cfg.num_in_ch, nf),
        "down1": (nf, nf * 2), "down2": (nf * 2, nf * 4),
        "down3": (nf * 4, nf * 8),
        "up3": (nf * 8, nf * 4), "up2": (nf * 4, nf * 2),
        "up1": (nf * 2, nf),
        "tail1": (nf, nf), "tail2": (nf, nf), "out": (nf, 1),
    }
    return {name: _sn_conv_init(k, *dims[name])
            for name, k in zip(_LAYERS, keys)}


def unet_apply(params, x):
    """(B, H, W, 3) in [0,1] -> per-pixel logits (B, H, W, 1) + refreshed
    SN power-iteration vectors.  H and W must be divisible by 8."""
    new_u = {}

    def conv(name, v, stride=1):
        y, u = _sn_conv(v, params[name], stride)
        new_u[name] = u
        return y

    x0 = _lrelu(conv("conv0", x))
    x1 = _lrelu(conv("down1", x0, 2))
    x2 = _lrelu(conv("down2", x1, 2))
    x3 = _lrelu(conv("down3", x2, 2))
    y3 = _lrelu(conv("up3", _up2(x3))) + x2      # skip connections
    y2 = _lrelu(conv("up2", _up2(y3))) + x1
    y1 = _lrelu(conv("up1", _up2(y2))) + x0
    t = _lrelu(conv("tail1", y1))
    t = _lrelu(conv("tail2", t))
    logits = conv("out", t)
    return logits, new_u


def write_back_u(params, new_u):
    return {name: {**params[name], "u": new_u[name]} for name in params}


# ----------------------------------------------------------------- losses


def bce_logits(logits, target: float):
    z = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, z))


# ------------------------------------------------------------ train steps


@dataclasses.dataclass(frozen=True)
class GANConfig:
    pixel_weight: float = 1.0
    gan_weight: float = 0.1
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    # EMA of the generator (the upstream Real-ESRGAN GAN-phase convention,
    # net_g_ema with decay 0.999); the EMA copy is what ships.  0 disables.
    ema_decay: float = 0.999


def _g_loss_fn(g_params, d_params, lr_batch, hr_batch, *, cfg, gc,
               pixel_loss, extra_g_loss):
    fake = srvgg.apply(g_params, lr_batch, cfg=cfg,
                       compute_dtype=jnp.float32)
    fn = losses.charbonnier if pixel_loss == "charbonnier" else losses.l1
    pix = fn(fake, hr_batch)
    logits, _ = unet_apply(d_params, fake)
    adv = bce_logits(logits, 1.0)
    total = gc.pixel_weight * pix + gc.gan_weight * adv
    if extra_g_loss is not None:
        total = total + extra_g_loss(fake, hr_batch)
    return total, (pix, adv)


def _d_loss_fn(d_params, fake, hr_batch):
    real_logits, new_u = unet_apply(d_params, hr_batch)
    fake_logits, _ = unet_apply(d_params, fake)
    loss = bce_logits(real_logits, 1.0) + bce_logits(fake_logits, 0.0)
    return loss, new_u


@functools.partial(
    jax.jit, static_argnames=("cfg", "gc", "g_tx", "d_tx", "pixel_loss",
                              "extra_g_loss"))
def gan_step(g_params, d_params, g_opt, d_opt, lr_batch, hr_batch, *,
             cfg, gc: GANConfig, g_tx, d_tx, pixel_loss="l1",
             extra_g_loss=None):
    """One alternating G+D update (G first, on the CURRENT D — upstream
    order); returns new states + scalar metrics."""
    (g_total, (pix, adv)), g_grads = jax.value_and_grad(
        _g_loss_fn, has_aux=True)(
            g_params, d_params, lr_batch, hr_batch, cfg=cfg, gc=gc,
            pixel_loss=pixel_loss, extra_g_loss=extra_g_loss)
    g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
    g_params = optax.apply_updates(g_params, g_updates)

    fake = jax.lax.stop_gradient(
        srvgg.apply(g_params, lr_batch, cfg=cfg, compute_dtype=jnp.float32))
    (d_loss, new_u), d_grads = jax.value_and_grad(
        _d_loss_fn, has_aux=True)(d_params, fake, hr_batch)
    d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
    d_params = write_back_u(optax.apply_updates(d_params, d_updates), new_u)

    metrics = {"g_total": g_total, "pixel": pix, "g_adv": adv,
               "d_loss": d_loss}
    return g_params, d_params, g_opt, d_opt, metrics


class GANTrainer:
    """Alternating G/D fine-tuning over a dp(x sp) mesh.

    extra_g_loss: optional (fake, hr) -> scalar hook (e.g. a perceptual
    loss once pretrained feature weights are available on disk)."""

    def __init__(self, cfg: srvgg.SRVGGConfig,
                 gc: Optional[GANConfig] = None,
                 mesh: Optional[Mesh] = None,
                 g_params=None, seed: int = 0,
                 pixel_loss: str = "l1",
                 extra_g_loss: Optional[Callable] = None):
        self.cfg = cfg
        self.gc = gc or GANConfig()
        self.mesh = mesh or mesh_lib.make_mesh()
        self.pixel_loss = pixel_loss
        self.extra_g_loss = extra_g_loss
        if g_params is None:
            g_params = srvgg.init_params(jax.random.key(seed), cfg)
        d_params = unet_init(jax.random.key(seed + 1), UNetDConfig())
        place = mesh_lib.conv_param_sharding(self.mesh)
        rep = mesh_lib.replicated(self.mesh)
        self.g_params = place(g_params)
        self.d_params = jax.device_put(d_params, rep)
        self.g_tx = make_optimizer(TrainConfig(learning_rate=self.gc.g_lr,
                                               loss=pixel_loss))
        self.d_tx = make_optimizer(TrainConfig(learning_rate=self.gc.d_lr))
        self.g_opt = self.g_tx.init(self.g_params)
        self.d_opt = self.d_tx.init(self.d_params)
        self.g_ema = self.g_params if self.gc.ema_decay else None
        self._bs = mesh_lib.batch_sharding(self.mesh)

    def step(self, lr_batch, hr_batch) -> dict:
        lr_batch, hr_batch = trainer_mod.shard_host_batch(
            self._bs, lr_batch, hr_batch)
        (self.g_params, self.d_params, self.g_opt, self.d_opt,
         metrics) = gan_step(
            self.g_params, self.d_params, self.g_opt, self.d_opt,
            lr_batch, hr_batch, cfg=self.cfg, gc=self.gc,
            g_tx=self.g_tx, d_tx=self.d_tx, pixel_loss=self.pixel_loss,
            extra_g_loss=self.extra_g_loss,
        )
        if self.g_ema is not None:
            self.g_ema = trainer_mod.ema_update(self.g_ema, self.g_params,
                                                decay=self.gc.ema_decay)
        return {k: float(v) for k, v in metrics.items()}

    def export_params(self):
        """Generator to ship: the EMA copy when enabled, else live."""
        return self.g_ema if self.g_ema is not None else self.g_params
