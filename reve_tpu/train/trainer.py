"""Distributed fine-tuning / distillation of SRVGG upscalers.

The reference has no training at all (the net lives in a frozen ncnn binary);
this is a new capability: fine-tune `realesr-animevideov3` on your own
footage, or distill it into a smaller num_conv variant, sharded over a TPU
mesh.

Parallelism (idiomatic jax.sharding — no hand-written collectives):
  * batch:  (B, H, W, 3) sharded B->dp, H->sp (reve_tpu.parallel.mesh);
    gradients are averaged across dp by XLA from the sharding annotations
    (the mean over batch dim *is* the psum — no explicit pmean needed).
  * params: replicated; XLA inserts the halo exchanges for spatially
    sharded convs and the reduce-scatter/all-reduce for grads.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from reve_tpu.models import srvgg
from reve_tpu.parallel import mesh as mesh_lib
from reve_tpu.train import losses


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    loss: str = "charbonnier"   # charbonnier | l1
    # exponential moving average of the generator params (the upstream
    # Real-ESRGAN training convention, ema_decay=0.999); 0 disables.
    # The EMA copy is what gets exported/evaluated — it smooths the last
    # few thousand SGD steps into a lower-variance model.
    ema_decay: float = 0.999


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    steps = [optax.clip_by_global_norm(tc.grad_clip)]
    if tc.weight_decay:
        steps.append(optax.add_decayed_weights(tc.weight_decay))
    steps.append(optax.adam(tc.learning_rate))
    return optax.chain(*steps)


def loss_fn(params, lr_batch, hr_batch, *, cfg: srvgg.SRVGGConfig,
            loss: str = "charbonnier"):
    pred = srvgg.apply(params, lr_batch, cfg=cfg,
                       compute_dtype=jnp.float32)
    fn = losses.charbonnier if loss == "charbonnier" else losses.l1
    return fn(pred, hr_batch)


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "loss"))
def train_step(params, opt_state, lr_batch, hr_batch, *,
               cfg: srvgg.SRVGGConfig, tx: optax.GradientTransformation,
               loss: str = "charbonnier"):
    """One optimizer step; shardings flow from the input arrays."""
    loss_val, grads = jax.value_and_grad(loss_fn)(
        params, lr_batch, hr_batch, cfg=cfg, loss=loss
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_val


def shard_host_batch(bs, lr_batch, hr_batch):
    """Place a host batch under the mesh batch sharding.

    Multi-host (jax.distributed): each process feeds its LOCAL shard of
    the global batch — the global batch is the concatenation over
    process_index order.  device_put of a full global batch there would
    silently treat every process's (different) data as the same global
    array; building the array from process-local shards is the multi-host
    contract (tests/test_distributed.py proves loss-equality with the
    concatenated single-process run)."""
    if jax.process_count() > 1:
        import numpy as np

        return (
            jax.make_array_from_process_local_data(bs, np.asarray(lr_batch)),
            jax.make_array_from_process_local_data(bs, np.asarray(hr_batch)),
        )
    return jax.device_put(lr_batch, bs), jax.device_put(hr_batch, bs)


@functools.partial(jax.jit, static_argnames=("decay",))
def ema_update(ema_params, params, *, decay: float):
    """ema <- decay*ema + (1-decay)*params, leafwise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


class Trainer:
    """Owns params/optimizer state with mesh shardings applied."""

    def __init__(self, cfg: srvgg.SRVGGConfig,
                 tc: Optional[TrainConfig] = None,
                 mesh: Optional[Mesh] = None,
                 params=None, seed: int = 0):
        self.cfg = cfg
        self.tc = tc or TrainConfig()
        self.mesh = mesh or mesh_lib.make_mesh()
        self.tx = make_optimizer(self.tc)
        if params is None:
            params = srvgg.init_params(jax.random.key(seed), cfg)
        # params: replicated on dp/sp; output-channel sharded over tp when
        # the mesh has a tp axis.  Optimizer state inherits the shardings.
        place = mesh_lib.conv_param_sharding(self.mesh)
        self.params = place(params)
        self.opt_state = self.tx.init(self.params)
        self.ema_params = self.params if self.tc.ema_decay else None
        self._bs = mesh_lib.batch_sharding(self.mesh)

    def shard_batch(self, lr_batch, hr_batch):
        return shard_host_batch(self._bs, lr_batch, hr_batch)

    def step(self, lr_batch, hr_batch) -> float:
        lr_batch, hr_batch = self.shard_batch(lr_batch, hr_batch)
        self.params, self.opt_state, loss_val = train_step(
            self.params, self.opt_state, lr_batch, hr_batch,
            cfg=self.cfg, tx=self.tx, loss=self.tc.loss,
        )
        if self.ema_params is not None:
            self.ema_params = ema_update(self.ema_params, self.params,
                                         decay=self.tc.ema_decay)
        return float(loss_val)

    def export_params(self):
        """Params to ship: the EMA copy when enabled, else the live ones."""
        return self.ema_params if self.ema_params is not None else self.params

    def eval_psnr(self, lr_batch, hr_batch) -> float:
        lr_batch, hr_batch = self.shard_batch(lr_batch, hr_batch)
        pred = srvgg.apply(self.params, lr_batch, cfg=self.cfg,
                           compute_dtype=jnp.float32)
        return float(losses.psnr(jnp.clip(pred, 0, 1), hr_batch))
