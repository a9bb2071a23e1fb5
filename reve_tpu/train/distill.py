"""Teacher -> student distillation (the PERF.md channel-widening path).

The N=64 output-channel convolutions of realesr-animevideov3 leave half
the MXU columns idle; C=128 convolutions cost the SAME wall time on a TPU
(lane padding, PERF.md "Paths past the N=64 wall").  Distilling the
64-feature teacher into a wider (or differently shaped) student therefore
buys quality at zero inference cost — the training-side counterpart the
reference ecosystem gets from upstream Real-ESRGAN finetuning.

The machinery is a thin layer over the standard Trainer: distillation is
supervised training where the target batch is teacher(lr) instead of a
ground-truth HR frame, optionally mixed with real HR targets when they
exist (`hr_weight`).

Driven by scripts/distill.py; tested in tests/test_train_distill.py.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reve_tpu.models import srvgg
from reve_tpu.train.trainer import TrainConfig, Trainer


@dataclasses.dataclass
class DistillConfig:
    steps: int = 1000
    batch: int = 8
    patch: int = 64              # LR patch size fed to both nets
    hr_weight: float = 0.0       # 0 = pure distillation
    log_every: int = 50


class Distiller:
    """Owns a frozen teacher and a student Trainer."""

    def __init__(self, teacher_cfg: srvgg.SRVGGConfig, teacher_params,
                 student_cfg: srvgg.SRVGGConfig,
                 tc: Optional[TrainConfig] = None, mesh=None, seed: int = 0):
        if teacher_cfg.upscale != student_cfg.upscale:
            raise ValueError("teacher/student scale mismatch")
        self.teacher_cfg = teacher_cfg
        self.teacher_params = jax.device_put(teacher_params)
        self.trainer = Trainer(student_cfg, tc=tc, mesh=mesh, seed=seed)

        @jax.jit
        def _teach(params, lr_batch):
            return jnp.clip(
                srvgg.apply(params, lr_batch, cfg=teacher_cfg,
                            compute_dtype=jnp.float32), 0.0, 1.0)

        self._teach = _teach

    def teacher_targets(self, lr_batch: np.ndarray) -> jax.Array:
        return self._teach(self.teacher_params, lr_batch)

    def step(self, lr_batch: np.ndarray,
             hr_batch: Optional[np.ndarray] = None,
             hr_weight: float = 0.0) -> float:
        """One distillation step.  With hr_weight in (0, 1], the target is
        a blend of the teacher output and the real HR frame."""
        target = self.teacher_targets(lr_batch)
        if hr_batch is not None and hr_weight > 0:
            target = (1.0 - hr_weight) * target + hr_weight * jnp.asarray(
                hr_batch, jnp.float32)
        # keep the teacher output on device: shard_batch's device_put
        # accepts jax arrays, and a host round trip per step costs
        # ~0.3-0.5 s on this stack's 15-25 MB/s relay (CLAUDE.md)
        return self.trainer.step(lr_batch, target)

    def agreement_psnr(self, lr_batch: np.ndarray) -> float:
        """PSNR between student and teacher outputs (the distillation
        objective's own metric)."""
        target = self.teacher_targets(lr_batch)
        return self.trainer.eval_psnr(lr_batch, target)


def run_distillation(
    distiller: Distiller, batches: Iterator[Tuple[np.ndarray,
                                                  Optional[np.ndarray]]],
    dc: DistillConfig, log=print,
) -> list:
    """Drive `dc.steps` steps from an (lr, hr|None) batch iterator; returns
    the loss history."""
    history = []
    for step, (lr_b, hr_b) in enumerate(batches):
        if step >= dc.steps:
            break
        loss = distiller.step(lr_b, hr_b, hr_weight=dc.hr_weight)
        history.append(loss)
        if dc.log_every and step % dc.log_every == 0:
            log(f"step {step}: loss {loss:.5f}")
    return history
