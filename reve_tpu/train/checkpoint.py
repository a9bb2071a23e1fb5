"""Training checkpoints: save/restore Trainer state with orbax.

Gives the trainer the same interrupt-and-resume property the video pipeline
has (segment-granularity resume is the reference's flagship feature; for
training the analog is step-granularity checkpointing).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def save(path: str, trainer, step: int) -> None:
    """Write params + optimizer state + metadata to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = {
        "params": trainer.params,
        "opt_state": trainer.opt_state,
        "step": step,
    }
    if getattr(trainer, "ema_params", None) is not None:
        state["ema_params"] = trainer.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step:08d}"), state, force=True)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(path)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore(path: str, trainer, step: Optional[int] = None) -> int:
    """Load the (latest) checkpoint into `trainer`; returns the step."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = {
        "params": trainer.params,
        "opt_state": trainer.opt_state,
        "step": 0,
    }
    trainer_has_ema = getattr(trainer, "ema_params", None) is not None
    if trainer_has_ema:
        target["ema_params"] = trainer.ema_params
    ckpt_path = os.path.join(path, f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(ckpt_path, target)
        except (ValueError, KeyError):
            # structure mismatch on the EMA key only: an EMA trainer
            # reading a pre-EMA checkpoint (drop the key, seed EMA from
            # params below) or a non-EMA trainer reading an EMA checkpoint
            # (add a template, discard the restored copy).  A second
            # failure is a genuinely bad checkpoint and propagates.
            if trainer_has_ema:
                target.pop("ema_params")
            else:
                target["ema_params"] = trainer.params
            restored = ckptr.restore(ckpt_path, target)
    # restored arrays land committed to one device; params get their mesh
    # shardings re-applied, optimizer state is rehydrated as uncommitted
    # host values (exactly like a fresh tx.init) so jit re-places it
    # consistently with the params
    import numpy as np

    import jax.numpy as jnp

    from reve_tpu.parallel import mesh as mesh_lib

    place = mesh_lib.conv_param_sharding(trainer.mesh)
    trainer.params = place(restored["params"])
    if getattr(trainer, "ema_params", None) is not None:
        trainer.ema_params = place(restored.get("ema_params",
                                                restored["params"]))
    trainer.opt_state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), restored["opt_state"]
    )
    return int(restored["step"])
