"""Device mesh construction for multi-chip execution.

The workload's cross-device strategies (SURVEY.md §2.3 TPU mapping):
  * 'dp'  — data parallelism over frames/segments (the dominant axis: video
            segments are embarrassingly parallel, reference overlap design).
  * 'sp'  — spatial parallelism over image rows for frames too large for one
            chip's HBM; XLA inserts the conv halo exchanges automatically
            when H is sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_devices(n: int, max_sp: int = 2) -> Tuple[int, int]:
    """Split n devices into (dp, sp). sp stays small — spatial sharding pays
    halo-exchange cost per conv, so frames-first (dp) is the right default."""
    sp = 1
    for cand in range(min(max_sp, n), 0, -1):
        if n % cand == 0:
            sp = cand
            break
    return n // sp, sp


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Tuple[str, str] = ("dp", "sp"),
              max_sp: int = 2) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, sp = factor_devices(len(devices), max_sp=max_sp)
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches: B over dp, H over sp."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
