"""Device mesh construction for multi-chip execution.

The workload's cross-device strategies (SURVEY.md §2.3 TPU mapping):
  * 'dp'  — data parallelism over frames/segments (the dominant axis: video
            segments are embarrassingly parallel, reference overlap design).
  * 'sp'  — spatial parallelism over image rows for frames too large for one
            chip's HBM; XLA inserts the conv halo exchanges automatically
            when H is sharded.
  * 'tp'  — tensor parallelism over conv output channels (optional; this
            CNN is small enough that tp mainly exists for training larger
            distilled variants — PP/EP genuinely have no counterpart here,
            documented in SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_devices(n: int, max_sp: int = 2,
                   max_tp: int = 1) -> Tuple[int, int, int]:
    """Split n devices into (dp, sp, tp). sp/tp stay small — spatial
    sharding pays a halo exchange per conv and tp an all-reduce per layer,
    so frames-first (dp) is the right default."""
    tp = 1
    for cand in range(min(max_tp, n), 0, -1):
        if n % cand == 0:
            tp = cand
            break
    rem = n // tp
    sp = 1
    for cand in range(min(max_sp, rem), 0, -1):
        if rem % cand == 0:
            sp = cand
            break
    return rem // sp, sp, tp


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Tuple[str, ...] = ("dp", "sp"),
              max_sp: int = 2, max_tp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, sp, tp = factor_devices(len(devices), max_sp=max_sp, max_tp=max_tp)
    if "tp" in axis_names:
        arr = np.array(devices).reshape(dp, sp, tp)
        return Mesh(arr, ("dp", "sp", "tp"))
    assert tp == 1, "tp > 1 requires a 'tp' axis"
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches: B over dp, H over sp; replicated over tp."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def conv_param_sharding(mesh: Mesh):
    """Shard srvgg params for tensor parallelism: conv kernels (3,3,ci,co)
    and biases/alphas split on the output-channel dim over 'tp'.  XLA
    partitions each conv's output channels and inserts the collectives.
    Returns a pytree-mapping function."""
    if "tp" not in mesh.axis_names:
        rep = replicated(mesh)
        return lambda tree: jax.device_put(tree, rep)

    w_sh = NamedSharding(mesh, P(None, None, None, "tp"))
    v_sh = NamedSharding(mesh, P("tp"))
    rep = replicated(mesh)

    def place(tree):
        def leaf(path, x):
            if x.ndim == 4:
                return jax.device_put(x, w_sh)
            if x.ndim == 1 and x.shape[0] % mesh.shape["tp"] == 0:
                return jax.device_put(x, v_sh)
            return jax.device_put(x, rep)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    return place
