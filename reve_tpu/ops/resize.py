"""Integer-factor resizes matching torch.nn.functional.interpolate semantics."""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*r, W*r, C), nearest-neighbor.

    For integer scale factors this is an exact pixel repeat, identical to
    torch F.interpolate(mode='nearest', scale_factor=r) — used as the
    residual base in SRVGGNetCompact.
    """
    x = jnp.repeat(x, r, axis=1)
    return jnp.repeat(x, r, axis=2)
