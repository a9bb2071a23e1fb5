"""Pixel shuffle (depth-to-space) in NHWC, matching torch.nn.PixelShuffle.

torch semantics (NCHW): out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j, h, w].
In NHWC the channel index math is identical on the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r_i, W, r_j, C
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r) — inverse of pixel_shuffle.

    Used by RealESRGAN RRDBNet variants that pixel-unshuffle the input for
    upscale < 4.
    """
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    if h * r != hr or w * r != wr:
        raise ValueError(f"spatial dims ({hr},{wr}) not divisible by r={r}")
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, r_i, r_j
    return x.reshape(b, h, w, c * r * r)
