"""Pixel shuffle (depth-to-space) in NHWC, matching torch.nn.PixelShuffle.

torch semantics (NCHW): out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j, h, w].
In NHWC the channel index math is identical on the last axis.
"""

from __future__ import annotations

import numpy as np

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


def pixel_shuffle_rowphase(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """pixel_shuffle, reformulated so NO intermediate carries a tiny
    minor dimension.

    The classic reshape-transpose materializes a (B, H, r, W, r, C)
    tensor whose minor dim is the size-r shuffle axis; at 4K this stack's
    layout assignment lane-pads r=4 to 128 (a 32x-inflated 25 GB copy,
    PERF.md round 3).  Here instead: one static channel permutation
    (torch's (c, i, j) order -> (i, j, c)), a free reshape per row phase
    ((B, H, W, r*C) -> (B, H, W*r, C)), and a stack over the r row
    phases — every intermediate keeps (W*r, C)-contiguous minor dims
    that merge into full lanes.  Bit-identical to pixel_shuffle (pure
    permutation; asserted in tests/test_srvgg_model.py)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    # channel index in torch order: ch = c*r*r + i*r + j; select (i, j, c)
    i_, j_, c_ = np.meshgrid(np.arange(r), np.arange(r), np.arange(c),
                             indexing="ij")
    perm = (c_ * r * r + i_ * r + j_).reshape(-1)
    x = x[..., jnp.asarray(perm)]                 # (B, H, W, r*(r*c))
    x = x.reshape(b, h, w, r, r * c)
    rows = [x[:, :, :, i, :].reshape(b, h, w * r, c) for i in range(r)]
    return jnp.stack(rows, axis=2).reshape(b, h * r, w * r, c)


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
