"""Colorspace conversion ops (YUV 4:2:0 <-> RGB), jit-compatible.

The reference pipeline moves frames as PNG files (RGB) and lets ffmpeg do all
colorspace work (decode: reve-shared/src/lib.rs:100-119; encode to
yuv420p10le: reve-cli/src/main.rs:317-318).  In this framework frames can move
as raw YUV 4:2:0 planes (the native decoder output), so the YUV->RGB->model->
RGB->YUV conversions run on the TPU as part of the fused inference graph —
saving a host-side swscale pass and 2/3 of the host->device transfer bytes
(12 bits/pixel YUV 4:2:0 vs 24 bits/pixel RGB).

Supported matrices: BT.601 and BT.709, limited (studio) and full range.
Output encode path supports 8-bit and 10-bit (yuv420p10le, the reference's
default encode pix_fmt).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# K_r / K_b luma coefficients per matrix
_MATRIX = {
    "bt601": (0.299, 0.114),
    "bt709": (0.2126, 0.0722),
}


def _coeffs(matrix: str) -> Tuple[float, float, float]:
    kr, kb = _MATRIX[matrix]
    kg = 1.0 - kr - kb
    return kr, kg, kb


def yuv_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array, *,
               matrix: str = "bt709", full_range: bool = False) -> jax.Array:
    """Convert same-resolution normalized YUV planes to RGB in [0, 1].

    Args:
      y, u, v: float arrays, y in [0,1] (already range-normalized: see
        `normalize_yuv`), u/v centered at 0 in [-0.5, 0.5].
    Returns RGB stacked on a new last axis.
    """
    kr, kg, kb = _coeffs(matrix)
    del full_range  # range handling happens in normalize_yuv
    r = y + 2.0 * (1.0 - kr) * v
    b = y + 2.0 * (1.0 - kb) * u
    g = y - (2.0 * kr * (1.0 - kr) / kg) * v - (2.0 * kb * (1.0 - kb) / kg) * u
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_yuv(rgb: jax.Array, *, matrix: str = "bt709") -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RGB in [0,1] -> normalized (y in [0,1], u/v in [-0.5, 0.5])."""
    kr, kg, kb = _coeffs(matrix)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = kr * r + kg * g + kb * b
    u = (b - y) / (2.0 * (1.0 - kb))
    v = (r - y) / (2.0 * (1.0 - kr))
    return y, u, v


def normalize_yuv(y8: jax.Array, uv8: jax.Array, *, bits: int = 8,
                  full_range: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Integer YUV code values -> normalized float (y in [0,1], uv in [-.5,.5]).

    Limited (studio) range per BT.601/709: Y in [16, 235] << (bits-8),
    C in [16, 240] << (bits-8). Full range: [0, 2^bits - 1].
    """
    scale = 1 << (bits - 8)
    y8 = y8.astype(jnp.float32)
    uv8 = uv8.astype(jnp.float32)
    if full_range:
        # chroma neutral is code 128<<(bits-8) exactly (JFIF/ffmpeg
        # convention), NOT maxv/2 = 127.5<<(bits-8): dividing by maxv and
        # subtracting 0.5 would shift every neutral pixel by half a code
        maxv = float((1 << bits) - 1)
        return y8 / maxv, (uv8 - 128.0 * scale) / maxv
    y = (y8 - 16.0 * scale) / (219.0 * scale)
    uv = (uv8 - 128.0 * scale) / (224.0 * scale)
    return y, uv


def quantize_yuv(y: jax.Array, u: jax.Array, v: jax.Array, *, bits: int = 8,
                 full_range: bool = False):
    """Normalized YUV -> integer code values (rounded, clipped).

    Returns uint8 for bits=8, uint16 for bits=10 (little-endian when
    serialized — i.e. yuv420p10le).
    """
    scale = 1 << (bits - 8)
    if full_range:
        maxv = float((1 << bits) - 1)
        yq = y * maxv
        uq = u * maxv + 128.0 * scale
        vq = v * maxv + 128.0 * scale
    else:
        yq = y * (219.0 * scale) + 16.0 * scale
        uq = u * (224.0 * scale) + 128.0 * scale
        vq = v * (224.0 * scale) + 128.0 * scale
    dtype = jnp.uint8 if bits == 8 else jnp.uint16
    hi = (1 << bits) - 1
    out = []
    for q in (yq, uq, vq):
        out.append(jnp.clip(jnp.round(q), 0, hi).astype(dtype))
    return tuple(out)


def upsample_chroma_nearest(c: jax.Array) -> jax.Array:
    """(..., H/2, W/2) -> (..., H, W) chroma doubling (matches cv2 I420->RGB)."""
    c = jnp.repeat(c, 2, axis=-2)
    return jnp.repeat(c, 2, axis=-1)


def downsample_chroma_box(c: jax.Array) -> jax.Array:
    """(..., H, W) -> (..., H/2, W/2) by 2x2 box average (ffmpeg-style 420)."""
    h, w = c.shape[-2], c.shape[-1]
    c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2)
    return c.mean(axis=(-3, -1))


@functools.partial(jax.jit, static_argnames=("matrix", "full_range", "bits"))
def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array, *,
                  matrix: str = "bt709", full_range: bool = False,
                  bits: int = 8) -> jax.Array:
    """Integer 4:2:0 planes -> RGB float32 in [0,1].

    y: (B, H, W) int codes; u, v: (B, H/2, W/2) int codes.
    Returns (B, H, W, 3) float32 (unclipped; callers clip after inference).
    """
    yn, _ = normalize_yuv(y, y, bits=bits, full_range=full_range)
    _, un = normalize_yuv(u, u, bits=bits, full_range=full_range)
    _, vn = normalize_yuv(v, v, bits=bits, full_range=full_range)
    un = upsample_chroma_nearest(un)
    vn = upsample_chroma_nearest(vn)
    return yuv_to_rgb(yn, un, vn, matrix=matrix, full_range=full_range)


@functools.partial(jax.jit, static_argnames=("matrix", "full_range", "bits"))
def rgb_to_yuv420(rgb: jax.Array, *, matrix: str = "bt709",
                  full_range: bool = False, bits: int = 10):
    """RGB float32 [0,1] -> integer 4:2:0 planes (default 10-bit, the
    reference's yuv420p10le encode format, reve-cli/src/main.rs:317-318)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    y, u, v = rgb_to_yuv(rgb, matrix=matrix)
    u = downsample_chroma_box(u)
    v = downsample_chroma_box(v)
    return quantize_yuv(y, u, v, bits=bits, full_range=full_range)
