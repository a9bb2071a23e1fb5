"""Space-to-depth conv reformulations (exact, TPU-first).

Small-output-channel 3x3 convolutions waste MXU columns: an output tile is
M x 128, so N=64 runs at half the array's rate and N=32 at a quarter
(PERF.md roofline).  Folding spatial phases into channels makes the SAME
math an N>=128 conv on a smaller image:

  * row s2d (factor 2 on H): channels x2, FLOPs x2, measured ~2.6x rate
    on v5e -> 1.3x net for 64-channel stacks (srvgg).
  * 2D s2d (factor 2 on H and W): channels x4, FLOPs x4, measured ~6.7x
    rate for 32-channel stacks (rrdb dense blocks) -> ~1.7-6x net
    depending on the original channel count.

The reformulation is EXACT: for output phase q and original tap u, the
substitution 2(i+p)+s = 2i+q+u yields exactly one s2d tap (p, s) with
u = 2p+s-q; taps with u outside [-1, 1] get zero weights, and those zero
taps only ever touch rows/cols the original SAME padding also zeroes.
Derivation and measurements: PERF.md "Round 2 findings".

Odd dimensions: pad to even and RE-ZERO the stand-in pad row/col channels
after every conv (a plain conv stack re-zeroes its virtual padding per
conv); helpers below build the masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# static tap maps: [p+1, s, q] -> original tap index u+1 (and validity);
# u = 2p + s - q, valid iff -1 <= u <= 1
_TAP = np.zeros((3, 2, 2), np.int32)
_VALID = np.zeros((3, 2, 2), np.float32)
for _p in (-1, 0, 1):
    for _s in (0, 1):
        for _q in (0, 1):
            _u = 2 * _p + _s - _q
            if -1 <= _u <= 1:
                _TAP[_p + 1, _s, _q] = _u + 1
                _VALID[_p + 1, _s, _q] = 1.0
del _p, _s, _q, _u


# -- row-only (factor 2 on H) ------------------------------------------------

def s2d_rows(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W, 2C); channel layout (q, c), q = row%2."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W, C).transpose(0, 1, 3, 2, 4).reshape(
        B, H // 2, W, 2 * C)


def d2s_rows(y: jax.Array) -> jax.Array:
    B, H2, W, C2 = y.shape
    C = C2 // 2
    return y.reshape(B, H2, W, 2, C).transpose(0, 1, 3, 2, 4).reshape(
        B, H2 * 2, W, C)


def s2d_rows_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) HWIO -> (3, 3, 2Ci, 2Co) row-s2d equivalent kernel.

    One static gather + mask (compact HLO — a per-tap update-slice version
    made whole-model compiles pathologically slow at RRDB scale)."""
    ci, co = w.shape[2], w.shape[3]
    wr = w[_TAP] * _VALID[..., None, None, None].astype(w.dtype)
    # axes [p, s, q, v, c, d] -> [p, v, s, c, q, d]
    return wr.transpose(0, 3, 1, 4, 2, 5).reshape(3, 3, 2 * ci, 2 * co)


# -- 2D (factor 2 on H and W) ------------------------------------------------

def s2d2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel layout (q, r, c)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def d2s2(y: jax.Array) -> jax.Array:
    B, H2, W2, C4 = y.shape
    C = C4 // 4
    return y.reshape(B, H2, W2, 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H2 * 2, W2 * 2, C)


def s2d2_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) HWIO -> (3, 3, 4Ci, 4Co) 2D-s2d equivalent kernel.

    Two static gathers + masks (row taps then column taps)."""
    ci, co = w.shape[2], w.shape[3]
    mask = _VALID.astype(w.dtype)
    wr = w[_TAP] * mask[..., None, None, None]     # [p, s, q, v, c, d]
    wc = wr[:, :, :, _TAP] * mask[None, None, None, :, :, :, None, None]
    # axes [p, s, q, pv, sv, qv, c, d] -> [p, pv, s, sv, c, q, qv, d]
    return wc.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        3, 3, 4 * ci, 4 * co)


def s2d2_kernel_concat(w: jax.Array, part_channels) -> jax.Array:
    """2D-s2d kernel for a conv whose input is a CHANNEL CONCAT of s2d
    tensors: the s2d-domain concat has layout [(phase, c_part0)],
    [(phase, c_part1)], ..., so each part's input slab is transformed
    independently and re-concatenated in part order."""
    out = []
    off = 0
    for c in part_channels:
        out.append(s2d2_kernel(w[:, :, off:off + c, :]))
        off += c
    assert off == w.shape[2], (off, w.shape)
    return jnp.concatenate(out, axis=2)
