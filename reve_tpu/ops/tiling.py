"""Halo-padded spatial tiling for arbitrary-resolution inference.

The reference's inference binary tiles internally and its README warns the
seams can cause "block inconsistency" (/root/reference/README.md:74).  This
module does tiling *correctly*: tiled output is bit-identical (f32) to running
the whole frame at once, asserted by tests/test_tiling.py.

Scheme: **clamped shifted windows**.  Each output tile of side `tile` is
computed from a window of side `tile + 2*halo` that is clamped to lie fully
inside the frame.  This gives the exactness invariant: every window edge is
either >= `halo` away from the pixels that tile owns (so the halo supplies the
same real neighborhood the whole-frame pass sees) or lies exactly on a frame
border (so the model's own SAME zero-padding matches the whole-frame pass).
Plain zero-halo padding at borders would NOT be exact — conv bias + PReLU turn
zero inputs into nonzero activations, which deeper layers would see where the
whole-frame pass sees fresh SAME-padding zeros.

TPU-first design:
  * All geometry is static for a given (resolution, tile, halo): windows are
    gathered into one batch (B * rows * cols, W, W, C) and the model runs ONE
    batched call — large uniform work for the MXU instead of many small
    kernels and recompiles.
  * Gather/scatter are slices XLA fuses into the surrounding graph.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class _Axis:
    """Tiling geometry along one spatial axis."""

    size: int                      # frame extent
    window: int                    # window extent (<= size)
    # per tile: (window_start, core_offset_in_window, core_size, core_start)
    spans: Tuple[Tuple[int, int, int, int], ...]


def _plan_axis(size: int, tile: int, halo: int) -> _Axis:
    window = min(size, tile + 2 * halo)
    n = max(1, math.ceil(size / tile))
    spans: List[Tuple[int, int, int, int]] = []
    for i in range(n):
        core_start = i * tile
        core_size = min(tile, size - core_start)
        win_start = min(max(core_start - halo, 0), size - window)
        spans.append((win_start, core_start - win_start, core_size, core_start))
    return _Axis(size=size, window=window, spans=tuple(spans))


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static tiling geometry for one input resolution."""

    height: int
    width: int
    tile: int
    halo: int
    row_axis: _Axis
    col_axis: _Axis

    @property
    def rows(self) -> int:
        return len(self.row_axis.spans)

    @property
    def cols(self) -> int:
        return len(self.col_axis.spans)

    @property
    def num_tiles(self) -> int:
        return self.rows * self.cols

    @property
    def window_shape(self) -> Tuple[int, int]:
        return (self.row_axis.window, self.col_axis.window)


def plan_tiles(height: int, width: int, tile: int, halo: int) -> TilePlan:
    return TilePlan(
        height=height,
        width=width,
        tile=tile,
        halo=halo,
        row_axis=_plan_axis(height, tile, halo),
        col_axis=_plan_axis(width, tile, halo),
    )


def extract_tiles(x: jax.Array, plan: TilePlan) -> jax.Array:
    """(B, H, W, C) -> (rows * cols * B, win_h, win_w, C)."""
    b, h, w, c = x.shape
    assert (h, w) == (plan.height, plan.width), (x.shape, plan)
    wh, ww = plan.window_shape
    tiles = []
    for (rs, _, _, _) in plan.row_axis.spans:
        for (cs, _, _, _) in plan.col_axis.spans:
            tiles.append(x[:, rs:rs + wh, cs:cs + ww, :])
    return jnp.concatenate(tiles, axis=0)


def assemble_tiles(tiles: jax.Array, plan: TilePlan, scale: int,
                   batch: int) -> jax.Array:
    """Inverse of extract_tiles after the model upscaled each window by `scale`.

    tiles: (rows*cols*B, win_h*scale, win_w*scale, C)
    Returns (B, H*scale, W*scale, C) assembled from each tile's owned core.
    """
    c = tiles.shape[-1]
    dtype = tiles.dtype
    out = jnp.zeros((batch, plan.height * scale, plan.width * scale, c), dtype)
    idx = 0
    for (_, ro, rh, rcs) in plan.row_axis.spans:
        for (_, co, cw, ccs) in plan.col_axis.spans:
            tile = tiles[idx * batch:(idx + 1) * batch]
            core = tile[:, ro * scale:(ro + rh) * scale,
                        co * scale:(co + cw) * scale, :]
            out = jax.lax.dynamic_update_slice(
                out, core, (0, rcs * scale, ccs * scale, 0)
            )
            idx += 1
    return out


def _chunked_apply(apply_fn: Callable[[jax.Array], jax.Array],
                   batch: jax.Array, chunk: int) -> jax.Array:
    """Run `apply_fn` over `batch` in fixed-size chunks via lax.map.

    One ROLLED loop instead of one giant batched call: peak activation
    memory is bounded by `chunk` items, and the compiled graph contains a
    single model body regardless of batch size — measured necessary at 4K,
    where the all-windows-in-one-batch graph crashes this stack's compiler
    (HTTP 500) and a full-batch whole-frame pass exceeds HBM (PERF.md
    round 3, "4K story").  Zero-pads to a chunk multiple (padding computes
    garbage that is sliced off; exactness of real items is untouched)."""
    n = batch.shape[0]
    if chunk >= n:
        return apply_fn(batch)
    pad = (-n) % chunk
    if pad:
        batch = jnp.concatenate(
            [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)])
    groups = batch.reshape(-1, chunk, *batch.shape[1:])
    out = jax.lax.map(apply_fn, groups)
    return out.reshape(-1, *out.shape[2:])[:n]


def upscale_tiled(
    apply_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    *,
    scale: int,
    tile: int,
    halo: int,
    chunk: int = 0,
) -> jax.Array:
    """Run `apply_fn` (an upscale-by-`scale` model) over halo-padded tiles.

    Bit-identical to the whole-frame pass when `halo` >= the model's
    receptive-field radius; SRVGGNetCompact's radius is num_conv + 2
    (one pixel per 3x3 conv).

    chunk > 0: process at most `chunk` windows per model call (lax.map)
    instead of all windows in one batch — bounds peak memory and graph
    size for large frames (see _chunked_apply).
    """
    b, h, w, _ = x.shape
    plan = plan_tiles(h, w, tile, halo)
    if plan.num_tiles == 1:
        return apply_fn(x)
    tiles = extract_tiles(x, plan)
    if chunk > 0:
        out = _chunked_apply(apply_fn, tiles, chunk)
    else:
        out = apply_fn(tiles)
    return assemble_tiles(out, plan, scale, b)
