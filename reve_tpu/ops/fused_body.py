"""Fused SRVGG hidden-body Pallas kernel (TPU).

The hot loop of realesr-animevideov3 is 16 identical conv3x3(64->64)+PReLU
layers — ~90% of the model FLOPs.  Run layer-by-layer through XLA, every
layer round-trips its full-resolution activation tensor through HBM
(~530 MB read+write per layer at 1080p bf16).  This kernel runs ALL hidden
layers over a row-strip while the strip lives in VMEM:

  * The image streams top-to-bottom in strips of S rows per column tile.
  * Per layer, a line buffer keeps the last 2 rows of that layer's input
    from the previous strip — the vertical stencil halo — so there is NO
    redundant vertical compute (the classic line-buffer / tilted-schedule
    pipeline: each layer's stream lags one row per layer).
  * Horizontally the image is cut into column tiles of CORE cols with a
    MARGIN = num_layers halo recomputed on each side (margin junk from the
    circular col-shift also lands there and is discarded).
  * Each conv is 3 MXU matmuls of (S*WW, 192) @ (192, 64) — the 3 dy taps
    stacked into K, the 3 dx taps realized as circular col shifts with
    f32 accumulation.
  * Exact SAME zero-padding semantics at frame borders are enforced by
    masking each layer's input rows/cols that fall outside the frame —
    matching XLA's per-layer conv padding bit-for-bit is what makes the
    fused path a drop-in replacement (cf. reve_tpu.ops.tiling, which does
    the same reasoning across tiles).

Numerics match reve_tpu.models.srvgg exactly: f32 accumulation, f32 bias
add, cast to the compute dtype, PReLU in the compute dtype.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, a_ref, out_hbm, cur_ref, lb_ref,
            in_sem, out_sem, *, num_layers, S, WW, CORE, MARGIN, H, W,
            compute_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    i = pl.program_id(2)

    # NOTE on layout: all refs/DMAs carry 128 channels (upper 64 zero) —
    # Mosaic pads the lane dim to 128 anyway, and lane-dim DMA slices must
    # be 128-aligned.  Values are sliced to the real 64 channels in-kernel.
    @pl.when(i == 0)
    def _():  # new (batch, column-tile) stream: clear the stencil state
        lb_ref[...] = jnp.zeros_like(lb_ref)

    col0 = pl.multiple_of(t * CORE, 8)   # CORE is 8-aligned by builder
    dma_in = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * S, S), pl.ds(col0, WW), :],
        cur_ref.at[0],
        in_sem,
    )
    dma_in.start()

    col_abs = (t * CORE - MARGIN) + jax.lax.broadcasted_iota(
        jnp.int32, (1, WW, 1), 1
    )
    col_ok = jnp.logical_and(col_abs >= 0, col_abs < W)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S + 2, 1, 1), 0)
    zeros_hi = jnp.zeros((S, WW, 64), compute_dtype)

    dma_in.wait()

    def layer_body(layer, _):
        src = cur_ref[0]                              # (S, WW, 128)
        lb = lb_ref[layer]                            # (2, WW, 128)
        inr = jnp.concatenate([lb, src], axis=0)      # (S+2, WW, 128)
        # mask rows/cols outside the frame -> exact SAME zero padding
        row_abs = (i * S - layer - 2) + row_iota
        row_ok = jnp.logical_and(row_abs >= 0, row_abs < H)
        inr = jnp.where(jnp.logical_and(row_ok, col_ok), inr, 0)
        lb_ref[layer] = inr[S:S + 2]                  # stencil tail for i+1

        # Stack the 3 dy taps' real channels into K (S, WW, 192), FLATTEN
        # rows, and realize each dx tap as one large (S*WW, 192) @ (192, 64)
        # matmul — big M amortizes MXU launch overhead (a rank-3 dot
        # decomposes into S tiny matmuls).  The dx shift is a row shift of
        # the flattened matrix: it leaks one pixel between consecutive image
        # rows at the window edge columns, and window edge columns also lack
        # their true out-of-window neighbor — both live in the discarded
        # margin (MARGIN > num_layers covers the growth).  No offset-1
        # column slices anywhere: Mosaic requires concat operands aligned.
        astack = jnp.concatenate(
            [inr[0:S, :, :64], inr[1:S + 1, :, :64], inr[2:S + 2, :, :64]],
            axis=-1,
        )
        flat = jnp.pad(astack.reshape(S * WW, 192), ((1, 1), (0, 0)))
        wl = w_ref[layer]                             # (3, 3, 64, 64)
        acc = None
        for dx in range(3):
            shifted = flat[dx:dx + S * WW]
            wd = wl[:, dx].reshape(192, 64)
            m = jax.lax.dot_general(
                shifted, wd,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = m if acc is None else acc + m
        y = (acc + b_ref[layer][None, :]).astype(compute_dtype)
        alpha = a_ref[layer].astype(compute_dtype)[None, :]
        y = jnp.maximum(y, 0) + alpha * jnp.minimum(y, 0)
        cur_ref[0] = jnp.concatenate(
            [y.reshape(S, WW, 64), zeros_hi], axis=-1
        )
        return 0

    jax.lax.fori_loop(0, num_layers, layer_body, 0)

    dma_out = pltpu.make_async_copy(
        cur_ref.at[0, :, pl.ds(MARGIN, CORE), :],
        out_hbm.at[b, pl.ds(i * S, S), pl.ds(col0, CORE), :],
        out_sem,
    )
    dma_out.start()
    dma_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "strip", "core", "compute_dtype",
                     "interpret"),
)
def fused_hidden_body(
    x: jax.Array,            # (B, H, W, 64) compute dtype
    w_stack: jax.Array,      # (L, 3, 3, 64, 64)
    b_stack: jax.Array,      # (L, 64) float32
    a_stack: jax.Array,      # (L, 64) float32 (PReLU alphas)
    *,
    height: int,
    width: int,
    strip: int = 8,
    core: int = 480,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Apply L fused conv3x3+PReLU layers; returns (B, H, W, 64)."""
    if interpret is None:  # Mosaic compiles on TPU only; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    assert (H, W, C) == (height, width, 64), (x.shape, height, width)
    L = w_stack.shape[0]
    S = strip
    CORE = min(core, _round_up(W, 8))
    # margin: L cols of stencil halo + 2 for flattened-dx-shift junk,
    # rounded to a multiple of 8 (sublane tiling: DMA offsets/sizes on the
    # window-column dimension must be 8-aligned)
    MARGIN = _round_up(L + 2, 8)
    WW = CORE + 2 * MARGIN
    T = math.ceil(W / CORE)
    # last strip i=n-1 emits output rows up to n*S - L, which must reach H
    n_strips = math.ceil((H + L) / S)
    Hp = n_strips * S
    Wp = T * CORE + 2 * MARGIN

    x = x.astype(compute_dtype)
    # channel pad to 128 lanes (see kernel layout note) + spatial pads
    xp = jnp.pad(
        x, ((0, 0), (0, Hp - H), (MARGIN, Wp - W - MARGIN), (0, 64))
    )

    kernel = functools.partial(
        _kernel, num_layers=L, S=S, WW=WW, CORE=CORE, MARGIN=MARGIN,
        H=H, W=W, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, T, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Hp, T * CORE, 128), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((1, S, WW, 128), compute_dtype),    # current strip
            pltpu.VMEM((L, 2, WW, 128), compute_dtype),    # line buffers
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_stack.astype(compute_dtype), b_stack.astype(jnp.float32),
      a_stack.astype(jnp.float32))
    return out[:, L:L + H, :W, :64]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_hidden_params(params, num_conv: int):
    """srvgg params pytree -> (w_stack, b_stack, a_stack) for the hidden
    convs (convs[1..num_conv], prelus[1..num_conv])."""
    ws = jnp.stack(
        [
            # HWIO (3,3,64,64) -> [dy, dx, ci, co] == HWIO already
            params["convs"][i + 1]["w"]
            for i in range(num_conv)
        ]
    )
    bs = jnp.stack(
        [params["convs"][i + 1]["b"] for i in range(num_conv)]
    ).astype(jnp.float32)
    as_ = jnp.stack(
        [params["prelus"][i + 1]["alpha"] for i in range(num_conv)]
    ).astype(jnp.float32)
    return ws, bs, as_
