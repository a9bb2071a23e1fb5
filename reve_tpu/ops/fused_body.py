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
    MARGIN halo recomputed on each side.
  * Each conv is 3 MXU matmuls of (S*WW, 192) @ (192, 64): the 3 dy taps
    stacked into K (an im2col the VPU builds in VMEM), the 3 dx taps
    realized as row shifts of the flattened matrix, f32 accumulation.
  * Input and output strips are double-buffered: each grid step prefetches
    the next strip's input DMA and drains the previous output DMA behind
    the current step's compute, so the serial DMA latency (~50 us/copy on
    this part) is hidden.
  * Exact SAME zero-padding semantics at frame borders are enforced by
    masking each layer's input rows/cols that fall outside the frame.
    Interior strips (the vast majority) take a fast path that skips the
    masking entirely — selected per grid step with predicated execution.

Numerics match reve_tpu.models.srvgg exactly: f32 accumulation, f32 bias
add, cast to the compute dtype, PReLU in the compute dtype.

Mosaic constraints this code respects (learned the hard way — CLAUDE.md):
refs/DMAs carry 128 lanes (real channels = lower 64); window-column DMA
offsets/extents are multiples of 8; no offset-1 column slices feed concats
(the dx shift happens on flattened rows instead); the layer loop is a
fori_loop (a 16x unrolled body compiles for ~7 minutes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, a_ref, out_hbm, in_ref, out_ref, cur_ref,
            lb_ref, in_sem, out_sem, *, num_layers, S, WW, CORE, MARGIN,
            H, W, T, n_strips, total_steps, compute_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    i = pl.program_id(2)
    step = (b * T + t) * n_strips + i
    p = jax.lax.rem(step, 2)

    def start_in(slot, sb, st, si):
        col0 = pl.multiple_of(st * CORE, 8)
        pltpu.make_async_copy(
            x_hbm.at[sb, pl.ds(si * S, S), pl.ds(col0, WW), :],
            in_ref.at[slot],
            in_sem.at[slot],
        ).start()

    @pl.when(step == 0)
    def _():
        start_in(0, b, t, i)

    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * S, S), pl.ds(pl.multiple_of(t * CORE, 8), WW), :],
        in_ref.at[p], in_sem.at[p],
    ).wait()

    # prefetch next strip's input into the other slot
    @pl.when(step + 1 < total_steps)
    def _():
        ni = i + 1
        wrap_i = ni == n_strips
        ni = jnp.where(wrap_i, 0, ni)
        nt = t + wrap_i.astype(jnp.int32)
        wrap_t = nt == T
        nt = jnp.where(wrap_t, 0, nt)
        nb = b + wrap_t.astype(jnp.int32)
        start_in(1 - p, nb, nt, ni)

    @pl.when(i == 0)
    def _():  # new (batch, column-tile) stream: clear the stencil state
        lb_ref[...] = jnp.zeros_like(lb_ref)

    col_abs = (t * CORE - MARGIN) + jax.lax.broadcasted_iota(
        jnp.int32, (1, WW, 1), 1
    )
    col_ok = jnp.logical_and(col_abs >= 0, col_abs < W)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S + 2, 1, 1), 0)
    zeros_hi = jnp.zeros((S, WW, 64), compute_dtype)

    # one static-index hot buffer: dynamic in_ref[p] addressing inside the
    # layer loop lowers pathologically (~30x); a single 1 MB copy per step
    # into cur_ref[0] is noise
    cur_ref[0] = in_ref[p]

    def process(layer, use_mask):
        """One conv+PReLU layer over the strip, in place in cur_ref[0]."""
        src = cur_ref[0]
        inr = jnp.concatenate([lb_ref[layer], src], axis=0)  # (S+2, WW, 128)
        if use_mask:
            row_abs = (i * S - layer - 2) + row_iota
            row_ok = jnp.logical_and(row_abs >= 0, row_abs < H)
            inr = jnp.where(jnp.logical_and(row_ok, col_ok), inr, 0)
        lb_ref[layer] = inr[S:S + 2]              # stencil tail for strip i+1

        astack = jnp.concatenate(
            [inr[0:S, :, :64], inr[1:S + 1, :, :64], inr[2:S + 2, :, :64]],
            axis=-1,
        )
        flat = jnp.pad(astack.reshape(S * WW, 192), ((1, 1), (0, 0)))
        wl = w_ref[layer]                          # (3, 3, 64, 64)
        acc = None
        for dx in range(3):
            m = jax.lax.dot_general(
                flat[dx:dx + S * WW], wl[:, dx].reshape(192, 64),
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

    def body(layer, _):
        process(layer, True)
        return 0

    jax.lax.fori_loop(0, num_layers, body, 0)

    # drain the out DMA issued two steps ago on this slot, then emit ours
    @pl.when(step >= 2)
    def _():
        pltpu.make_async_copy(
            out_ref.at[p], out_ref.at[p], out_sem.at[p]
        ).wait()

    out_ref[p] = cur_ref[0, :, MARGIN:MARGIN + CORE, :]
    pltpu.make_async_copy(
        out_ref.at[p],
        out_hbm.at[b, pl.ds(i * S, S),
                   pl.ds(pl.multiple_of(t * CORE, 8), CORE), :],
        out_sem.at[p],
    ).start()

    @pl.when(step == total_steps - 1)
    def _():
        @pl.when(jnp.asarray(total_steps >= 2))
        def _():
            pltpu.make_async_copy(
                out_ref.at[1 - p], out_ref.at[1 - p], out_sem.at[1 - p]
            ).wait()
        pltpu.make_async_copy(
            out_ref.at[p], out_ref.at[p], out_sem.at[p]
        ).wait()


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
        H=H, W=W, T=T, n_strips=n_strips, total_steps=B * T * n_strips,
        compute_dtype=compute_dtype,
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
            pltpu.VMEM((2, S, WW, 128), compute_dtype),    # in double buffer
            pltpu.VMEM((2, S, CORE, 128), compute_dtype),  # out double buffer
            pltpu.VMEM((1, S, WW, 128), compute_dtype),    # current strip
            pltpu.VMEM((L, 2, WW, 128), compute_dtype),    # line buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
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
