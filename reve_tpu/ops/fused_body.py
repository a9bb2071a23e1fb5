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
  * Each conv is 3 MXU matmuls of (S*WW, kdim) @ (kdim, 64): the 3 dy
    taps stacked into K (an im2col the VPU builds in VMEM; K zero-padded
    to kdim=256 = 2 aligned lane tiles by default), the 3 dx taps realized
    as row shifts of the flattened matrix, f32 accumulation; msplit row
    chunks bound the operand's VMEM footprint.
  * Input and output strips are double-buffered: each grid step prefetches
    the next strip's input DMA and drains the previous output DMA behind
    the current step's compute, so the serial DMA latency (~50 us/copy on
    this part) is hidden.
  * Exact SAME zero-padding semantics at frame borders are enforced by
    masking each layer's input rows/cols that fall outside the frame.
    (An interior fast path that skips the masks exists behind
    fast_interior but measured SLOWER — the lax.cond costs more than the
    masks it saves; off by default, PERF.md round-2 table.)

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
            H, W, T, n_strips, compute_dtype, kdim, msplit, fast_interior):
    """One grid step = one FULL column stream (all strips of one (b, t)).

    Keeping the strip loop inside the kernel removes the per-grid-step
    overhead that floored the previous version (~110 us/strip, equal to the
    DMA-only ablation: grid boundaries serialize outstanding DMAs).  Strips
    are processed in PAIRS so every buffer slot index is static — dynamic
    slot indexing of the hot buffers lowers pathologically (CLAUDE.md).
    Within a pair, slot-0's compute overlaps slot-1's input DMA and the
    previous strip's output DMA.

    v4 restructure (PERF.md round-2 plan):
      * K zero-padded to `kdim` (256 = 2 lane tiles): K=192 dots pay a ~2x
        non-128-multiple slow path (measured 9.3 vs 4.3 us), padding with
        zero weight rows buys the aligned path for 1/3 more MXU work.
      * `msplit` row-chunks per dot keep the im2col operand small so the
        strip height S can grow (amortizing the ~30 us/strip machinery
        floor and the 3-4 us per-dot fixed cost) under the 16 MB VMEM cap.
        Chunk-seam pad rows only corrupt wrap-junk positions (outermost
        margin columns), exactly like the strip-edge pad rows.
      * interior fast path: strips/tiles whose stencil halo never touches a
        frame border skip the zero-pad masking entirely (lax.cond).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)

    lb_ref[...] = jnp.zeros_like(lb_ref)

    col_abs = (t * CORE - MARGIN) + jax.lax.broadcasted_iota(
        jnp.int32, (1, WW, 1), 1
    )
    col_ok = jnp.logical_and(col_abs >= 0, col_abs < W)
    # column-interior: this tile's whole window (incl. margins) is inside
    # the frame, so column masking is a no-op
    col_interior = jnp.logical_and(
        t * CORE - MARGIN >= 0, t * CORE + CORE + MARGIN <= W
    )
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (S + 2, 1, 1), 0)
    zeros_hi_out = jnp.zeros((S, CORE, 64), compute_dtype)

    # input/output are pre-tiled: strips are contiguous in HBM
    # (a strided window copy explodes into one DMA descriptor per row at
    # ~6 us each — 16 descriptors/strip was the ~100 us/strip floor)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[b, t, pl.ds(i * S, S)],
            in_ref.at[slot], in_sem.at[slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_ref.at[slot],
            out_hbm.at[b, t, pl.ds(i * S, S)],
            out_sem.at[slot],
        )

    Sc = S // msplit
    Mc = Sc * WW

    def process(layer, i):
        """One conv+PReLU layer over strip i, in place in cur_ref[0].

        The whole compute path carries the real 64 channels; only the DMA
        buffers are 128-lane (Mosaic alignment), trimming ~1/3 of the VPU
        copy traffic per layer."""
        src = cur_ref[0]
        inr = jnp.concatenate([lb_ref[layer], src], axis=0)  # (S+2, WW, 64)

        def masked(v):
            row_abs = (i * S - layer - 2) + row_iota
            row_ok = jnp.logical_and(row_abs >= 0, row_abs < H)
            return jnp.where(jnp.logical_and(row_ok, col_ok), v, 0)

        if fast_interior:
            # rows of every layer's stencil stay inside [0, H) iff
            # i*S >= L+1 and i*S + S <= H (lag: layer l reads rows
            # [i*S - l - 2, i*S - l - 2 + S + 1])
            row_interior = jnp.logical_and(
                i * S >= num_layers + 1, i * S + S <= H
            )
            inr = jax.lax.cond(
                jnp.logical_and(row_interior, col_interior),
                lambda v: v, masked, inr,
            )
        else:
            inr = masked(inr)
        lb_ref[layer] = inr[S:S + 2]              # stencil tail for strip i+1

        wl = w_ref[layer]                          # (3, kdim, 64)
        kpad = (
            [jnp.zeros((Sc, WW, kdim - 192), compute_dtype)]
            if kdim > 192 else []
        )
        for c in range(msplit):                    # static unroll
            r0 = c * Sc
            sub = inr[r0:r0 + Sc + 2]              # (Sc+2, WW, 64)
            astack = jnp.concatenate(
                [sub[0:Sc], sub[1:Sc + 1], sub[2:Sc + 2]] + kpad, axis=-1,
            )
            flat = jnp.pad(astack.reshape(Mc, kdim), ((1, 1), (0, 0)))
            acc = None
            for dx in range(3):
                m = jax.lax.dot_general(
                    flat[dx:dx + Mc], wl[dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = m if acc is None else acc + m
            y = (acc + b_ref[layer][None, :]).astype(compute_dtype)
            alpha = a_ref[layer].astype(compute_dtype)[None, :]
            y = jnp.maximum(y, 0) + alpha * jnp.minimum(y, 0)
            cur_ref[0, pl.ds(r0, Sc)] = y.reshape(Sc, WW, 64)

    def compute_strip(slot, i):
        cur_ref[0] = in_ref[slot][:, :, :64]

        def body(layer, _):
            process(layer, i)
            return 0

        jax.lax.fori_loop(0, num_layers, body, 0)
        out_ref[slot] = jnp.concatenate(
            [cur_ref[0, :, MARGIN:MARGIN + CORE, :], zeros_hi_out], axis=-1
        )

    in_dma(0, 0).start()

    def pair_body(k, _):
        a = 2 * k          # slot 0
        bidx = 2 * k + 1   # slot 1

        in_dma(0, a).wait()
        @pl.when(bidx < n_strips)
        def _():
            in_dma(1, bidx).start()
        @pl.when(k >= 1)
        def _():
            out_dma(0, a - 2).wait()   # descriptor match: same slot/size
        compute_strip(0, a)
        out_dma(0, a).start()

        @pl.when(bidx < n_strips)
        def _():
            in_dma(1, bidx).wait()
            @pl.when(bidx + 1 < n_strips)
            def _():
                in_dma(0, bidx + 1).start()
            @pl.when(k >= 1)
            def _():
                out_dma(1, bidx - 2).wait()
            compute_strip(1, bidx)
            out_dma(1, bidx).start()
        return 0

    n_pairs = (n_strips + 1) // 2
    jax.lax.fori_loop(0, n_pairs, pair_body, 0)

    # drain the trailing output DMAs
    last = n_strips - 1
    pltpu.make_async_copy(
        out_ref.at[last % 2], out_ref.at[last % 2], out_sem.at[last % 2]
    ).wait()
    @pl.when(jnp.asarray(n_strips >= 2))
    def _():
        prev = last - 1
        pltpu.make_async_copy(
            out_ref.at[prev % 2], out_ref.at[prev % 2], out_sem.at[prev % 2]
        ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "strip", "core", "compute_dtype",
                     "interpret", "kdim", "msplit", "fast_interior"),
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
    core: int = 640,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    kdim: int = 256,
    msplit: int = 2,
    fast_interior: bool = False,
) -> jax.Array:
    """Apply L fused conv3x3+PReLU layers; returns (B, H, W, 64).

    kdim: im2col contraction size per dx tap — 192 (exact, non-128-multiple
    slow path) or 256 (zero-padded to 2 lane tiles, aligned MXU path).
    msplit: split each strip's dot into msplit row chunks (VMEM headroom
    for larger strips).  fast_interior: skip border masking on strips/tiles
    whose stencil never touches a frame border.
    """
    if interpret is None:  # Mosaic compiles on TPU only; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    assert (H, W, C) == (height, width, 64), (x.shape, height, width)
    assert kdim in (192, 256) and strip % msplit == 0, (kdim, strip, msplit)
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
    # pre-tile into (B, T, Hp, WW, 128): one column-stream per (b, t) with
    # every strip contiguous in HBM -> single-descriptor DMAs in-kernel
    xt = jnp.stack(
        [xp[:, :, ti * CORE:ti * CORE + WW] for ti in range(T)], axis=1
    )

    # weights: (L, 3dy, 3dx, 64, 64) -> per-dx im2col matrices
    # (L, 3dx, kdim, 64) with K index = dy*64 + ci, zero rows above 192
    wmat = w_stack.transpose(0, 2, 1, 3, 4).reshape(L, 3, 192, 64)
    if kdim > 192:
        wmat = jnp.pad(wmat, ((0, 0), (0, 0), (0, kdim - 192), (0, 0)))

    kernel = functools.partial(
        _kernel, num_layers=L, S=S, WW=WW, CORE=CORE, MARGIN=MARGIN,
        H=H, W=W, T=T, n_strips=n_strips,
        compute_dtype=compute_dtype, kdim=kdim, msplit=msplit,
        fast_interior=fast_interior,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, T, Hp, CORE, 128), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, S, WW, 128), compute_dtype),    # in double buffer
            pltpu.VMEM((2, S, CORE, 128), compute_dtype),  # out double buffer
            pltpu.VMEM((1, S, WW, 64), compute_dtype),     # current strip
            pltpu.VMEM((L, 2, WW, 64), compute_dtype),     # line buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xt, wmat.astype(compute_dtype), b_stack.astype(jnp.float32),
      a_stack.astype(jnp.float32))
    # un-tile: (B, T, Hp, CORE, 128) -> (B, Hp, T*CORE, 128)
    out = out.transpose(0, 2, 1, 3, 4).reshape(B, Hp, T * CORE, 128)
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
