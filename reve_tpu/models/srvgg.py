"""SRVGGNetCompact — the Real-ESRGAN compact VGG-style super-resolution net.

This is the network inside the `realesr-animevideov3` model that the reference
(ONdraid/reve) runs by shelling out to `realesrgan-ncnn-vulkan`
(reve-shared/src/lib.rs:134-147 invokes `-n realesr-animevideov3-x2 -s <ratio>`).
Here it is a pure-functional JAX model: `init_params` builds a parameter
pytree, `apply` is a jit-compatible forward pass.

Architecture (matches upstream Real-ESRGAN `SRVGGNetCompact`):

    conv3x3(in_ch -> num_feat), PReLU
    num_conv x [ conv3x3(num_feat -> num_feat), PReLU ]
    conv3x3(num_feat -> out_ch * scale^2)
    pixel_shuffle(scale)
    + nearest-neighbor-upsampled input (residual)

Layout notes (TPU-first):
  * NHWC activations, HWIO weights — the layouts XLA's TPU conv emitter wants.
  * Compute dtype is configurable: float32 for quality validation, bfloat16
    for production throughput on the MXU. Accumulation is always float32
    (`preferred_element_type`).
  * The whole forward is a static-shape function of (B, H, W, C) so XLA can
    tile every conv onto the MXU; arbitrary resolutions are handled one level
    up by `reve_tpu.ops.tiling` (halo-padded spatial tiles).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from reve_tpu.ops.pixel_shuffle import pixel_shuffle


@dataclasses.dataclass(frozen=True)
class SRVGGConfig:
    """Static hyper-parameters of a SRVGGNetCompact variant.

    `realesr-animevideov3` (the reference's only shipped model,
    /root/reference/README.md:52) is num_feat=64, num_conv=16 with
    upscale in {2, 3, 4}; `realesr-general-x4v3` is num_conv=32, upscale=4.
    """

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 2

    @property
    def num_body_convs(self) -> int:
        # first conv + num_conv hidden convs + last conv
        return self.num_conv + 2


Params = Dict[str, Any]


def init_params(key: jax.Array, cfg: SRVGGConfig, dtype=jnp.float32) -> Params:
    """Deterministic Kaiming-style init (matches torch's default conv init
    closely enough for tests; real deployments load published weights via
    reve_tpu.weights)."""
    params: Params = {"convs": [], "prelus": []}
    chans = (
        [(cfg.num_in_ch, cfg.num_feat)]
        + [(cfg.num_feat, cfg.num_feat)] * cfg.num_conv
        + [(cfg.num_feat, cfg.num_out_ch * cfg.upscale * cfg.upscale)]
    )
    keys = jax.random.split(key, len(chans))
    for k, (cin, cout) in zip(keys, chans):
        wkey, bkey = jax.random.split(k)
        fan_in = cin * 9
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(wkey, (3, 3, cin, cout), dtype, -bound, bound)
        b = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
        params["convs"].append({"w": w, "b": b})
    # one PReLU after every conv except the last
    for _ in range(cfg.num_conv + 1):
        params["prelus"].append({"alpha": jnp.full((cfg.num_feat,), 0.25, dtype)})
    return params


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """SAME conv3x3, NHWC x HWIO -> NHWC, f32 accumulation on the MXU.

    When the compute dtype is float32 we force Precision.HIGHEST: the TPU MXU
    otherwise decomposes f32 matmuls into bf16 passes (~2e-3 abs error vs a
    true f32 conv), which would eat the PSNR>=50dB quality budget. bfloat16
    inputs already use the native bf16 MXU path.
    """
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    a = alpha.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


# -- row space-to-depth reformulation of the hidden stack --------------------
#
# See reve_tpu.ops.s2d for the transform and its exactness argument; the
# measured win and the layout-cost pitfalls are in PERF.md "Round 2
# findings" (1.3x on the MXU for this 64-channel stack; transposes must be
# folded into the 3-channel input and the uint8 output to keep them free).

from reve_tpu.ops.s2d import (  # noqa: E402
    d2s_rows as _d2s_rows,
    s2d_rows as _s2d_rows,
    s2d_rows_kernel as _s2d_kernel,
)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "quantize_u8", "s2d",
                     "pre_shuffle"),
)
def apply(params: Params, x: jax.Array, *, cfg: SRVGGConfig,
          compute_dtype=jnp.float32, quantize_u8: bool = False,
          s2d: bool = True, pre_shuffle: bool = False) -> jax.Array:
    """Forward pass.

    Args:
      params: pytree from `init_params` / `reve_tpu.weights` loaders.
      x: (B, H, W, C) float in [0, 1].
      cfg: static model config.
      compute_dtype: jnp.float32 or jnp.bfloat16.
      quantize_u8: emit uint8 in [0, 255] directly (see _epilogue).
      s2d: run the conv stack in the row space-to-depth domain (exact
        reformulation; ~1.3x faster on the MXU — reve_tpu.ops.s2d).

    Returns:
      (B, H*scale, W*scale, C) float32 in ~[0, 1] (not clipped), or uint8
      when quantize_u8.
    """
    orig = x
    h = x.astype(compute_dtype)
    convs, prelus = params["convs"], params["prelus"]
    if s2d:
        # The ENTIRE conv stack runs in the row-s2d domain: the transpose
        # into it touches only the 3-channel input, and the transpose out
        # happens on quantized uint8 in the epilogue — the two
        # 64-channel full-resolution permutes a naive s2d would pay are
        # what erased the MXU win when measured.
        H = h.shape[1]
        pad_mask = None
        if H % 2:
            # pad one zero row standing in for the SAME zero padding; it
            # must be RE-ZEROED after every conv (a plain stack re-zeroes
            # its virtual pad rows per conv) — mask the (q=1) channels of
            # the last s2d row between layers
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 0), (0, 0)))
            H2 = (H + 1) // 2

            def _mask(c):
                row = jax.lax.broadcasted_iota(jnp.int32, (1, H2, 1, 1), 1)
                ch = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, 1, 2 * c), 3)
                return jnp.logical_or(row < H2 - 1, ch < c).astype(
                    compute_dtype)

            pad_mask = _mask
        hs = _s2d_rows(h)
        hs = _prelu(
            _conv3x3(hs, _s2d_kernel(convs[0]["w"].astype(compute_dtype)),
                     jnp.tile(convs[0]["b"], 2)),
            jnp.tile(prelus[0]["alpha"], 2),
        )
        if pad_mask is not None:
            hs = hs * pad_mask(cfg.num_feat)
        for i in range(cfg.num_conv):
            hs = _prelu(
                _conv3x3(
                    hs,
                    _s2d_kernel(convs[i + 1]["w"].astype(compute_dtype)),
                    jnp.tile(convs[i + 1]["b"], 2),
                ),
                jnp.tile(prelus[i + 1]["alpha"], 2),
            )
            if pad_mask is not None:
                hs = hs * pad_mask(cfg.num_feat)
        hs = _conv3x3(hs, _s2d_kernel(convs[-1]["w"].astype(compute_dtype)),
                      jnp.tile(convs[-1]["b"], 2))
        return _epilogue_s2d(hs, orig, cfg, H, quantize_u8=quantize_u8,
                             pre_shuffle=pre_shuffle)
    h = _prelu(_conv3x3(h, convs[0]["w"].astype(compute_dtype), convs[0]["b"]),
               prelus[0]["alpha"])
    for i in range(cfg.num_conv):
        h = _prelu(
            _conv3x3(h, convs[i + 1]["w"].astype(compute_dtype),
                     convs[i + 1]["b"]),
            prelus[i + 1]["alpha"],
        )
    h = _conv3x3(h, convs[-1]["w"].astype(compute_dtype), convs[-1]["b"])
    return _epilogue(h, orig, cfg, quantize_u8=quantize_u8,
                     pre_shuffle=pre_shuffle)


def _epilogue_s2d(hs: jax.Array, orig: jax.Array, cfg: SRVGGConfig,
                  H: int, quantize_u8: bool = False,
                  pre_shuffle: bool = False) -> jax.Array:
    """_epilogue for a row-s2d-domain head output (B, H2, W, 2*out*r^2).

    The residual base is built by s2d-ing the 3-channel input (cheap) and
    repeating channels — repeat(s2d(x)) and s2d(repeat(x)) agree because
    both layouts are (q, (c, r^2)).  When quantizing, the d2s transpose
    back to image rows runs on uint8 (4x fewer bytes than f32)."""
    r = cfg.upscale
    o = orig.astype(jnp.float32)
    if H % 2:
        o = jnp.pad(o, ((0, 0), (0, 1), (0, 0), (0, 0)))
    base = jnp.repeat(_s2d_rows(o), r * r, axis=-1)
    y = hs.astype(jnp.float32) + base
    if quantize_u8:
        y = jnp.clip(y * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    y = _d2s_rows(y)[:, :H]
    if pre_shuffle:
        return y  # (B, H, W, out*r^2): caller shuffles (see _epilogue)
    return pixel_shuffle(y, r)


def _epilogue(h: jax.Array, orig: jax.Array, cfg: SRVGGConfig,
              quantize_u8: bool = False,
              pre_shuffle: bool = False) -> jax.Array:
    """Residual + upsample.  torch does pixel_shuffle(h) + nearest(x);
    because pixel_shuffle is a pure permutation, that equals
    pixel_shuffle(h + repeat(x, r^2, channel)) — the add then happens at
    input resolution (r^2 x fewer HBM bytes touched than adding two
    full-res images) and stays f32 for residual fidelity.

    quantize_u8: clip/round to uint8 BEFORE the shuffle — elementwise
    quantization commutes exactly with a permutation, and shuffling uint8
    moves 4x fewer HBM bytes than f32 (measurable at 4K outputs)."""
    r = cfg.upscale
    base = jnp.repeat(orig.astype(jnp.float32), r * r, axis=-1)
    y = h.astype(jnp.float32) + base
    if quantize_u8:
        y = jnp.clip(y * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    if pre_shuffle:
        # return the pre-shuffle (B, H, W, out*r^2) tensor: at 4K-class
        # outputs the in-graph d2s transpose crashes / degrades this
        # stack's compiler (PERF.md round-3 "4K story"); the engine runs
        # ops.pixel_shuffle_rowphase as a separate small jit instead
        return y
    return pixel_shuffle(y, r)


# -- int8 turbo mode ---------------------------------------------------------


def _conv3x3_s8(x8: jax.Array, w8: jax.Array) -> jax.Array:
    """SAME conv3x3, s8 x s8 -> s32 on the MXU (2x the bf16 rate once the
    scoped-VMEM budget is raised — utils/compileopts.py, PERF.md).
    Accumulator headroom: 9 taps x 128 ch x 127^2 ~= 2^24.2 << 2^31."""
    return jax.lax.conv_general_dilated(
        x8, w8, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _quant_s8(x: jax.Array, scale: jax.Array) -> jax.Array:
    """f32-ish -> symmetric int8 with scalar scale (x ~= q * scale).

    Clips to ±127, matching the symmetric per-channel weight grid
    (weights/quantize.py): the scale maps max|x| to 127, so -128 is only
    reachable for content hotter than calibration+margin — keeping the
    range symmetric costs nothing and keeps |q*scale| <= max|x|*margin
    on both sides."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "quantize_u8", "s2d",
                              "int8_head", "pre_shuffle"),
)
def apply_int8(params: Params, qbody, x: jax.Array, *, cfg: SRVGGConfig,
               compute_dtype=jnp.bfloat16, quantize_u8: bool = False,
               s2d: bool = True, int8_head: bool = True,
               pre_shuffle: bool = False) -> jax.Array:
    """Forward pass with the hidden stack quantized to int8 (turbo mode).

    `qbody`: reve_tpu.weights.quantize.QuantizedBody (classic-domain int8
    weights + per-layer activation scales; s2d kernel transform applied
    here, mirroring `apply`).  The hidden stack AND (by default) the head
    conv run in int8; the first conv, PReLU math, residual and epilogue
    run in `compute_dtype`/f32 exactly like `apply`.  Dequant + bias +
    PReLU + requant between convs are f32 elementwise chains XLA fuses
    into the conv epilogues (measured ~1.4 ms total for 16 layers).

    `int8_head=False` runs the head conv in `compute_dtype` instead (the
    quality/fps trade measured in scripts/int8_frontier.py; the head conv
    feeds the pixel-shuffle directly, so its quantization error lands
    unfiltered in the output).

    Costs PSNR vs `apply` (documented in PERF.md); opt-in via
    `--dtype int8` / UpscaleEngine(compute_dtype="int8").
    """
    orig = x
    h = x.astype(compute_dtype)
    convs, prelus = params["convs"], params["prelus"]
    sx = qbody.act_scale

    def dq_prelu(y32, i, tile_n):
        scale = sx[i] * (jnp.tile(qbody.sw[i], tile_n) if tile_n > 1
                         else qbody.sw[i])
        bb = jnp.tile(qbody.b[i], tile_n) if tile_n > 1 else qbody.b[i]
        aa = (jnp.tile(qbody.alpha[i], tile_n) if tile_n > 1
              else qbody.alpha[i])
        fy = y32.astype(jnp.float32) * scale + bb
        return jnp.maximum(fy, 0) + aa * jnp.minimum(fy, 0)

    if s2d:
        H = h.shape[1]
        pad_mask = None
        if H % 2:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 0), (0, 0)))
            H2 = (H + 1) // 2

            def _mask(c, dtype):
                row = jax.lax.broadcasted_iota(jnp.int32, (1, H2, 1, 1), 1)
                ch = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, 1, 2 * c), 3)
                return jnp.logical_or(row < H2 - 1, ch < c).astype(dtype)

            pad_mask = _mask
        hs = _s2d_rows(h)
        hs = _prelu(
            _conv3x3(hs, _s2d_kernel(convs[0]["w"].astype(compute_dtype)),
                     jnp.tile(convs[0]["b"], 2)),
            jnp.tile(prelus[0]["alpha"], 2),
        )
        if pad_mask is not None:
            hs = hs * pad_mask(cfg.num_feat, compute_dtype)
        q = _quant_s8(hs, sx[0])
        for i in range(cfg.num_conv):
            fy = dq_prelu(_conv3x3_s8(q, _s2d_kernel(qbody.w8[i])), i, 2)
            if pad_mask is not None:
                fy = fy * pad_mask(cfg.num_feat, jnp.float32)
            q = _quant_s8(fy, sx[i + 1])
        if int8_head:
            # head conv in int8 too (its input scale is the last
            # calibration entry); output dequantized straight into the
            # f32 epilogue
            y32 = _conv3x3_s8(q, _s2d_kernel(qbody.w8_last))
            hs = (y32.astype(jnp.float32)
                  * (sx[cfg.num_conv] * jnp.tile(qbody.sw_last, 2))
                  + jnp.tile(qbody.b_last, 2))
        else:
            hf = q.astype(compute_dtype) * sx[cfg.num_conv].astype(
                compute_dtype)
            hs = _conv3x3(hf,
                          _s2d_kernel(convs[-1]["w"].astype(compute_dtype)),
                          jnp.tile(convs[-1]["b"], 2)).astype(jnp.float32)
        return _epilogue_s2d(hs, orig, cfg, H, quantize_u8=quantize_u8,
                             pre_shuffle=pre_shuffle)

    h = _prelu(_conv3x3(h, convs[0]["w"].astype(compute_dtype),
                        convs[0]["b"]),
               prelus[0]["alpha"])
    q = _quant_s8(h, sx[0])
    for i in range(cfg.num_conv):
        fy = dq_prelu(_conv3x3_s8(q, qbody.w8[i]), i, 1)
        q = _quant_s8(fy, sx[i + 1])
    if int8_head:
        y32 = _conv3x3_s8(q, qbody.w8_last)
        h = (y32.astype(jnp.float32) * (sx[cfg.num_conv] * qbody.sw_last)
             + qbody.b_last)
    else:
        hf = q.astype(compute_dtype) * sx[cfg.num_conv].astype(compute_dtype)
        h = _conv3x3(hf, convs[-1]["w"].astype(compute_dtype),
                     convs[-1]["b"]).astype(jnp.float32)
    return _epilogue(h, orig, cfg, quantize_u8=quantize_u8,
                     pre_shuffle=pre_shuffle)
