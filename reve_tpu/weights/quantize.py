"""Post-training int8 quantization (turbo mode): the SRVGG hidden body,
and the RRDB trunk in its own section below.

The hidden stack (16 of the 18 convs, ~92% of FLOPs) runs as s8 x s8 -> s32
convs on the MXU at ~2x the bf16 rate (measured 197 vs 122 TF/s for the
full 16-layer body at the production s2d shape — scripts/perf_int8_body.py;
round-2's "int8 dead end" verdict was scoped-VMEM starvation, fixed by
utils/compileopts.py).  First/last conv, PReLU arithmetic, residual and
epilogue stay in bf16/f32, so quantization noise enters only through the
hidden activations.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8,
    ``w8[..., o] = round(w[..., o] / sw[o])``, ``sw[o] = max|w[..., o]|/127``
  * activations: per-layer (per-tensor) symmetric int8 scales from a
    calibration pass recording ``max|activation|`` at each hidden conv
    input (`collect_act_maxima`); PReLU outputs are signed, so symmetric
    fits.  Per-CHANNEL activation scales folded into the next layer's
    weights were tried and measured WORSE (68.4 vs 70.0 dB on the full
    -shape oracle): the folded weights' wider per-output dynamic range
    costs more than the finer activation grid buys — per-tensor
    activations + per-channel weights is the standard for a reason.
  * dequant + bias + PReLU + requant happen in f32 between convs; XLA fuses
    them into the conv epilogue (no extra HBM round trips).

Quality: int8 costs PSNR vs the f32 reference.  On the most realistic
proxy this image allows (trained weights + real frames,
scripts/int8_frontier.py) every design variant measured 64-73 dB —
comfortably above the 50 dB gate — but that is a proxy, not the
published weights, so this stays an OPT-IN turbo mode (`--dtype int8`),
not the default, until `compare_reference.py --gate` certifies it on
real weights.  The reference's own engine (realesrgan-ncnn-vulkan,
reve-shared/src/lib.rs:134-147) runs fp16/fp32; this mode has no
reference counterpart.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from reve_tpu.models import srvgg

#: percentile statistics sort the whole tensor; at RRDB calibration scale
#: (346 stats x up-to-720p batches) that is minutes of sort time for a
#: statistic whose tail only needs ~thousands of samples.  Tensors larger
#: than this are deterministically strided down to ~this many elements
#: before the percentile (p99.9 of a 4M-sample still rests on ~4k tail
#: points; max-statistics are never subsampled).
_PCT_SAMPLE_CAP = 1 << 22


@dataclasses.dataclass
class QuantizedBody:
    """int8 hidden-stack + last-conv parameters (classic domain; the s2d
    kernel transform is applied at model-apply time, like the f32 path)."""

    w8: List[jax.Array]          # num_conv x (3, 3, C, C) int8
    sw: List[jax.Array]          # num_conv x (C,) f32 per-out-channel
    b: List[jax.Array]           # num_conv x (C,) f32
    alpha: List[jax.Array]       # num_conv x (C,) f32 (PReLU)
    act_scale: jax.Array         # (num_conv + 1,) f32: input scale per
    #                              hidden conv + the last conv's input
    w8_last: jax.Array           # (3, 3, C, out*r^2) int8 head conv
    sw_last: jax.Array           # (out*r^2,) f32
    b_last: jax.Array            # (out*r^2,) f32

    def tree_flatten(self):
        return ((self.w8, self.sw, self.b, self.alpha, self.act_scale,
                 self.w8_last, self.sw_last, self.b_last), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    QuantizedBody, QuantizedBody.tree_flatten, QuantizedBody.tree_unflatten)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "percentile"))
def collect_act_maxima(params: Dict[str, Any], x: jax.Array, *,
                       cfg: srvgg.SRVGGConfig,
                       compute_dtype=jnp.float32,
                       percentile: float = None) -> jax.Array:
    """Calibration forward: returns (num_conv + 1,) |activation| stats —
    the input of each hidden conv plus the head conv's input (classic
    domain; s2d is a permutation of the same values, so the scales
    transfer exactly).

    `percentile`: None (default) records the true max; a value (e.g.
    99.9) records that percentile of |activation| instead — deliberately
    clipping the outlier tail buys a finer grid for the bulk of the
    distribution (measured +7 dB over max-calibration on the
    trained-weights/real-frames proxy, scripts/int8_frontier.py; the
    engine exposes it as ``int8_calib="p99.9"``).

    `x`: (B, H, W, C) float in [0, 1] — representative frames."""
    convs, prelus = params["convs"], params["prelus"]

    # the shared capped-subsample stat (_stat), NOT a full-tensor
    # jnp.percentile: the flagship calibration batch (16 sampled frames
    # cropped to 720p) is ~9.4e8 activations per layer, and percentile's
    # sort temps ((f32+s32 keys) x n) OOM'd a 16 GB v5e on hardware in
    # round 5 — which silently failed every on-hardware certification
    # and forced --dtype auto to its bf16 fallback (the round-4 weak #6
    # root cause).  RRDB's collector always subsampled; SRVGG now does
    # too (p99.9 of a 4M-sample still rests on ~4k tail points).
    stat = functools.partial(_stat, percentile=percentile)

    h = srvgg._prelu(
        srvgg._conv3x3(x.astype(compute_dtype),
                       convs[0]["w"].astype(compute_dtype), convs[0]["b"]),
        prelus[0]["alpha"])
    maxima = [stat(h)]
    # inputs of hidden convs 2..num_conv (outputs of hidden prelus
    # 1..num_conv-1) plus the last conv's input (hidden prelu num_conv)
    for i in range(cfg.num_conv):
        h = srvgg._prelu(
            srvgg._conv3x3(h, convs[i + 1]["w"].astype(compute_dtype),
                           convs[i + 1]["b"]),
            prelus[i + 1]["alpha"])
        maxima.append(stat(h))
    return jnp.stack(maxima)


def quantize_hidden(params: Dict[str, Any], cfg: srvgg.SRVGGConfig,
                    act_maxima, margin: float = 1.0) -> QuantizedBody:
    """Build int8 hidden-stack params from f32 params + calibration maxima.

    `act_maxima`: (num_conv + 1,) from `collect_act_maxima` (one batch or a
    running max over several).  `margin` (>= 1) widens the activation range
    to absorb content hotter than the calibration set (clipping beyond it).
    """
    act_maxima = jnp.asarray(act_maxima, jnp.float32)
    if act_maxima.shape != (cfg.num_conv + 1,):
        raise ValueError(f"act_maxima must be ({cfg.num_conv + 1},), "
                         f"got {act_maxima.shape}")
    act_scale = jnp.maximum(act_maxima * float(margin), 1e-8) / 127.0

    def _qw(w):
        w = jnp.asarray(w, jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s

    w8, sw, b, alpha = [], [], [], []
    for i in range(cfg.num_conv):
        q, s = _qw(params["convs"][i + 1]["w"])
        w8.append(q)
        sw.append(s)
        b.append(jnp.asarray(params["convs"][i + 1]["b"], jnp.float32))
        alpha.append(jnp.asarray(params["prelus"][i + 1]["alpha"],
                                 jnp.float32))
    w8_last, sw_last = _qw(params["convs"][-1]["w"])
    return QuantizedBody(w8=w8, sw=sw, b=b, alpha=alpha,
                         act_scale=act_scale, w8_last=w8_last,
                         sw_last=sw_last,
                         b_last=jnp.asarray(params["convs"][-1]["b"],
                                            jnp.float32))


# -- RRDB (dense-block) quantization -----------------------------------------
#
# RRDB's trunk (23 blocks x 3 RDBs x 5 convs + conv_body = 346 convs, ~92%
# of the FLOPs — the head convs upsample at 2x/4x resolution but are only 4
# convs) quantizes like the SRVGG hidden stack, with one structural twist:
# every dense conv's input is a CHANNEL CONCAT of tensors with different
# dynamic ranges (the RDB input plus the growth features).  A single
# per-tensor scale over the concat would squeeze the quietest part onto a
# few int8 codes, so each concatenated PART keeps its own symmetric scale
# and the per-part scales are FOLDED into the weight slices before the
# per-output-channel weight quantization:
#
#     y[o] = sum_ci x8[ci] * s_part(ci) * w[ci, o]
#          = (x8 conv w8')[o] * sw[o],   w' = w * s_part(ci)
#
# (This differs from srvgg's measured-worse per-CHANNEL fold: here it is
# 2-6 per-part scales per conv, not 64 per-channel ones, and the concat
# structure makes it the only correct scalar-dequant scheme.)
#
# Stats layout (one |activation| stat per quantized tensor, classic
# domain — s2d is a permutation so the scales transfer exactly):
#   per block k, per rdb j: [rdb input, h1, h2, h3, h4]  (5 stats)
#   final: conv_body input (the trunk output)            (1 stat)
# Total: num_block * 15 + 1.  Residual adds, lrelu and the head run float.


def rrdb_num_stats(cfg) -> int:
    return cfg.num_block * 15 + 1


def _stat(h, percentile):
    a = jnp.abs(h.astype(jnp.float32))
    if percentile is None:
        return jnp.max(a)
    flat = a.reshape(-1)
    stride = max(1, flat.shape[0] // _PCT_SAMPLE_CAP)
    return jnp.percentile(flat[::stride], percentile)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype",
                                             "percentile"))
def collect_act_maxima_rrdb(params: Dict[str, Any], x: jax.Array, *,
                            cfg, compute_dtype=jnp.float32,
                            percentile: float = None) -> jax.Array:
    """Calibration forward over the RRDB trunk: (num_block * 15 + 1,)
    |activation| stats in the layout documented above.  `x`: (B, H, W, C)
    float in [0, 1] — representative frames (classic domain)."""
    from reve_tpu.models import rrdb as rrdb_mod
    from reve_tpu.ops.pixel_shuffle import pixel_unshuffle

    h = x
    if cfg.upscale == 2:
        h = pixel_unshuffle(h, 2)
    elif cfg.upscale == 1:
        h = pixel_unshuffle(h, 4)
    h = h.astype(compute_dtype)
    feat = rrdb_mod._conv(h, params["conv_first"], compute_dtype)
    stats = []
    body = feat
    for block in params["body"]:
        b_in = body
        out = b_in
        for rdb_p in block["rdbs"]:
            xin = out
            stats.append(_stat(xin, percentile))
            feats = [xin]
            for i, conv in enumerate(rdb_p["convs"]):
                g = rrdb_mod._conv(jnp.concatenate(feats, axis=-1), conv,
                                   compute_dtype)
                if i < 4:
                    g = rrdb_mod._lrelu(g)
                    stats.append(_stat(g, percentile))
                feats.append(g)
            out = feats[-1] * jnp.asarray(0.2, compute_dtype) + xin
        body = out * jnp.asarray(0.2, compute_dtype) + b_in
    stats.append(_stat(body, percentile))
    return jnp.stack(stats)


def quantize_rrdb(params: Dict[str, Any], cfg, act_maxima,
                  margin: float = 1.0) -> Dict[str, Any]:
    """Build the int8 RRDB trunk from f32 params + calibration stats.

    Returns a plain-pytree dict:
      body: per block, per rdb: {"w8": [5], "sw": [5], "b": [5]}
        (classic-domain HWIO int8 kernels with the per-part activation
        scales already folded; sw = per-output-channel dequant scale)
      conv_body: {"w8", "sw", "b"}
      act_scale: (num_block * 15 + 1,) f32 — quant scale per tensor in
        the collect_act_maxima_rrdb layout.
    """
    n = rrdb_num_stats(cfg)
    act_maxima = jnp.asarray(act_maxima, jnp.float32)
    if act_maxima.shape != (n,):
        raise ValueError(f"act_maxima must be ({n},), got "
                         f"{act_maxima.shape}")
    act_scale = jnp.maximum(act_maxima * float(margin), 1e-8) / 127.0
    nf, gc = cfg.num_feat, cfg.num_grow_ch

    def _qw_folded(w, part_scales, part_channels):
        w = jnp.asarray(w, jnp.float32)
        sc = jnp.concatenate([
            jnp.full((c,), s, jnp.float32)
            for s, c in zip(part_scales, part_channels)
        ])
        wf = w * sc[None, None, :, None]
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
        return (jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8), s)

    body = []
    si = 0
    for block in params["body"]:
        rdbs = []
        for rdb_p in block["rdbs"]:
            scales = act_scale[si:si + 5]  # [x, h1, h2, h3, h4]
            si += 5
            w8, sw, b = [], [], []
            for i, conv in enumerate(rdb_p["convs"]):
                q, s = _qw_folded(conv["w"], [scales[k] for k in range(i + 1)],
                                  [nf] + [gc] * i)
                w8.append(q)
                sw.append(s)
                b.append(jnp.asarray(conv["b"], jnp.float32))
            rdbs.append({"w8": w8, "sw": sw, "b": b})
        body.append(rdbs)
    q, s = _qw_folded(params["conv_body"]["w"], [act_scale[si]], [nf])
    assert si == n - 1, (si, n)
    return {
        "body": body,
        "conv_body": {"w8": q, "sw": s,
                      "b": jnp.asarray(params["conv_body"]["b"],
                                       jnp.float32)},
        "act_scale": act_scale,
    }


# -- model dispatch (the engine is model-agnostic) ----------------------------


def collect_maxima(params, x, *, cfg, compute_dtype=jnp.float32,
                   percentile: float = None):
    """Calibration stats for any supported architecture."""
    if isinstance(cfg, srvgg.SRVGGConfig):
        return collect_act_maxima(params, x, cfg=cfg,
                                  compute_dtype=compute_dtype,
                                  percentile=percentile)
    return collect_act_maxima_rrdb(params, x, cfg=cfg,
                                   compute_dtype=compute_dtype,
                                   percentile=percentile)


def build_qbody(params, cfg, act_maxima, margin: float = 1.0):
    """Quantized-body pytree for any supported architecture."""
    if isinstance(cfg, srvgg.SRVGGConfig):
        return quantize_hidden(params, cfg, act_maxima, margin=margin)
    return quantize_rrdb(params, cfg, act_maxima, margin=margin)
