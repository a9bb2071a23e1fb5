"""RRDBNet — the full-size RealESRGAN generator (x4plus / x4plus-anime-6B).

The reference only ships the compact SRVGG anime model inside its ncnn
binary; RRDBNet support is the stretch model family from BASELINE.json
config #4 ("RealESRGAN-x4plus RRDBNet general-photo model").

Functional JAX, NHWC activations / HWIO weights, bf16-able like srvgg.
Architecture mirrors upstream Real-ESRGAN `RRDBNet`:

    conv_first -> nb x RRDB -> conv_body (+ residual)
    -> [nearest x2 + conv_up1 + lrelu] x2 -> conv_hr + lrelu -> conv_last

    RDB  (dense block): 5 convs with dense concats, growth gc, out*0.2 + x
    RRDB: 3 RDBs chained, out*0.2 + x

Scales: x4 native; x2 / x1 via pixel-unshuffling the input (2x / 4x) into
channels, as upstream does.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from reve_tpu.ops import s2d as s2d_mod
from reve_tpu.ops.pixel_shuffle import pixel_unshuffle
from reve_tpu.ops.resize import upsample_nearest


@dataclasses.dataclass(frozen=True)
class RRDBConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    upscale: int = 4   # output scale; x2/x1 pixel-unshuffle the input


Params = Dict[str, Any]


def _conv_init(key, cin, cout, dtype, scale=1.0):
    wkey, bkey = jax.random.split(key)
    fan_in = cin * 9
    bound = scale / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (3, 3, cin, cout), dtype, -bound, bound),
        "b": jnp.zeros((cout,), dtype),
    }


def init_params(key: jax.Array, cfg: RRDBConfig, dtype=jnp.float32) -> Params:
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    cin = cfg.num_in_ch * (4 if cfg.upscale == 2 else
                           16 if cfg.upscale == 1 else 1)
    keys = iter(jax.random.split(key, 6 + cfg.num_block * 16))

    def rdb():
        return {
            "convs": [
                _conv_init(next(keys), nf + i * gc,
                           gc if i < 4 else nf, dtype, scale=0.1)
                for i in range(5)
            ]
        }

    return {
        "conv_first": _conv_init(next(keys), cin, nf, dtype),
        "body": [
            {"rdbs": [rdb() for _ in range(3)]} for _ in range(cfg.num_block)
        ],
        "conv_body": _conv_init(next(keys), nf, nf, dtype),
        "conv_up1": _conv_init(next(keys), nf, nf, dtype),
        "conv_up2": _conv_init(next(keys), nf, nf, dtype),
        "conv_hr": _conv_init(next(keys), nf, nf, dtype),
        "conv_last": _conv_init(next(keys), nf, cfg.num_out_ch, dtype),
    }


def _raw_conv(x, w, b, dtype):
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return (y + b.astype(jnp.float32)).astype(dtype)


def _conv(x, p, dtype):
    return _raw_conv(x, p["w"], p["b"], dtype)


def _conv_s2d(x, p, dtype, parts=None):
    """2D-s2d conv: kernel transformed per concat part (reve_tpu.ops.s2d).

    Every conv in the dense blocks has only 32 (or 64) output channels —
    a quarter (half) of the MXU's output-tile width.  Folding 2x2 pixel
    phases into channels quadruples channel counts for 4x the FLOPs at a
    measured ~6.7x rate (PERF.md round-2: 32-ch stack 10.4 TF/s vs 128-ch
    69 TF/s on v5e) — a large net win for exactly this architecture."""
    if parts is None:
        parts = [p["w"].shape[2]]
    w = s2d_mod.s2d2_kernel_concat(p["w"], parts)
    return _raw_conv(x, w, jnp.tile(p["b"], 4), dtype)


def transform_params_s2d(params: Params, cfg: RRDBConfig) -> Params:
    """Pre-transform the trunk weights into the 2D-s2d domain ONCE (engine
    init) instead of re-deriving ~350 kernels inside every forward call.
    Head convs (upsample path) stay classic.  Use with
    apply(..., s2d=True, params_transformed=True)."""
    nf, gc = cfg.num_feat, cfg.num_grow_ch

    def t(p, parts=None):
        return {
            "w": s2d_mod.s2d2_kernel_concat(
                p["w"], parts or [p["w"].shape[2]]),
            "b": jnp.tile(p["b"], 4),
        }

    return {
        "conv_first": t(params["conv_first"]),
        "body": [
            {
                "rdbs": [
                    {
                        "convs": [
                            t(c, [nf] + [gc] * i)
                            for i, c in enumerate(rdb["convs"])
                        ]
                    }
                    for rdb in block["rdbs"]
                ]
            }
            for block in params["body"]
        ],
        "conv_body": t(params["conv_body"]),
        "conv_up1": params["conv_up1"],
        "conv_up2": params["conv_up2"],
        "conv_hr": params["conv_hr"],
        "conv_last": params["conv_last"],
    }


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(x, p, dtype, conv_fn, nf, gc):
    feats = [x]
    for i, conv in enumerate(p["convs"]):
        parts = [nf] + [gc] * i
        h = conv_fn(jnp.concatenate(feats, axis=-1), conv, dtype, parts)
        if i < 4:
            h = _lrelu(h)
        feats.append(h)
    return feats[-1] * jnp.asarray(0.2, dtype) + x


def _rrdb(x, p, dtype, conv_fn, nf, gc):
    out = x
    for rdb_p in p["rdbs"]:
        out = _rdb(out, rdb_p, dtype, conv_fn, nf, gc)
    return out * jnp.asarray(0.2, dtype) + x


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "s2d", "params_transformed"),
)
def apply(params: Params, x: jax.Array, *, cfg: RRDBConfig,
          compute_dtype=jnp.float32, s2d: bool = True,
          params_transformed: bool = False) -> jax.Array:
    """(B, H, W, C) in [0,1] -> (B, H*upscale, W*upscale, C) float32.

    s2d: run conv_first + the RRDB trunk + conv_body in the 2D
    space-to-depth domain (exact; see _conv_s2d).  Falls back to the
    classic path when the (pixel-unshuffled) input dims are odd.
    params_transformed: params came from transform_params_s2d (requires
    s2d and even dims; the engine precomputes them once).
    """
    dtype = compute_dtype
    h = x
    if cfg.upscale == 2:
        h = pixel_unshuffle(h, 2)
    elif cfg.upscale == 1:
        h = pixel_unshuffle(h, 4)
    h = h.astype(dtype)
    use_s2d = s2d and h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0
    if params_transformed and not use_s2d:
        raise ValueError(
            "transformed params require s2d and even trunk dims "
            f"(got {h.shape})"
        )
    if use_s2d:
        hs = s2d_mod.s2d2(h)
        if params_transformed:
            def conv_fn(v, p, dt, parts):
                return _raw_conv(v, p["w"], p["b"], dt)
        else:
            def conv_fn(v, p, dt, parts):
                return _conv_s2d(v, p, dt, parts)

        feat_s = conv_fn(hs, params["conv_first"], dtype, None)
        body = feat_s
        for block in params["body"]:
            body = _rrdb(body, block, dtype, conv_fn,
                         cfg.num_feat, cfg.num_grow_ch)
        feat_s = feat_s + conv_fn(body, params["conv_body"], dtype, None)
        feat = s2d_mod.d2s2(feat_s)
    else:
        feat = _conv(h, params["conv_first"], dtype)

        def conv_fn(v, p, dt, parts):
            return _conv(v, p, dt)

        body = feat
        for block in params["body"]:
            body = _rrdb(body, block, dtype, conv_fn,
                         cfg.num_feat, cfg.num_grow_ch)
        feat = feat + _conv(body, params["conv_body"], dtype)
    feat = _lrelu(_conv(upsample_nearest(feat, 2), params["conv_up1"], dtype))
    feat = _lrelu(_conv(upsample_nearest(feat, 2), params["conv_up2"], dtype))
    out = _conv(_lrelu(_conv(feat, params["conv_hr"], dtype)),
                params["conv_last"], dtype)
    return out.astype(jnp.float32)


# -- int8 turbo mode ----------------------------------------------------------


def _dq(y32, sw, b, tile_n):
    """s32 conv output -> f32: per-output-channel dequant + bias."""
    if tile_n > 1:
        sw, b = jnp.tile(sw, tile_n), jnp.tile(b, tile_n)
    return y32.astype(jnp.float32) * sw + b


def _rdb_int8(x_f, qrdb, scales, conv_s8, quant, nf, gc, tile_n):
    """One RDB with the 5 dense convs in int8.

    x_f: float RDB input; scales: (5,) quant scales [x, h1..h4] (the
    per-part dequant side is already folded into qrdb's weights —
    weights/quantize.py).  Residual add stays float."""
    feats8 = [quant(x_f, scales[0])]
    h = None
    for i in range(5):
        y32 = conv_s8(jnp.concatenate(feats8, axis=-1), qrdb["w8"][i],
                      [nf] + [gc] * i)
        h = _dq(y32, qrdb["sw"][i], qrdb["b"][i], tile_n)
        if i < 4:
            h = _lrelu(h)
            feats8.append(quant(h, scales[i + 1]))
    return h * 0.2 + x_f.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "quantize_u8", "s2d"),
)
def apply_int8(params: Params, qbody, x: jax.Array, *, cfg: RRDBConfig,
               compute_dtype=jnp.bfloat16, quantize_u8: bool = False,
               s2d: bool = True) -> jax.Array:
    """Forward pass with the RRDB trunk quantized to int8 (turbo mode).

    `qbody`: weights/quantize.quantize_rrdb output (classic-domain int8
    trunk kernels with folded per-part activation scales; the s2d kernel
    transform is applied here, mirroring `apply`).  The 23x3x5 dense convs
    + conv_body run as s8 x s8 -> s32 on the MXU; conv_first, the residual
    adds, lrelu and the 4 head convs run float exactly like `apply`.
    Dequant + bias + lrelu + requant chains are f32 elementwise XLA fuses
    into the conv epilogues.

    Costs PSNR vs `apply`; opt-in via `--dtype int8` (auto mode keeps
    RRDB on the exact path — pipeline/scheduler.resolve_auto_dtype).
    """
    from reve_tpu.models.srvgg import _conv3x3_s8, _quant_s8

    dtype = compute_dtype
    h = x
    if cfg.upscale == 2:
        h = pixel_unshuffle(h, 2)
    elif cfg.upscale == 1:
        h = pixel_unshuffle(h, 4)
    h = h.astype(dtype)
    use_s2d = s2d and h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    act = qbody["act_scale"]

    if use_s2d:
        def conv_s8(v8, w8, parts):
            return _conv3x3_s8(v8, s2d_mod.s2d2_kernel_concat(w8, parts))

        def quant(v, s):
            return _quant_s8(v, s)

        tile_n = 4
        hs = s2d_mod.s2d2(h)
        feat = _conv_s2d(hs, params["conv_first"], dtype)
    else:
        def conv_s8(v8, w8, parts):
            return _conv3x3_s8(v8, w8)

        quant, tile_n = _quant_s8, 1
        feat = _conv(h, params["conv_first"], dtype)

    body = feat.astype(jnp.float32)
    si = 0
    for qblock in qbody["body"]:
        b_in = body
        out = b_in
        for qrdb in qblock:
            out = _rdb_int8(out, qrdb, act[si:si + 5], conv_s8, quant,
                            nf, gc, tile_n)
            si += 5
        body = out * 0.2 + b_in
    y32 = conv_s8(quant(body, act[si]), qbody["conv_body"]["w8"], [nf])
    feat = feat.astype(jnp.float32) + _dq(y32, qbody["conv_body"]["sw"],
                                          qbody["conv_body"]["b"], tile_n)
    feat = feat.astype(dtype)
    if use_s2d:
        feat = s2d_mod.d2s2(feat)
    feat = _lrelu(_conv(upsample_nearest(feat, 2), params["conv_up1"], dtype))
    feat = _lrelu(_conv(upsample_nearest(feat, 2), params["conv_up2"], dtype))
    out = _conv(_lrelu(_conv(feat, params["conv_hr"], dtype)),
                params["conv_last"], dtype)
    if quantize_u8:
        return jnp.clip(out.astype(jnp.float32) * 255.0 + 0.5,
                        0.0, 255.0).astype(jnp.uint8)
    return out.astype(jnp.float32)


# -- weight loading ----------------------------------------------------------

def load_pth(path: str):
    """RealESRGAN RRDBNet .pth -> (RRDBConfig, params).

    Upstream key layout: conv_first, body.<i>.rdb<j>.conv<k>, conv_body,
    conv_up1/2, conv_hr, conv_last  (weights OIHW).
    """
    from reve_tpu.weights.torch_loader import load_state_dict_numpy

    sd = load_state_dict_numpy(path)

    def conv(name):
        w = sd[f"{name}.weight"]
        b = sd.get(f"{name}.bias", np.zeros((w.shape[0],), np.float32))
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(b),
        }

    num_block = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body.")
    )
    first_w = sd["conv_first.weight"]
    nf = first_w.shape[0]
    cin = first_w.shape[1]
    gc = sd["body.0.rdb1.conv1.weight"].shape[0]
    upscale = {3: 4, 12: 2, 48: 1}.get(cin, 4)
    cfg = RRDBConfig(
        num_in_ch=3, num_out_ch=sd["conv_last.weight"].shape[0],
        num_feat=nf, num_block=num_block, num_grow_ch=gc, upscale=upscale,
    )
    params = {
        "conv_first": conv("conv_first"),
        "body": [
            {
                "rdbs": [
                    {
                        "convs": [
                            conv(f"body.{i}.rdb{j + 1}.conv{k + 1}")
                            for k in range(5)
                        ]
                    }
                    for j in range(3)
                ]
            }
            for i in range(num_block)
        ],
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    return cfg, params


def load_model(spec, scale: int, weights=None, allow_random_init=None):
    """Registry hook (reve_tpu.models.registry.load_model for rrdb arch).

    Same missing-weights contract as the srvgg path: no resolvable weights
    is an error unless random init is explicitly allowed (the reference
    engine fails hard without model files, reve-shared/src/lib.rs:140-143).
    """
    import logging
    import os

    log = logging.getLogger(__name__)
    if weights:
        # a nonexistent explicit path is a loud error, not a silent
        # random-init fallback (matches the srvgg path's behavior)
        cfg, params = load_pth(weights)
        if cfg.upscale != scale:
            raise ValueError(
                f"weights are x{cfg.upscale}, requested x{scale}"
            )
        return cfg, params
    from reve_tpu.models.registry import _find_weight_files

    found = _find_weight_files(spec.canonical)
    if found and found[0] == "pth":
        cfg, params = load_pth(found[1])
        if cfg.upscale != scale:
            raise ValueError(
                f"found weights {found[1]!r} are x{cfg.upscale}, "
                f"requested x{scale}"
            )
        return cfg, params
    from reve_tpu.models.registry import (MissingWeightsError,
                                          missing_weights_message,
                                          random_init_allowed)

    if not random_init_allowed(allow_random_init):
        raise MissingWeightsError(
            missing_weights_message(spec.canonical, scale, spec.canonical))
    log.warning(
        "no weights for %s; using deterministic random init", spec.canonical
    )
    cfg = RRDBConfig(num_feat=spec.num_feat, num_block=spec.num_conv,
                     upscale=scale)
    return cfg, init_params(jax.random.key(0), cfg)
