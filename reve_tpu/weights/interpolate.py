"""Weight interpolation (upstream Real-ESRGAN's `-dni` / denoise strength).

The general model family ships paired checkpoints (`realesr-general-x4v3`
and its `-wdn` weight-denoised twin); denoise strength d in [0,1] is
realized by linearly interpolating every parameter:

    params = (1 - d) * wdn + d * plain      (upstream dni convention)

Works on any two structurally identical param pytrees (srvgg or rrdb).
"""

from __future__ import annotations

import jax


def interpolate(params_a, params_b, weight_b: float):
    """(1 - weight_b) * a + weight_b * b, leaf-wise."""
    if not 0.0 <= weight_b <= 1.0:
        raise ValueError(f"interpolation weight must be in [0,1], got {weight_b}")

    def leaf(a, b):
        if a.shape != b.shape:
            raise ValueError(
                f"param shape mismatch: {a.shape} vs {b.shape} — models are "
                "not structurally identical"
            )
        return (1.0 - weight_b) * a + weight_b * b

    return jax.tree_util.tree_map(leaf, params_a, params_b)


def load_dni(path_wdn: str, path_plain: str, denoise_strength: float):
    """Load both .pth checkpoints and blend per the upstream dni
    convention (params = (1-d)*wdn + d*plain): denoise_strength 1.0 =
    pure plain model (full denoising), 0.0 = pure wdn twin (weak-denoise,
    preserves grain/detail)."""
    from reve_tpu.weights.torch_loader import load_srvgg_pth

    cfg_w, params_w = load_srvgg_pth(path_wdn)
    cfg_p, params_p = load_srvgg_pth(path_plain)
    if cfg_w != cfg_p:
        raise ValueError(f"config mismatch: {cfg_w} vs {cfg_p}")
    return cfg_w, interpolate(params_w, params_p, denoise_strength)
