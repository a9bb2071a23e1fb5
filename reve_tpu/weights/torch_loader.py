"""Loader for upstream Real-ESRGAN PyTorch checkpoints (.pth).

Published SRVGGNetCompact checkpoints (e.g. realesr-animevideov3.pth) store a
state dict under 'params' with keys:

    body.0.weight / body.0.bias      first conv (OIHW / O)
    body.1.weight                    PReLU alpha
    body.2.weight / body.2.bias ...  alternating conv / prelu
    body.<2*(num_conv+1)>.weight     last conv

torch (CPU build) is only imported when this loader is actually used; the
rest of the framework has no torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_numpy_state(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict):
        for key in ("params", "params_ema", "state_dict"):
            if key in blob and isinstance(blob[key], dict):
                blob = blob[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in blob.items()}


def load_srvgg_pth(path: str):
    """realesr .pth -> (SRVGGConfig, params pytree)."""
    import jax.numpy as jnp

    from reve_tpu.models.srvgg import SRVGGConfig

    sd = _to_numpy_state(path)
    body_idx = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("body.")}
    )
    n_body = max(body_idx) + 1
    # layers alternate conv, prelu, conv, prelu, ..., conv
    num_conv = (n_body - 3) // 2
    convs, prelus = [], []
    for i in body_idx:
        w = sd[f"body.{i}.weight"]
        if w.ndim == 4:  # conv, OIHW
            b = sd.get(f"body.{i}.bias", np.zeros((w.shape[0],), np.float32))
            convs.append(
                {
                    "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "b": jnp.asarray(b),
                }
            )
        else:  # prelu alpha
            prelus.append({"alpha": jnp.asarray(w)})
    num_feat = int(convs[0]["w"].shape[-1])
    num_in_ch = int(convs[0]["w"].shape[2])
    last_out = int(convs[-1]["w"].shape[-1])
    # upscale from last conv: out_ch * r^2
    for num_out_ch in (num_in_ch, 3, 1):
        r = int(round((last_out / num_out_ch) ** 0.5))
        if r * r * num_out_ch == last_out:
            break
    else:
        raise ValueError(f"cannot infer upscale from last conv ({last_out})")
    cfg = SRVGGConfig(
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        num_feat=num_feat,
        num_conv=num_conv,
        upscale=r,
    )
    return cfg, {"convs": convs, "prelus": prelus}


def load_state_dict_numpy(path: str) -> Dict[str, Any]:
    """Raw access for other archs (RRDBNet loader builds on this)."""
    return _to_numpy_state(path)


def save_srvgg_pth(path: str, cfg, params) -> None:
    """(SRVGGConfig, params pytree) -> realesr-compatible .pth.

    Exact inverse of load_srvgg_pth: convs go back to OIHW under the
    alternating body.<i> numbering, state dict under 'params'.  This is
    how locally trained/distilled students (scripts/distill.py,
    scripts/distill_frontier.py) become product weights the registry and
    the upstream ecosystem can both load — the reference consumes ncnn
    conversions of exactly this file format (reve-shared/src/lib.rs:134-147
    spawns realesrgan-ncnn-vulkan with converted realesr .pth models)."""
    import torch

    sd = {}
    convs, prelus = params["convs"], params["prelus"]
    if len(convs) != cfg.num_conv + 2 or len(prelus) != cfg.num_conv + 1:
        raise ValueError(
            f"params shape mismatch: {len(convs)} convs/{len(prelus)} "
            f"prelus vs cfg num_conv={cfg.num_conv}")
    for i, c in enumerate(convs):
        w = np.transpose(np.asarray(c["w"], np.float32), (3, 2, 0, 1))
        sd[f"body.{2 * i}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"body.{2 * i}.bias"] = torch.from_numpy(
            np.asarray(c["b"], np.float32).copy())
        if i < len(prelus):
            sd[f"body.{2 * i + 1}.weight"] = torch.from_numpy(
                np.asarray(prelus[i]["alpha"], np.float32).copy())
    torch.save({"params": sd}, path)
