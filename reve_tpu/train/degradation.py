"""Real-ESRGAN-style second-order synthetic degradation.

The models this framework serves (`realesr-animevideov3`, the x4plus RRDB
family — the nets inside the reference's `realesrgan-ncnn-vulkan` engine,
reve-shared/src/lib.rs:134-147) were trained on the "high-order" synthetic
degradation recipe published with Real-ESRGAN (Wang et al., ICCVW 2021):
two rounds of {blur -> random resize -> noise -> JPEG}, with sinc-filter
ringing artifacts mixed in.  Reproducing that pipeline is what makes
fine-tuning / distillation on user footage (reve_tpu.train) match the
published models' robustness, so it is a first-class training component
here — implemented from scratch on numpy + cv2 (host side; the TPU only
ever sees the resulting LR/HR pairs).

Stages (each draw is independent per patch, driven by one RandomState):

  1st order:  blur(iso/aniso gaussian | generalized gaussian | plateau,
              or sinc with prob `sinc_prob`)
              -> resize(up/down/keep, random interp)
              -> noise(gaussian | poisson, optionally grayscale)
              -> JPEG(quality in `jpeg_range`)
  2nd order (with prob `second_order_prob`): same again with its own
              (gentler) ranges
  final:      resize to the exact LR size (1/scale), then with prob
              `final_sinc_prob` a final sinc filter — applied in random
              order relative to the final JPEG, as published.

Everything is deterministic given the RandomState, which keeps the tests
hermetic and the distillation runs reproducible.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class DegradationConfig:
    """Knobs follow the published Real-ESRGAN training configuration
    (x4plus recipe); ranges are (lo, hi) uniform draws."""

    scale: int = 4

    # -- first-order blur
    kernel_range: Tuple[int, ...] = (7, 9, 11, 13, 15, 17, 19, 21)
    kernel_probs: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    #                iso    aniso  gen-iso gen-aniso plateau-iso plateau-aniso
    sinc_prob: float = 0.1
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)   # generalized gaussian
    betap_range: Tuple[float, float] = (1.0, 2.0)   # plateau

    # -- first-order resize
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)  # up/down/keep
    resize_range: Tuple[float, float] = (0.15, 1.5)

    # -- first-order noise
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1.0, 30.0)       # gaussian sigma/255
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30.0, 95.0)

    # -- second order
    second_order_prob: float = 0.8
    second_blur_prob: float = 0.8
    blur_sigma2: Tuple[float, float] = (0.2, 1.5)
    betag_range2: Tuple[float, float] = (0.5, 4.0)
    betap_range2: Tuple[float, float] = (1.0, 2.0)
    sinc_prob2: float = 0.1
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1.0, 25.0)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30.0, 95.0)

    # -- final
    final_sinc_prob: float = 0.8


# --------------------------------------------------------------- kernels


def _mesh(size: int) -> Tuple[np.ndarray, np.ndarray]:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    return np.meshgrid(ax, ax)  # xx (cols), yy (rows)


def _sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.array([[sig_x ** 2, 0.0], [0.0, sig_y ** 2]])
    u = np.array([[math.cos(theta), -math.sin(theta)],
                  [math.sin(theta), math.cos(theta)]])
    return u @ d @ u.T


def gaussian_kernel(size: int, sig_x: float, sig_y: Optional[float] = None,
                    theta: float = 0.0, beta: float = 1.0,
                    plateau: bool = False) -> np.ndarray:
    """(An)isotropic (generalized / plateau-shaped) gaussian blur kernel.

    beta == 1, plateau False -> plain gaussian; beta != 1 -> generalized
    gaussian exp(-(q/2)^beta); plateau -> 1/(1+(q/2)^beta) heavy-tailed.
    Normalized to sum 1.
    """
    sig_y = sig_x if sig_y is None else sig_y
    xx, yy = _mesh(size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    q = inv[0, 0] * xx * xx + (inv[0, 1] + inv[1, 0]) * xx * yy \
        + inv[1, 1] * yy * yy
    if plateau:
        k = 1.0 / ((q / 2.0) ** beta + 1.0)
    else:
        k = np.exp(-((q / 2.0) ** beta))
    return (k / k.sum()).astype(np.float32)


def sinc_kernel(size: int, cutoff: float) -> np.ndarray:
    """2D circular low-pass (sinc) filter with the given cutoff frequency —
    the ringing/overshoot artifact synthesizer.  kernel(r) proportional to
    cutoff * J1(cutoff*r) / r (jinc), normalized to sum 1."""
    from scipy.special import j1

    xx, yy = _mesh(size)
    r = np.hypot(xx, yy)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * j1(cutoff * r) / (2.0 * math.pi * r)
    k[(size - 1) // 2, (size - 1) // 2] = cutoff ** 2 / (4.0 * math.pi)
    return (k / k.sum()).astype(np.float32)


def random_blur_kernel(rng: np.random.RandomState, size: int,
                       sigma_range: Tuple[float, float],
                       betag_range: Tuple[float, float],
                       betap_range: Tuple[float, float],
                       kernel_probs: Sequence[float]) -> np.ndarray:
    """Draw one kernel from the 6-way mixture (iso/aniso x
    {gaussian, generalized, plateau})."""
    kind = rng.choice(6, p=np.asarray(kernel_probs) / np.sum(kernel_probs))
    sig_x = rng.uniform(*sigma_range)
    aniso = kind in (1, 3, 5)
    sig_y = rng.uniform(*sigma_range) if aniso else sig_x
    theta = rng.uniform(-math.pi, math.pi) if aniso else 0.0
    if kind in (0, 1):
        return gaussian_kernel(size, sig_x, sig_y, theta)
    if kind in (2, 3):
        return gaussian_kernel(size, sig_x, sig_y, theta,
                               beta=rng.uniform(*betag_range))
    return gaussian_kernel(size, sig_x, sig_y, theta,
                           beta=rng.uniform(*betap_range), plateau=True)


def random_sinc_kernel(rng: np.random.RandomState, size: int) -> np.ndarray:
    lo = math.pi / 3.0 if size < 13 else math.pi / 5.0
    return sinc_kernel(size, rng.uniform(lo, math.pi))


# ---------------------------------------------------------------- stages


def _filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.filter2D(img, -1, kernel, borderType=cv2.BORDER_REFLECT)


_INTERPS = None


def _random_resize(img: np.ndarray, rng: np.random.RandomState,
                   probs: Tuple[float, float, float],
                   rrange: Tuple[float, float],
                   base_hw: Tuple[int, int]) -> np.ndarray:
    import cv2

    global _INTERPS
    if _INTERPS is None:
        _INTERPS = (cv2.INTER_AREA, cv2.INTER_LINEAR, cv2.INTER_CUBIC)
    mode = rng.choice(3, p=np.asarray(probs) / np.sum(probs))
    if mode == 0:
        factor = rng.uniform(1.0, rrange[1])      # upscale
    elif mode == 1:
        factor = rng.uniform(rrange[0], 1.0)      # downscale
    else:
        factor = 1.0
    h = max(1, int(round(base_hw[0] * factor)))
    w = max(1, int(round(base_hw[1] * factor)))
    interp = _INTERPS[rng.choice(3)]
    return cv2.resize(img, (w, h), interpolation=interp)


def add_noise(img: np.ndarray, rng: np.random.RandomState,
              gaussian_prob: float, noise_range: Tuple[float, float],
              poisson_range: Tuple[float, float],
              gray_prob: float) -> np.ndarray:
    """Gaussian or poisson (shot) noise in [0,1] units; grayscale noise
    (same draw on all channels) with prob gray_prob."""
    gray = rng.rand() < gray_prob
    shape = img.shape[:2] + ((1,) if gray else (img.shape[2],))
    if rng.rand() < gaussian_prob:
        sigma = rng.uniform(*noise_range) / 255.0
        noise = rng.normal(0.0, sigma, shape).astype(np.float32)
    else:
        # shot noise: photon count proportional to 255/strength, so higher
        # strength -> fewer photons -> more noise; gray derives from luma
        strength = rng.uniform(*poisson_range)
        base = img.mean(2, keepdims=True) if gray else img
        photons = 255.0 / max(strength, 1e-3)
        noisy = rng.poisson(np.clip(base, 0, 1) * photons) / photons
        noise = (noisy - base).astype(np.float32)
    return np.clip(img + noise, 0.0, 1.0)


def jpeg_compress(img: np.ndarray, quality: float) -> np.ndarray:
    """Round-trip through a real JPEG encode at the given quality."""
    import cv2

    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, int(round(quality))])
    if not ok:  # pragma: no cover - cv2 jpeg always present
        return img
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
    return dec.astype(np.float32) / 255.0


# --------------------------------------------------------------- pipeline


def _order1(img, rng, cfg: DegradationConfig, base_hw):
    size = int(rng.choice(cfg.kernel_range))
    if rng.rand() < cfg.sinc_prob:
        k = random_sinc_kernel(rng, size)
    else:
        k = random_blur_kernel(rng, size, cfg.blur_sigma, cfg.betag_range,
                               cfg.betap_range, cfg.kernel_probs)
    img = _filter2d(img, k)
    img = _random_resize(img, rng, cfg.resize_prob, cfg.resize_range,
                         base_hw)
    img = add_noise(img, rng, cfg.gaussian_noise_prob, cfg.noise_range,
                    cfg.poisson_scale_range, cfg.gray_noise_prob)
    return jpeg_compress(img, rng.uniform(*cfg.jpeg_range))


def _order2(img, rng, cfg: DegradationConfig, base_hw):
    if rng.rand() < cfg.second_blur_prob:
        size = int(rng.choice(cfg.kernel_range))
        if rng.rand() < cfg.sinc_prob2:
            k = random_sinc_kernel(rng, size)
        else:
            k = random_blur_kernel(rng, size, cfg.blur_sigma2,
                                   cfg.betag_range2, cfg.betap_range2,
                                   cfg.kernel_probs)
        img = _filter2d(img, k)
    img = _random_resize(img, rng, cfg.resize_prob2, cfg.resize_range2,
                         base_hw)
    return add_noise(img, rng, cfg.gaussian_noise_prob2, cfg.noise_range2,
                     cfg.poisson_scale_range2, cfg.gray_noise_prob2)


def degrade_realesrgan(hr: np.ndarray, cfg: DegradationConfig,
                       rng: np.random.RandomState) -> np.ndarray:
    """HR float32 [0,1] (H, W, 3) -> LR float32 [0,1] (H/s, W/s, 3) via the
    full second-order pipeline.  H and W must be divisible by cfg.scale."""
    import cv2

    h, w = hr.shape[:2]
    if h % cfg.scale or w % cfg.scale:
        raise ValueError(f"HR dims {h}x{w} not divisible by x{cfg.scale}")
    base_hw = (h, w)
    img = hr.astype(np.float32)

    img = _order1(img, rng, cfg, base_hw)
    if rng.rand() < cfg.second_order_prob:
        img = _order2(img, rng, cfg, base_hw)

    # final: back to the exact LR geometry; sinc + jpeg in random order
    lr_hw = (w // cfg.scale, h // cfg.scale)  # cv2 takes (w, h)
    interp = (cv2.INTER_AREA, cv2.INTER_LINEAR, cv2.INTER_CUBIC)[
        rng.choice(3)]
    quality = rng.uniform(*cfg.jpeg_range2)
    use_sinc = rng.rand() < cfg.final_sinc_prob
    sinc_k = random_sinc_kernel(rng, 21) if use_sinc else None
    if rng.rand() < 0.5:
        img = cv2.resize(img, lr_hw, interpolation=interp)
        if sinc_k is not None:
            img = _filter2d(img, sinc_k)
        img = jpeg_compress(img, quality)
    else:
        img = jpeg_compress(img, quality)
        img = cv2.resize(img, lr_hw, interpolation=interp)
        if sinc_k is not None:
            img = _filter2d(img, sinc_k)
    return np.clip(img, 0.0, 1.0).astype(np.float32)
