"""Losses and image-quality metrics for super-resolution training."""

from __future__ import annotations

import jax.numpy as jnp


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray,
                eps: float = 1e-3) -> jnp.ndarray:
    """Charbonnier (smooth L1) — the standard Real-ESRGAN pixel loss."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (also the acceptance metric for
    numeric parity vs reference outputs, BASELINE.md: PSNR >= 50 dB)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))
