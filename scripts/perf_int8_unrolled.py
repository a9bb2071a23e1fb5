"""Unrolled-graph int8 body probe: batch/row-split shapes (PERF.md attack b).

The fori-loop shapes sweep in perf_int8_r3.py underestimates the
flagship's unrolled 16-layer graph (XLA schedules it better), so this
probe replays the interesting row-split shapes on the unrolled form:

  b16x540  — the flagship whole-frame s2d geometry (1080p, 16 frames)
  b32x272  — each frame's rows split in half (272 = 270 pad to 8-align)
  b24x368  — 2/3-row split

Round-3 result (best-of fresh compiles): 14.24 / 13.55 / 18.10 ms/frame.
b32 half-rows is ~5% faster on seam-free synthetic halves, but an EXACT
split needs >=16 halo rows per cut side (33-row receptive field), i.e.
576 rows/frame instead of 540 -> 14.35 ms/frame: the halo recompute eats
the gain.  Closed as unshippable; see PERF.md "Unrolled-graph
replication".

Run on TPU: python scripts/perf_int8_unrolled.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from reve_tpu.utils import compileopts

LAYERS, ITERS, C = 16, 6, 128


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def make_body(attempt):
    # attempt-varying barrier constant cache-busts the compile lottery
    # (PERF.md "Environment pathologies")
    def f(x, w8, alphas, scales):
        bust = lax.optimization_barrier(
            jnp.zeros((attempt + 1,), jnp.int32))
        x = x + bust[0].astype(x.dtype)
        for i in range(LAYERS):  # unrolled, like the flagship graph
            y = conv(x, w8[i])
            fy = y.astype(jnp.float32) * scales[i]
            fy = jnp.where(fy >= 0, fy, fy * alphas[i])
            x = jnp.clip(jnp.round(fy * 127.0), -128, 127).astype(jnp.int8)
        return jnp.sum(x.astype(jnp.int32))
    return f


def main():
    opts = compileopts.default_compiler_options()
    rs = np.random.RandomState(0)
    w8 = jax.device_put(rs.randint(-128, 128, (LAYERS, 3, 3, C, C), np.int8))
    alphas = jax.device_put(np.full((LAYERS, C), 0.1, np.float32))
    scales = jax.device_put(np.full((LAYERS,), 1 / 4096.0, np.float32))

    shapes = (("b16x540 (flagship)", 16, 540, 16),
              ("b32x272 (half-rows)", 32, 272, 16),
              ("b24x368 (2/3-rows)", 24, 368, 16))
    for label, b, h, frames_per_batch in shapes:
        x8 = jax.device_put(rs.randint(-128, 128, (b, h, 1920, C), np.int8))
        best = None
        for attempt in range(3):
            try:
                fn = jax.jit(make_body(attempt),
                             compiler_options=opts or None)
                t0 = time.perf_counter()
                r = fn(x8, w8, alphas, scales)
                jax.block_until_ready(r)
                cs = time.perf_counter() - t0
                float(np.asarray(r).ravel()[0])  # scalar sync (relay-safe)
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    r = fn(x8, w8, alphas, scales)
                float(np.asarray(r).ravel()[0])
                ms = (time.perf_counter() - t0) / ITERS / frames_per_batch * 1000
                tops = (2 * 2.75e12 * 0.92 / (ms / 1000) / 1e12
                        * (b * h / (16 * 540)))
                print(f"{label} attempt {attempt}: compile {cs:.0f}s "
                      f"{ms:.2f} ms/frame ~{tops:.0f} TOP/s", flush=True)
                best = ms if best is None else min(best, ms)
                if attempt >= 1:
                    break
            except Exception as e:  # noqa: BLE001 — probe keeps going
                print(f"{label} attempt {attempt} FAILED: "
                      f"{type(e).__name__} {str(e)[:200]}", flush=True)
        print(f"BEST {label}: {best}", flush=True)


if __name__ == "__main__":
    main()
