"""Measure the fused-body Pallas kernel vs the XLA layer-by-layer path on
the current device (TPU expected).

This platform's compiler non-deterministically emits catastrophically slow
binaries for the same program (PERF.md "Benchmark hygiene"), so every
configuration is compiled up to `--attempts` times (cache-busted via a
shape-varying optimization_barrier constant) and the BEST steady-state
time is reported; a cheap 1-iteration probe skips full timing of bad
binaries.

Usage:
  python scripts/perf_fused.py [H W B] [--sweep] [--skip-xla]
      [--strip N] [--core N] [--kdim 192|256] [--msplit N]
      [--no-fast-interior] [--attempts N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from reve_tpu.models import srvgg  # noqa: E402
from reve_tpu.ops import fused_body  # noqa: E402

NUM_CONV = 16
DTYPE = jnp.bfloat16


def _arg(flag, default, cast=int):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def timeit_best(make_fn, *args, n=4, attempts=3, tag=""):
    """Best steady-state seconds/call across `attempts` fresh compiles."""
    best = float("inf")
    for a in range(attempts):
        f = make_fn(a)
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        probe = time.perf_counter() - t0
        if best < float("inf") and probe > 2.0 * best:
            print(f"  [{tag} attempt {a}] compile {compile_s:.0f}s "
                  f"probe {probe*1e3:.0f}ms — bad binary, retrying",
                  file=sys.stderr)
            continue
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        best = min(best, dt)
        if a >= 1:
            break
    return best


def bust(attempt):
    """A graph-varying additive zero (forces a fresh compile per attempt)."""
    return jax.lax.optimization_barrier(
        jnp.zeros((attempt + 1,), jnp.float32))[0]


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    H = int(pos[0]) if len(pos) > 0 else 1080
    W = int(pos[1]) if len(pos) > 1 else 1920
    B = int(pos[2]) if len(pos) > 2 else 1
    # legacy positional strip/core still accepted
    strip = int(pos[3]) if len(pos) > 3 else _arg("--strip", 8)
    core = int(pos[4]) if len(pos) > 4 else _arg("--core", 480)
    kdim = _arg("--kdim", 256)
    msplit = _arg("--msplit", 1)
    attempts = _arg("--attempts", 3)
    fast_interior = "--no-fast-interior" not in sys.argv

    cfg = srvgg.SRVGGConfig(num_conv=NUM_CONV, num_feat=64, upscale=4)
    params = jax.device_put(srvgg.init_params(jax.random.key(0), cfg))
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(B, H, W, 64) * 0.5, DTYPE)
    )
    ws, bs, as_ = jax.device_put(
        fused_body.stack_hidden_params(params, NUM_CONV))
    flops = NUM_CONV * 2 * 9 * 64 * 64 * H * W * B

    def make_fused(cfg_kw):
        def make(attempt):
            @jax.jit
            def f(x, ws, bs, as_):
                y = fused_body.fused_hidden_body(
                    x + bust(attempt).astype(DTYPE), ws, bs, as_,
                    height=H, width=W, compute_dtype=DTYPE, **cfg_kw,
                )
                return jnp.sum(y.astype(jnp.float32))
            return f
        return make

    def report(tag, dt):
        print(f"{tag}: {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s",
              flush=True)

    if "--sweep" in sys.argv:
        combos = []
        for s, c, k, m in [
            (8, 480, 192, 1),   # v3 baseline
            (8, 480, 256, 1),
            (16, 480, 256, 2),
            (16, 352, 256, 1),
            (24, 480, 256, 4),
            (16, 240, 256, 1),
            (32, 240, 256, 2),
        ]:
            combos.append(dict(strip=s, core=c, kdim=k, msplit=m,
                               fast_interior=True))
        combos.append(dict(strip=8, core=480, kdim=256, msplit=1,
                           fast_interior=False))
        for kw in combos:
            try:
                dt = timeit_best(make_fused(kw), x, ws, bs, as_,
                                 attempts=attempts, tag=str(kw))
                report(f"fused {kw}", dt)
            except Exception as e:
                print(f"fused {kw}: FAILED {str(e)[:200]}", flush=True)
    else:
        kw = dict(strip=strip, core=core, kdim=kdim, msplit=msplit,
                  fast_interior=fast_interior)
        dt = timeit_best(make_fused(kw), x, ws, bs, as_,
                         attempts=attempts, tag="fused")
        report(f"fused {kw}", dt)

    if "--skip-xla" not in sys.argv:
        def make_xla(attempt):
            @jax.jit
            def f(params, x):
                h = x + bust(attempt).astype(DTYPE)
                for i in range(NUM_CONV):
                    h = srvgg._prelu(
                        srvgg._conv3x3(
                            h, params["convs"][i + 1]["w"].astype(DTYPE),
                            params["convs"][i + 1]["b"]),
                        params["prelus"][i + 1]["alpha"],
                    )
                return jnp.sum(h.astype(jnp.float32))
            return f
        dt = timeit_best(make_xla, params, x, attempts=attempts, tag="xla")
        report("XLA   ", dt)


if __name__ == "__main__":
    main()
