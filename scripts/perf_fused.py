"""Measure the fused-body Pallas kernel vs the XLA layer-by-layer path on
the current device (TPU expected).  Checks correctness first, then times."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from reve_tpu.models import srvgg  # noqa: E402
from reve_tpu.ops import fused_body  # noqa: E402


def timeit(f, *args, n=8):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    # tiny transfer to force real sync on relay platforms
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    H, W = (int(a) for a in (sys.argv[1:3] or (1080, 1920)))
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    strip = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    core = int(sys.argv[5]) if len(sys.argv) > 5 else 480
    dtype = jnp.bfloat16
    num_conv = 16

    cfg = srvgg.SRVGGConfig(num_conv=num_conv, num_feat=64, upscale=4)
    params = srvgg.init_params(jax.random.key(0), cfg)
    params = jax.device_put(params)
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(B, H, W, 64) * 0.5, dtype)
    )
    ws, bs, as_ = fused_body.stack_hidden_params(params, num_conv)
    ws, bs, as_ = jax.device_put((ws, bs, as_))

    @jax.jit
    def xla_path(params, x):
        h = x
        for i in range(num_conv):
            h = srvgg._prelu(
                srvgg._conv3x3(h, params["convs"][i + 1]["w"].astype(dtype),
                               params["convs"][i + 1]["b"]),
                params["prelus"][i + 1]["alpha"],
            )
        return jnp.sum(h.astype(jnp.float32))

    @jax.jit
    def fused_path(x, ws, bs, as_):
        y = fused_body.fused_hidden_body(
            x, ws, bs, as_, height=H, width=W, strip=strip, core=core,
            compute_dtype=dtype,
        )
        return jnp.sum(y.astype(jnp.float32))

    # correctness on a small slice first
    if H <= 128:
        hs = x
        ref = hs
        for i in range(num_conv):
            ref = srvgg._prelu(
                srvgg._conv3x3(ref, params["convs"][i + 1]["w"].astype(dtype),
                               params["convs"][i + 1]["b"]),
                params["prelus"][i + 1]["alpha"],
            )
        got = fused_body.fused_hidden_body(
            x, ws, bs, as_, height=H, width=W, strip=strip, core=core,
            compute_dtype=dtype,
        )
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        print(f"max abs err vs XLA ({dtype.__name__}): {err:.3e}")

    flops = num_conv * 2 * 9 * 64 * 64 * H * W * B
    t0 = time.perf_counter()
    dt = timeit(fused_path, x, ws, bs, as_, n=4)
    print(f"fused : {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s "
          f"(strip={strip} core={core}; incl compile "
          f"{time.perf_counter() - t0:.0f}s)", flush=True)
    if "--skip-xla" not in sys.argv:
        dt = timeit(xla_path, params, x, n=4)
        print(f"XLA   : {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
