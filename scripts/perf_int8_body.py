"""Full 16-layer int8 body prototype (perf only, s2d domain).

perf_int8_probe.py showed a single s8xs8->s32 conv at the production s2d
shape runs at ~117 TOP/s once the scoped-VMEM budget is raised (it was
0.1 TOP/s at the default budget — the round-2 "int8 is a dead end" verdict
was budget starvation, not a lowering gap).  This measures what actually
matters: the full conv stack with per-layer requantization (conv -> s32 ->
f32 scale -> PReLU -> round/clip -> int8), i.e. half the MXU work and a
quarter of the inter-layer HBM traffic of the bf16 stack.

Reports ms/frame for the 16-layer body and the implied full-model fps
uplift vs the bf16 body measured in the same run.

Usage: python scripts/perf_int8_body.py [--layers N] [--iters N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from reve_tpu.utils import compileopts

    opts = compileopts.default_compiler_options()
    print(f"compiler options: {opts}", file=sys.stderr)

    B, H, W, C = 8, 540, 1920, 128
    layers, iters = 16, 8
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--layers":
            layers = int(argv[i + 1])
        if a == "--iters":
            iters = int(argv[i + 1])

    rs = np.random.RandomState(0)
    w8 = jax.device_put(rs.randint(-128, 128, (layers, 3, 3, C, C),
                                   np.int8))
    wbf = jax.device_put((rs.rand(layers, 3, 3, C, C) * 0.1 - 0.05)
                         .astype(jnp.bfloat16))
    alphas = jax.device_put(np.full((layers, C), 0.1, np.float32))
    # per-layer requant scales (perf-representative values)
    scales = jax.device_put(np.full((layers,), 1.0 / 4096.0, np.float32))
    x8 = jax.device_put(rs.randint(-128, 128, (B, H, W, C), np.int8))
    xbf = jax.device_put(rs.rand(B, H, W, C).astype(jnp.bfloat16))

    def conv(x, k, acc):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    def mk_int8(attempt, requant_dtype=jnp.float32):
        def f(x, w8, alphas, scales):
            bust = lax.optimization_barrier(
                jnp.zeros((attempt + 1,), jnp.int32))
            x = x + bust[0].astype(x.dtype)

            def body(i, x):
                y = conv(x, w8[i], jnp.int32)
                fy = y.astype(requant_dtype) * scales[i].astype(requant_dtype)
                fy = jnp.where(fy >= 0, fy, fy * alphas[i].astype(
                    requant_dtype))
                q = jnp.clip(jnp.round(fy * 127.0), -128, 127)
                return q.astype(jnp.int8)

            x = lax.fori_loop(0, layers, body, x)
            return jnp.sum(x.astype(jnp.int32))
        return f

    def mk_int8_noepi(attempt):
        """convs only (requant = plain shift-free cast) — isolates the
        dequant/PReLU/requant elementwise cost."""
        def f(x, w8, alphas, scales):
            bust = lax.optimization_barrier(
                jnp.zeros((attempt + 1,), jnp.int32))
            x = x + bust[0].astype(x.dtype)

            def body(i, x):
                y = conv(x, w8[i], jnp.int32)
                return (y >> 8).astype(jnp.int8)

            x = lax.fori_loop(0, layers, body, x)
            return jnp.sum(x.astype(jnp.int32))
        return f

    def mk_bf16(attempt):
        def f(x, wbf, alphas):
            bust = lax.optimization_barrier(
                jnp.zeros((attempt + 1,), jnp.float32))
            x = x + bust[0].astype(x.dtype)

            def body(i, x):
                y = conv(x, wbf[i], jnp.float32)
                y = jnp.where(y >= 0, y, y * alphas[i].astype(jnp.float32))
                return y.astype(jnp.bfloat16)

            x = lax.fori_loop(0, layers, body, x)
            return jnp.sum(x.astype(jnp.float32))
        return f

    def measure(mk, args, label):
        best = None
        for attempt in range(3):
            try:
                fn = jax.jit(mk(attempt), compiler_options=opts or None)
                t0 = time.perf_counter()
                r = fn(*args)
                jax.block_until_ready(r)
                compile_s = time.perf_counter() - t0
                float(np.asarray(r).ravel()[0])
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = fn(*args)
                float(np.asarray(r).ravel()[0])
                ms = (time.perf_counter() - t0) / iters / B * 1000
                print(f"  {label} attempt {attempt}: compile {compile_s:.0f}s"
                      f" {ms:.1f} ms/frame", file=sys.stderr)
                best = ms if best is None else min(best, ms)
                if attempt >= 1:
                    break
            except Exception as e:
                print(f"  {label} attempt {attempt} failed: {str(e)[:160]}",
                      file=sys.stderr)
        return best

    def _f(v):
        return f"{v:.1f}" if v is not None else "FAILED"

    ms8 = measure(mk_int8, (x8, w8, alphas, scales), "int8")
    ms8b = measure(lambda a: mk_int8(a, jnp.bfloat16),
                   (x8, w8, alphas, scales), "int8-bf16requant")
    ms8n = measure(mk_int8_noepi, (x8, w8, alphas, scales), "int8-noepi")
    print(f"int8 f32-requant {_f(ms8)} / bf16-requant {_f(ms8b)} / "
          f"convs-only {_f(ms8n)} ms/frame", file=sys.stderr)
    msb = measure(mk_bf16, (xbf, wbf, alphas), "bf16")
    tops8 = 2 * H * W * 9 * C * C * layers / (ms8 / 1000) / 1e12 if ms8 \
        else 0.0
    tfb = 2 * H * W * 9 * C * C * layers / (msb / 1000) / 1e12 if msb \
        else 0.0
    print(f"int8 body: {ms8:.1f} ms/frame ({tops8:.0f} TOP/s); "
          f"bf16 body: {msb:.1f} ms/frame ({tfb:.0f} TF/s); "
          f"speedup {msb / ms8:.2f}x" if ms8 and msb else "FAILED")


if __name__ == "__main__":
    main()
