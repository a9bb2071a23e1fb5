"""Re-probe XLA int8 conv/dot lowering WITH the scoped-VMEM options.

Round-2 measured XLA int8 NHWC convs at 0.1 TOP/s and s8xs8->s32 dots at
1.5-5.8 TOP/s (PERF.md "int8 is a dead end") — but those numbers predate
the scoped-VMEM discovery, which turned out to explain the bf16 conv gap.
This re-checks whether the int8 path was also budget-starved.  If int8
convs lower near the 394 TOPS MXU rate, the path past the ~33 fps bf16
wall opens.

Usage: python scripts/perf_int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def measure(mk, args_fn, flop, label, opts, attempts=3, iters=8):
    import jax

    best = 0.0
    for attempt in range(attempts):
        try:
            fn = jax.jit(mk(attempt), compiler_options=opts or None)
            args = args_fn()
            r = fn(*args)
            jax.block_until_ready(r)
            float(np.asarray(r).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            float(np.asarray(r).ravel()[0])
            dt = (time.perf_counter() - t0) / iters
            best = max(best, flop / dt)
        except Exception as e:
            print(f"  {label} attempt {attempt} failed: {str(e)[:120]}",
                  file=sys.stderr)
    print(f"{label}: {best / 1e12:.2f} TOP/s")
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from reve_tpu.utils import compileopts

    opts = compileopts.default_compiler_options()
    print(f"compiler options: {opts}")

    rs = np.random.RandomState(0)
    # the s2d production conv shape: (B=8, 540, 1920, 128) -> 128, 3x3
    B, H, W, C, N = 8, 540, 1920, 128, 128
    conv_flop = 2 * B * H * W * 9 * C * N

    def mk_conv(dtype, acc):
        def thunk(attempt):
            def f(x, k):
                bust = lax.optimization_barrier(
                    jnp.zeros((attempt + 1,), jnp.int32))
                x = x + bust[0].astype(x.dtype)
                y = lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc)
                return jnp.sum(y.astype(jnp.int32)
                               if acc == jnp.int32 else y.astype(jnp.float32))
            return f
        return thunk

    def args_i8():
        return (jax.device_put(rs.randint(-128, 128, (B, H, W, C),
                                          np.int8)),
                jax.device_put(rs.randint(-128, 128, (3, 3, C, N),
                                          np.int8)))

    def args_bf16():
        return (jax.device_put(rs.rand(B, H, W, C).astype(jnp.bfloat16)),
                jax.device_put(rs.rand(3, 3, C, N).astype(jnp.bfloat16)))

    for label, opt in (("with-opts", opts), ("no-opts", None)):
        print(f"--- {label} ---")
        measure(mk_conv(np.int8, jnp.int32), args_i8, conv_flop,
                f"conv s8xs8->s32 {B}x{H}x{W}x{C}->{N}", opt)
        measure(mk_conv(jnp.bfloat16, jnp.float32), args_bf16, conv_flop,
                "conv bf16 (control)", opt)

    # big dot: (B*H*W, C) @ (C, N) int8
    M = 2_000_000
    dot_flop = 2 * M * C * N

    def mk_dot(attempt):
        def f(a, b):
            bust = lax.optimization_barrier(
                jnp.zeros((attempt + 1,), jnp.int32))
            a = a + bust[0].astype(a.dtype)
            y = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return jnp.sum(y)
        return f

    def args_dot():
        return (jax.device_put(rs.randint(-128, 128, (M, C), np.int8)),
                jax.device_put(rs.randint(-128, 128, (C, N), np.int8)))

    for label, opt in (("with-opts", opts), ("no-opts", None)):
        measure(mk_dot, args_dot, dot_flop,
                f"dot s8 ({M},{C})@({C},{N}) [{label}]", opt)


if __name__ == "__main__":
    main()
