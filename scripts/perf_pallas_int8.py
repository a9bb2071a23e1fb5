"""Mosaic (Pallas) int8 dot-rate probe at the s2d production shape.

Round-2's in-kernel measurement (int8 1.3x bf16, nowhere near the 2x MXU
ratio) predates the row-s2d layout and the compiler-options discovery.
A Pallas line-buffer int8 body is only worth building (VERDICT r2 item
8's "int8 vehicle" option; the bf16 fused kernel was deleted round 3) if
Mosaic can actually issue s8 dots at a rate meaningfully above the XLA
int8 conv emitter's 197-257 TOP/s.

This measures a minimal streaming kernel: a strip loop over rows doing
the s2d hidden-layer dot chain — (S*W, 256pad) @ (256pad, 128) per tap
group — in bf16 vs int8(s32 acc), with enough iterations per kernel call
to amortize dispatch (the round-1/2 lesson: isolated single dots are
unmeasurable through the relay's dispatch noise).

Usage: python scripts/perf_pallas_int8.py [--iters N] [--loops N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    iters, loops = 6, 64
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
        if a == "--loops":
            loops = int(argv[i + 1])

    M, K, N = 4224, 256, 128  # s2d strip: (S*WW) x K(2-lane-tiles) x N
    rs = np.random.RandomState(0)

    def run(dtype_name):
        if dtype_name == "int8":
            x = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)
            w = jnp.asarray(rs.randint(-127, 128, (2 * K, N)), jnp.int8)
            acc_t, out_t = jnp.int32, jnp.int32
        else:
            x = jnp.asarray(rs.rand(M, K) - 0.5, jnp.bfloat16)
            w = jnp.asarray(rs.rand(2 * K, N) - 0.5, jnp.bfloat16)
            acc_t, out_t = jnp.float32, jnp.float32

        def kernel(x_ref, w_ref, o_ref):
            xv = x_ref[...]
            w0 = w_ref[0:K, :]
            w1 = w_ref[K:2 * K, :]
            acc = jnp.zeros((M, N), acc_t)

            def body(i, acc):
                # loop-dependent weight choice (alternating K-halves; a
                # static-slice select — Mosaic lacks dynamic_slice) so
                # the dot cannot be hoisted out of the loop
                wv = jnp.where((i % 2) == 0, w0, w1)
                return acc + jax.lax.dot_general(
                    xv, wv, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)

            acc = jax.lax.fori_loop(0, loops, body, acc)
            o_ref[...] = acc.astype(out_t)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), out_t),
        )
        jf = jax.jit(f)
        r = jf(x, w)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = jf(x, w)
        float(np.asarray(r).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        tops = 2 * M * K * N * loops / dt / 1e12
        print(f"{dtype_name}: {tops:.1f} TOP/s "
              f"({dt * 1e3:.2f} ms / {loops} dots)")
        return tops

    b = run("bf16")
    i8 = run("int8")
    print(f"ratio int8/bf16: {i8 / b:.2f}x (MXU spec ratio: 2.0x)")


if __name__ == "__main__":
    main()
