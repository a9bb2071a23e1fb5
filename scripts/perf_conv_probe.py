"""Decide whether XLA's conv emitter is the ceiling, or a dot
reformulation can beat it.

PERF.md round-2: the s2d conv stack runs at ~145 TF/s (74% of the v5e's
197 TF/s bf16 peak).  Is the missing 26% conv-emitter overhead (halo
re-reads, patch bookkeeping) or a platform-wide matmul ceiling?  Probe:

  1. `dot`:    one (M, 128) @ (128, 128) bf16 matmul with M = B*H2*W —
               the same arithmetic shape as one s2d hidden conv, minus
               the 3x3 window.  If this also lands ~145 TF/s, 74% is the
               platform ceiling and conv work stops.
  2. `dot9`:   sum of 9 shifted dots — the conv expressed as explicit
               dots over dy/dx-shifted views (what a hand-lowered conv
               would do).  Tests whether XLA fuses shifted-slice loads.
  3. `conv`:   the production `lax.conv_general_dilated` s2d hidden conv
               (baseline; should reproduce ~145 TF/s).
  4. `dotk384`: im2col along the W axis only — concat 3 column-shifted
               views into K=384, one dot per dy... folded to one dot of
               (M, 384) @ (384, 128) with the dy dimension summed by 3
               sequential dots.  Probes the K-major formulation.

Each variant is measured with the same hygiene as bench.py (fresh-compile
retry via attempt-dependent optimization_barrier, best-of, scalar-checksum
sync).  Usage: python scripts/perf_conv_probe.py [--batch 8] [--iters 8]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(make_fn, args, iters, attempts=3, label=""):
    import jax

    best = 0.0
    for attempt in range(attempts):
        try:
            fn = make_fn(attempt)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = fn(*args)
            r = fn(*args)
            _ = float(r)
            probe = 2 / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            _ = float(r)
            rate = iters / (time.perf_counter() - t0)
            best = max(best, rate)
            print(f"  [{label}] attempt {attempt}: compile {compile_s:.0f}s "
                  f"probe {probe:.2f}/s steady {rate:.2f}/s", file=sys.stderr)
            if attempt >= 1 and best > 0:
                break
        except Exception as e:
            print(f"  [{label}] attempt {attempt} failed: {str(e)[:120]}",
                  file=sys.stderr)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    batch = 8
    iters = 8
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--batch":
            batch = int(argv[i + 1])
        if a == "--iters":
            iters = int(argv[i + 1])

    B, H2, W, C = batch, 540, 1920, 128
    M = B * H2 * W
    rs = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rs.rand(B, H2, W, C).astype(np.float32), jnp.bfloat16))
    w9 = jax.device_put(jnp.asarray(
        rs.rand(3, 3, C, C).astype(np.float32) * 0.1, jnp.bfloat16))

    flops_dot = 2 * M * C * C
    flops_conv = 9 * flops_dot

    def bust(attempt):
        return lax.optimization_barrier(
            jnp.zeros((attempt + 1,), jnp.bfloat16))[0]

    def mk_dot(attempt):
        @jax.jit
        def f(x, w9):
            a = (x + bust(attempt)).reshape(M, C)
            y = lax.dot_general(a, w9[0, 0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return jnp.sum(y) * 1e-9
        return f

    def mk_conv(attempt):
        @jax.jit
        def f(x, w9):
            y = lax.conv_general_dilated(
                x + bust(attempt), w9, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.sum(y) * 1e-9
        return f

    def mk_dot9(attempt):
        @jax.jit
        def f(x, w9):
            xp = jnp.pad(x + bust(attempt),
                         ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    v = lax.dynamic_slice(
                        xp, (0, dy, dx, 0), (B, H2, W, C)).reshape(M, C)
                    y = lax.dot_general(
                        v, w9[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            return jnp.sum(acc) * 1e-9
        return f

    def mk_dotk384(attempt):
        # im2col along W: K=384 per dy row, 3 dots summed
        wk = w9.transpose(0, 1, 2, 3).reshape(3, 3 * C, C)  # (dy, dx*C, C)

        @jax.jit
        def f(x, w9):
            xp = jnp.pad(x + bust(attempt),
                         ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                cols = [lax.dynamic_slice(xp, (0, dy, dx, 0),
                                          (B, H2, W, C)) for dx in range(3)]
                v = jnp.concatenate(cols, axis=-1).reshape(M, 3 * C)
                y = lax.dot_general(v, wk[dy], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            return jnp.sum(acc) * 1e-9
        return f

    variants = [
        ("dot", mk_dot, flops_dot),
        ("conv", mk_conv, flops_conv),
        ("dot9", mk_dot9, flops_conv),
        ("dotk384", mk_dotk384, flops_conv),
    ]
    print(f"M={M} K=N={C} batch={batch} "
          f"(dot {flops_dot/1e12:.2f} TFLOP, conv {flops_conv/1e12:.2f})",
          file=sys.stderr)
    for name, mk, flops in variants:
        rate = measure(mk, (x, w9), iters, label=name)
        tfs = rate * flops / 1e12
        print(f"{name:8s} {rate:7.2f} calls/s  {tfs:6.1f} TF/s")


if __name__ == "__main__":
    main()
