"""Whole-model RRDB int8 turbo measurement (round 4).

Round 3's microbench (scripts/perf_rrdb_r3.py) showed s8 dense-conv rates
at par-to-+17% vs bf16 at the s2d trunk shapes — emitter-bound, nothing
like SRVGG's ~2x.  Round 4 ships `rrdb.apply_int8` anyway (opt-in
`--dtype int8`, uniform across model families); this probe measures what
the WHOLE quantized model actually does at the PERF.md RRDB shape
(480x640 x4, b2) so the documented claim is a measurement, not the
microbench extrapolation.

Each path compiles fresh and is probed twice (compile-lottery defense,
PERF.md "Benchmark hygiene"); sync via on-device scalar checksums (the
relay makes host transfers meaningless to time).

Usage: python scripts/perf_rrdb_int8.py [--mode bf16|int8|all] [--iters N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

B, H, W = 2, 480, 640


def _setup():
    import jax

    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(upscale=4)
    params = jax.device_put(rrdb.init_params(jax.random.key(0), cfg))
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.rand(B, H, W, 3).astype(np.float32))
    return cfg, params, x


def _time(fn, args, iters, tag):
    import jax

    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    float(np.asarray(r).ravel()[0])
    best = 0.0
    for probe in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(np.asarray(r).ravel()[0])
        fps = B * iters / (time.perf_counter() - t0)
        best = max(best, fps)
    print(f"[{tag}] compile {compile_s:.0f}s -> {best:.2f} fps",
          file=sys.stderr)
    return round(best, 2), round(compile_s, 1)


def measure_bf16(iters):
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import rrdb

    cfg, params, x = _setup()

    def step(params, x):
        return jnp.sum(rrdb.apply(params, x, cfg=cfg,
                                  compute_dtype=jnp.bfloat16))

    return _time(jax.jit(step), (params, x), iters, "bf16")


def measure_int8(iters):
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import rrdb
    from reve_tpu.weights import quantize

    cfg, params, x = _setup()
    maxima = quantize.collect_act_maxima_rrdb(params, x, cfg=cfg)
    qbody = jax.device_put(quantize.quantize_rrdb(params, cfg, maxima,
                                                  margin=1.25))

    def step(params, qbody, x):
        return jnp.sum(rrdb.apply_int8(params, qbody, x, cfg=cfg,
                                       compute_dtype=jnp.bfloat16
                                       ).astype(jnp.float32))

    return _time(jax.jit(step), (params, qbody, x), iters, "int8")


def main():
    argv = sys.argv[1:]
    mode, iters = "all", 6
    for i, a in enumerate(argv):
        if a == "--mode":
            mode = argv[i + 1]
        if a == "--iters":
            iters = int(argv[i + 1])
    results = {}
    if mode in ("bf16", "all"):
        fps, comp = measure_bf16(iters)
        results["bf16"] = {"fps": fps, "compile_s": comp}
    if mode in ("int8", "all"):
        fps, comp = measure_int8(iters)
        results["int8"] = {"fps": fps, "compile_s": comp}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
