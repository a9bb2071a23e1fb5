"""4K-input benchmark — the 4K corner of BASELINE config #5 (VERDICT r2
item 4): tiled vs whole-frame throughput at 2160x3840 input, bf16 and
int8, tile sizes {512, 768, 1024} + the whole-frame HBM boundary.

Same methodology as bench.py: on-device sustained throughput, checksum
output (no host transfers in the timed region), best-of fresh compiles
against the compile lottery.  The result calibrates the engine's
auto-tile decision (pipeline/engine.py _plan_execution) with measured
numbers instead of a pixel-count guess.

Usage: python scripts/bench_4k.py [--dtypes bf16,int8] [--tiles 0,512,768,1024]
           [--iters N] [--scale 4]
"""

import os as _os

# benchmarks/dry runs measure FLOPs, not trained quality: opt into the
# deterministic random-init fallback (the product itself refuses to run
# without weights; see reve_tpu.models.registry.MissingWeightsError)
_os.environ.setdefault("REVE_TPU_ALLOW_RANDOM_INIT", "1")


import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

H, W = 2160, 3840


def make_step(cfg, qbody, tile, scale, attempt):
    import jax.numpy as jnp
    from jax import lax

    from reve_tpu.models import srvgg
    from reve_tpu.ops import tiling

    def step(params, qb, u8):
        bust = lax.optimization_barrier(
            jnp.zeros((attempt + 1,), jnp.float32))
        x = u8.astype(jnp.float32) * (1.0 / 255.0) + bust[0]

        def ap(tt, quantize_u8=False):
            if qb is not None:
                return srvgg.apply_int8(params, qb, tt, cfg=cfg,
                                        compute_dtype=jnp.bfloat16,
                                        quantize_u8=quantize_u8)
            return srvgg.apply(params, tt, cfg=cfg,
                               compute_dtype=jnp.bfloat16,
                               quantize_u8=quantize_u8)

        if tile:
            y = tiling.upscale_tiled(ap, x, scale=scale, tile=tile,
                                     halo=cfg.num_conv + 2)
            y = jnp.clip(y * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        else:
            y = ap(x, quantize_u8=True)
        return jnp.sum(y.astype(jnp.int32))

    return step


def measure(cfg, params, qbody, tile, scale, batch, iters, attempts=4):
    import jax

    from reve_tpu.utils import compileopts

    rs = np.random.RandomState(0)
    u8 = jax.device_put(rs.randint(0, 256, (batch, H, W, 3), np.uint8))
    best = 0.0
    for attempt in range(attempts):
        try:
            fn = jax.jit(make_step(cfg, qbody, tile, scale, attempt),
                         compiler_options=compileopts.
                         default_compiler_options())
            t0 = time.perf_counter()
            r = fn(params, qbody, u8)
            jax.block_until_ready(r)
            compile_s = time.perf_counter() - t0
            float(r)
            t0 = time.perf_counter()
            r = fn(params, qbody, u8)
            float(r)
            probe = batch / (time.perf_counter() - t0)
            print(f"    a{attempt}: compile {compile_s:.0f}s probe "
                  f"{probe:.2f} fps", file=sys.stderr)
            if best > 0 and probe < 0.5 * best:
                continue
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(params, qbody, u8)
            float(r)
            fps = batch * iters / (time.perf_counter() - t0)
            best = max(best, fps)
            if attempt >= 1:
                break
        except Exception as e:
            msg = str(e)[:140]
            print(f"    a{attempt} failed: {msg}", file=sys.stderr)
            if "RESOURCE_EXHAUSTED" in msg or "OOM" in msg.upper():
                return -1.0  # OOM: no point retrying the same shape
    return best


def main():
    import logging

    logging.getLogger("reve_tpu.models.registry").setLevel(logging.ERROR)
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import registry
    from reve_tpu.weights import quantize

    argv = sys.argv[1:]
    dtypes, tiles, iters, scale = ["bf16", "int8"], [0, 512, 768, 1024], 4, 4
    for i, a in enumerate(argv):
        if a == "--dtypes":
            dtypes = argv[i + 1].split(",")
        if a == "--tiles":
            tiles = [int(t) for t in argv[i + 1].split(",")]
        if a == "--iters":
            iters = int(argv[i + 1])
        if a == "--scale":
            scale = int(argv[i + 1])

    cfg, params = registry.load_model("realesr-animevideov3", scale=scale)
    params = jax.device_put(params)
    results = {}
    for dtype in dtypes:
        qbody = None
        if dtype == "int8":
            rs0 = np.random.RandomState(0)
            xs = jax.device_put(rs0.rand(1, 720, 1280, 3).astype(np.float32))
            maxima = quantize.collect_act_maxima(params, xs, cfg=cfg,
                                                 compute_dtype=jnp.float32)
            qbody = jax.device_put(quantize.quantize_hidden(
                params, cfg, np.asarray(maxima), margin=1.25))
        for tile in tiles:
            # whole-frame 4K: batch 2 first (batch-1 compiles can be
            # pathological), fall back to 1; tiled runs batch 2
            batches = (2, 1) if tile == 0 else (2,)
            for batch in batches:
                key = f"{dtype} tile={tile or 'whole'} b{batch}"
                print(f"[{key}]", file=sys.stderr)
                fps = measure(cfg, params, qbody, tile, scale, batch, iters)
                results[key] = round(fps, 2)
                print(f"[{key}] -> {results[key]} fps", file=sys.stderr)
                if fps > 0:
                    break
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
