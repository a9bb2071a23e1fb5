"""Tile/scale sweep benchmark — BASELINE.json config #2:
"720p anime clip, x2/x3/x4 scale sweep with tiled inference".

Measures sustained on-device throughput (same methodology as bench.py) for
720p input at each scale, whole-frame vs halo-tiled, and prints a table.
Run on TPU: `python scripts/bench_tiles.py [--int8]` (--int8 adds the
turbo-mode rows; see PERF.md).
"""

import os as _os

# benchmarks/dry runs measure FLOPs, not trained quality: opt into the
# deterministic random-init fallback (the product itself refuses to run
# without weights; see reve_tpu.models.registry.MissingWeightsError)
_os.environ.setdefault("REVE_TPU_ALLOW_RANDOM_INIT", "1")


import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import logging

    logging.getLogger("reve_tpu.models.registry").setLevel(logging.ERROR)
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import registry, srvgg
    from reve_tpu.ops import tiling

    h, w, batch = 720, 1280, 4
    iters = 8
    int8 = "--int8" in sys.argv
    rows = []
    for scale in (2, 3, 4):
        cfg, params = registry.load_model("realesr-animevideov3", scale=scale)
        params = jax.device_put(params)
        qbody = None
        if int8:
            from reve_tpu.weights import quantize

            rs0 = np.random.RandomState(0)
            xs = jax.device_put(rs0.rand(2, h, w, 3).astype(np.float32))
            maxima = quantize.collect_act_maxima(params, xs, cfg=cfg,
                                                 compute_dtype=jnp.float32)
            qbody = jax.device_put(quantize.quantize_hidden(
                params, cfg, np.asarray(maxima), margin=1.25))
        for tile in (0, 384):   # 0 = whole frame
            def step(params, u8):
                x = u8.astype(jnp.float32) * (1.0 / 255.0)

                def ap(tt):
                    if qbody is not None:
                        # 720/384/18 all even -> s2d parity holds in tiles
                        return srvgg.apply_int8(params, qbody, tt, cfg=cfg,
                                                compute_dtype=jnp.bfloat16)
                    return srvgg.apply(params, tt, cfg=cfg,
                                       compute_dtype=jnp.bfloat16)

                if tile:
                    y = tiling.upscale_tiled(
                        ap, x, scale=scale, tile=tile,
                        halo=cfg.num_conv + 2,
                    )
                else:
                    y = ap(x)
                y = jnp.clip(y * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
                return jnp.sum(y.astype(jnp.int32))

            from reve_tpu.utils import compileopts

            fn = jax.jit(step, compiler_options=compileopts.
                         default_compiler_options())
            u8 = jax.device_put(np.random.RandomState(0).randint(
                0, 256, (batch, h, w, 3), np.uint8))
            try:
                r = fn(params, u8)
                jax.block_until_ready(r)
                float(r)
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = fn(params, u8)
                float(r)
                fps = batch * iters / (time.perf_counter() - t0)
                rows.append((scale, tile or "whole", round(fps, 2)))
                print(f"x{scale} tile={tile or 'whole'}"
                      f"{' int8' if int8 else ''}: {fps:.2f} fps",
                      flush=True)
            except Exception as e:
                rows.append((scale, tile or "whole", f"fail: {str(e)[:60]}"))
                print(f"x{scale} tile={tile or 'whole'}: FAILED", flush=True)

    print("\n| scale | tiling | fps/chip (720p in) |")
    print("|---|---|---|")
    for s, t, f in rows:
        print(f"| x{s} | {t} | {f} |")


if __name__ == "__main__":
    main()
