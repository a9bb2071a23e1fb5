"""Probe the 8K tiled-inference compile on this stack (VERDICT r3 #3).

validate_hw's tiled_8k check found the default 8K tiled graph (tile 512,
chunked lax.map windows, scoped-VMEM options) BLOCKS in the remote
compile service.  This probe isolates the variable: each variant runs in
a SUBPROCESS with a hard timeout (a hung compile cannot be interrupted
in-process), so one hang cannot take down the sweep.

Variants: compiler options on/off, tile 512/256, chunk 8/4, plus a 4K
control (known to compile).  Prints one line per variant:
  OK   <variant> compile=<s> run=<s>
  HANG <variant> (killed after <timeout>s)
  FAIL <variant> <error>

Usage: python scripts/probe_8k_tile.py [--timeout 600] [--only NAME]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[2])
import numpy as np
import jax, jax.numpy as jnp
from reve_tpu.models import srvgg
from reve_tpu.ops import tiling

spec = json.loads(sys.argv[1])
h, w = spec["h"], spec["w"]
cfg = srvgg.SRVGGConfig(upscale=2)
params = jax.device_put(srvgg.init_params(jax.random.PRNGKey(0), cfg))
halo = cfg.num_conv + 2
rs = np.random.RandomState(0)
x = jax.device_put(rs.randint(0, 256, (1, h, w, 3), np.uint8))

def fn(params, u8):
    xf = u8.astype(jnp.float32) / 255.0
    s2d_ok = h % 2 == 0 and spec["tile"] % 2 == 0 and halo % 2 == 0
    y = tiling.upscale_tiled(
        lambda t: srvgg.apply(params, t, cfg=cfg,
                              compute_dtype=jnp.bfloat16, s2d=s2d_ok),
        xf, scale=2, tile=spec["tile"], halo=halo, chunk=spec["chunk"])
    y = jnp.clip(y * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return jnp.sum(y, dtype=jnp.int32)

opts = None
if spec["opts"]:
    from reve_tpu.utils import compileopts
    opts = compileopts.default_compiler_options()
jitted = jax.jit(fn, compiler_options=opts)
t0 = time.perf_counter()
r = jitted(params, x)
float(r)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
float(jitted(params, x))
run_s = time.perf_counter() - t0
print(json.dumps({"compile_s": round(compile_s, 1),
                  "run_s": round(run_s, 2)}), flush=True)
"""


VARIANTS = [
    # name, h, w, tile, chunk, opts
    ("4k_control_opts", 2160, 3840, 512, 8, True),
    ("8k_t512_c8_opts", 4320, 7680, 512, 8, True),
    ("8k_t512_c8_noopts", 4320, 7680, 512, 8, False),
    ("8k_t512_c4_opts", 4320, 7680, 512, 4, True),
    ("8k_t256_c8_opts", 4320, 7680, 256, 8, True),
    ("8k_t512_c1_opts", 4320, 7680, 512, 1, True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    for name, h, w, tile, chunk, opts in VARIANTS:
        if args.only and args.only not in name:
            continue
        spec = json.dumps({"h": h, "w": w, "tile": tile, "chunk": chunk,
                           "opts": opts})
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, spec, REPO],
                timeout=args.timeout, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"HANG {name} (killed after {args.timeout:.0f}s)",
                  flush=True)
            continue
        if r.returncode == 0 and r.stdout.strip():
            out = json.loads(r.stdout.strip().splitlines()[-1])
            print(f"OK   {name} compile={out['compile_s']}s "
                  f"run={out['run_s']}s (total {time.time()-t0:.0f}s)",
                  flush=True)
        else:
            tailmsg = (r.stderr or r.stdout)[-300:].replace("\n", " ")
            print(f"FAIL {name} rc={r.returncode}: {tailmsg}", flush=True)


if __name__ == "__main__":
    main()
