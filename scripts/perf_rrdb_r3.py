"""RRDB round-3 attack (VERDICT r2 item 5): make RRDBNet usable or prove
the ceiling.

Round-2 state: 1.82 fps/chip (480x640 b2, 2D-s2d trunk), and the
scoped-VMEM option that bought SRVGG +25% HANGS whole-model RRDB compiles
(>25 min for ~350 convs).  Three attacks, in order of expected value:

  blockjit   compile ONE RRDB block (15 convs) once with the raised
             scoped-VMEM budget and dispatch it 23x per frame from
             Python, plus jitted head/tail pieces — the emitter gets its
             budget without the 350-conv compile blowup.  Uses
             transform_params_s2d'd weights (plain convs) + donated
             block inputs.
  vmem       whole-model compiles at INTERMEDIATE budgets (24/32/48 MB),
             each in a subprocess with a hard timeout so a pathological
             compile cannot hang the sweep.
  int8       s8 conv rate at RRDB dense shapes (concat-growing inputs,
             N=128 s2d outputs) vs bf16 — is there a turbo path for the
             dense trunk?

Usage: python scripts/perf_rrdb_r3.py [--mode blockjit|vmem|int8|all]
           [--iters N]  (vmem mode self-invokes via subprocess)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

B, H, W = 2, 480, 640  # PERF.md's RRDB measurement shape (x4 model)
VMEM64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def _setup():
    import jax

    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(upscale=4)
    params = rrdb.init_params(jax.random.key(0), cfg)
    params = jax.device_put(params)
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.rand(B, H, W, 3).astype(np.float32))
    return cfg, params, x


def measure_whole(opts, iters=4, tag="whole"):
    """Whole-model jit at the given compiler options."""
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import rrdb

    cfg, params, x = _setup()

    def step(params, x):
        y = rrdb.apply(params, x, cfg=cfg, compute_dtype=jnp.bfloat16)
        return jnp.sum(y)

    fn = jax.jit(step, compiler_options=opts or None)
    t0 = time.perf_counter()
    r = fn(params, x)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(params, x)
    float(r)
    fps = B * iters / (time.perf_counter() - t0)
    print(f"[{tag}] compile {compile_s:.0f}s -> {fps:.2f} fps",
          file=sys.stderr)
    return fps


def measure_blockjit(iters=4, opts=VMEM64):
    """Per-block jit: one compiled RRDB block dispatched num_block times."""
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import rrdb
    from reve_tpu.ops import s2d as s2d_mod

    cfg, params, x = _setup()
    tp = rrdb.transform_params_s2d(params, cfg)
    tp = jax.device_put(tp)

    def head(params, x):
        h = x.astype(jnp.bfloat16)
        hs = s2d_mod.s2d2(h)
        return rrdb._raw_conv(hs, params["conv_first"]["w"],
                              params["conv_first"]["b"], jnp.bfloat16)

    def block(bp, carry):
        # carry = (feat, body): feat rides along untouched so donating the
        # carry never invalidates the residual input the tail still needs
        feat, v = carry

        def conv_fn(vv, p, dt, parts):
            return rrdb._raw_conv(vv, p["w"], p["b"], dt)

        return feat, rrdb._rrdb(v, bp, jnp.bfloat16, conv_fn,
                                cfg.num_feat, cfg.num_grow_ch)

    def tail(params, body, feat_s):
        feat_s = feat_s + rrdb._raw_conv(
            body, params["conv_body"]["w"], params["conv_body"]["b"],
            jnp.bfloat16)
        feat = s2d_mod.d2s2(feat_s)
        feat = rrdb._lrelu(rrdb._conv(
            rrdb.upsample_nearest(feat, 2), params["conv_up1"],
            jnp.bfloat16))
        feat = rrdb._lrelu(rrdb._conv(
            rrdb.upsample_nearest(feat, 2), params["conv_up2"],
            jnp.bfloat16))
        out = rrdb._conv(
            rrdb._lrelu(rrdb._conv(feat, params["conv_hr"], jnp.bfloat16)),
            params["conv_last"], jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32))

    jhead = jax.jit(head, compiler_options=opts or None)
    jblock = jax.jit(block, donate_argnums=(1,),
                     compiler_options=opts or None)
    jtail = jax.jit(tail, compiler_options=opts or None)

    def full(tp, x):
        feat = jhead(tp, x)
        # body starts as a DISTINCT buffer (feat + 0): the donated carry
        # must not alias feat twice
        carry = (feat, feat + 0)
        for bp in tp["body"]:
            carry = jblock(bp, carry)
        feat, body = carry
        return jtail(tp, body, feat)

    t0 = time.perf_counter()
    r = full(tp, x)
    jax.block_until_ready(r)
    print(f"[blockjit] compiles {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = full(tp, x)
    float(r)
    fps = B * iters / (time.perf_counter() - t0)
    print(f"[blockjit] -> {fps:.2f} fps", file=sys.stderr)
    return fps


def measure_int8_dense(iters=8):
    """s8 vs bf16 conv rate at RRDB s2d dense shapes: input channels grow
    256 -> 768 across a dense block; N=128 output."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rs = np.random.RandomState(0)
    out = {}
    Hs, Ws = H // 2, W // 2  # s2d trunk dims
    for cin in (256, 384, 512, 640, 768):
        shapes = {}
        for name, dtype in (("s8", np.int8), ("bf16", None)):
            if dtype is np.int8:
                xx = jax.device_put(
                    rs.randint(-127, 128, (B, Hs, Ws, cin)).astype(np.int8))
                ww = jax.device_put(
                    rs.randint(-127, 128, (3, 3, cin, 128)).astype(np.int8))
                acc = jnp.int32
            else:
                xx = jax.device_put(
                    rs.rand(B, Hs, Ws, cin).astype(jnp.bfloat16))
                ww = jax.device_put(
                    (rs.rand(3, 3, cin, 128) - 0.5).astype(jnp.bfloat16))
                acc = jnp.float32

            def f(x, w):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc)
                return jnp.sum(y.astype(jnp.int32) if acc == jnp.int32
                               else y.astype(jnp.float32))

            try:
                fn = jax.jit(f, compiler_options=VMEM64)
                r = fn(xx, ww)
                jax.block_until_ready(r)
                float(np.asarray(r).ravel()[0])
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = fn(xx, ww)
                float(np.asarray(r).ravel()[0])
                dt = (time.perf_counter() - t0) / iters
                tops = 2 * B * Hs * Ws * 9 * cin * 128 / dt / 1e12
                shapes[name] = round(tops, 1)
            except Exception as e:
                shapes[name] = f"fail: {str(e)[:60]}"
        out[f"cin={cin}"] = shapes
        print(f"[int8-dense cin={cin}] {shapes}", file=sys.stderr)
    return out


def main():
    argv = sys.argv[1:]
    mode, iters = "all", 4
    for i, a in enumerate(argv):
        if a == "--mode":
            mode = argv[i + 1]
        if a == "--iters":
            iters = int(argv[i + 1])
        if a == "--vmem-child":  # subprocess entry for the vmem sweep
            kib = argv[i + 1]
            opts = ({"xla_tpu_scoped_vmem_limit_kib": kib} if kib != "0"
                    else {})
            fps = measure_whole(opts, iters=4, tag=f"vmem{kib}")
            print(json.dumps({"fps": fps}))
            return

    results = {}
    if mode in ("blockjit", "all"):
        results["control whole-model (no opts)"] = round(
            measure_whole({}, iters, "control"), 2)
        results["blockjit vmem64"] = round(measure_blockjit(iters), 2)
    if mode in ("vmem", "all"):
        for kib in ("24576", "32768", "49152"):
            cmd = [sys.executable, __file__, "--vmem-child", kib]
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=900)
                line = r.stdout.strip().splitlines()[-1] if r.stdout else ""
                fps = json.loads(line)["fps"] if line.startswith("{") else 0
                results[f"whole-model vmem{int(kib)//1024}m"] = round(fps, 2)
            except subprocess.TimeoutExpired:
                results[f"whole-model vmem{int(kib)//1024}m"] = \
                    "compile >900s (hang)"
            except Exception as e:
                results[f"whole-model vmem{int(kib)//1024}m"] = \
                    f"fail: {str(e)[:80]}"
            print(f"[vmem {kib}] -> "
                  f"{results[f'whole-model vmem{int(kib)//1024}m']}",
                  file=sys.stderr)
    if mode in ("int8", "all"):
        results["int8_dense_tops"] = measure_int8_dense()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
