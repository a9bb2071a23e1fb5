"""Measure the RRDB whole-frame HBM fit boundary (engine byte-model
calibration).

The engine's `_frame_bytes` was calibrated on SRVGG, whose activations
live at INPUT resolution (the x4 epilogue is one pixel-shuffle).  RRDB
upsamples inside the model (interpolate -> conv at 2x, then 4x,
reference realesrgan's RRDBNet.forward): its peak holds 64-channel
feature maps at OUTPUT resolution — h*w*s^2*feat*bpe per buffer, ~20x
the SRVGG epilogue model.  This probe measures which (res, batch)
combos actually fit a 16 GB v5e so `UpscaleEngine._plan_execution` can
chunk RRDB batches from a measured boundary instead of OOM-crashing
(found by the round-3 self-review: the old model said 1080p x4 b4
"fits" while the upsample stage alone needs ~4x the budget).

Each config runs in a SUBPROCESS (a previous RESOURCE_EXHAUSTED can
poison later allocations on this stack) with a hard timeout.

Usage: python scripts/perf_rrdb_fit.py                 (the sweep)
       python scripts/perf_rrdb_fit.py --one B H W     (single config)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [  # (batch, h, w) — x4 model, bf16, s2d trunk (production path)
    (1, 1080, 1920),
    (2, 1080, 1920),
    (1, 720, 1280),
    (2, 720, 1280),
    (4, 720, 1280),
    (4, 480, 640),
    (8, 480, 640),
]

_NPZ = "/tmp/rrdb_fit_params.npz"


def make_params():
    """Init params hermetically on CPU and cache as npz: on-device init
    costs minutes of tiny remote compiles per subprocess on this stack."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(upscale=4)
    params = rrdb.init_params(jax.random.key(0), cfg)
    flat = {"/".join(map(str, path)): np.asarray(leaf) for path, leaf
            in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(_NPZ, **{k.replace("[", "(").replace("]", ")"): v
                      for k, v in flat.items()})
    print("params cached:", len(flat), "leaves")


def run_one(b, h, w):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(upscale=4)
    blob = np.load(_NPZ)
    treedef = jax.tree_util.tree_structure(
        jax.eval_shape(lambda k: rrdb.init_params(k, cfg),
                       jax.random.key(0)))
    keys = sorted(blob.files)
    ref_paths = ["/".join(map(str, p)).replace("[", "(").replace("]", ")")
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     jax.eval_shape(lambda k: rrdb.init_params(k, cfg),
                                    jax.random.key(0)))[0]]
    assert sorted(ref_paths) == keys, "npz/param tree mismatch"
    leaves = [jnp.asarray(blob[p]) for p in ref_paths]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    params = jax.device_put(params)
    x = jax.device_put(
        np.random.RandomState(0).rand(b, h, w, 3).astype(np.float32))

    @jax.jit
    def fn(p, x):
        # the engine's production path: bf16 compute (engine._arch_apply)
        return jnp.sum(rrdb.apply(p, x, cfg=cfg,
                                  compute_dtype=jnp.bfloat16))

    try:
        val = float(fn(params, x))
        print(json.dumps({"b": b, "h": h, "w": w, "fit": True,
                          "checksum": val}))
        return 0
    except Exception as e:  # RESOURCE_EXHAUSTED et al.
        print(json.dumps({"b": b, "h": h, "w": w, "fit": False,
                          "error": type(e).__name__,
                          "detail": str(e)[:200]}))
        return 1


def main(argv):
    if argv[:1] == ["--one"]:
        b, h, w = map(int, argv[1:4])
        return run_one(b, h, w)
    if argv[:1] == ["--makeparams"]:
        make_params()
        return 0
    if not os.path.exists(_NPZ):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--makeparams"], check=True, timeout=600)
    for b, h, w in CONFIGS:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one", str(b), str(h), str(w)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1200)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    break
            else:
                print(json.dumps({"b": b, "h": h, "w": w, "fit": None,
                                  "error": "no output",
                                  "tail": out.stderr[-200:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"b": b, "h": h, "w": w, "fit": None,
                              "error": "timeout"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
