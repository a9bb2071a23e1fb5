"""RRDB tiled-inference halo sweep: measure the seam error vs halo size
(VERDICT r3 #5).

SRVGG's tiled path is bit-exact (halo = exact receptive-field radius);
RRDB's receptive field spans hundreds of pixels, so its tiled path ships
a fixed-halo APPROXIMATION (engine.halo = 24).  This script turns that
constant into a measured curve: u8-output error of tiled-vs-whole-frame
RRDB at halo in {16, 24, 32, 48}, at >= 2 tile geometries, on structured
content (real frames from the reference's own demo clip).

Weights: random init (no published RRDB weights on this no-egress image).
Random-init dense blocks propagate long-range influence at full strength
— trained RRDBs concentrate their effective receptive field far more —
so the measured error is a CONSERVATIVE (pessimistic) bound for trained
weights of the same architecture.

Prints one JSON line per (geometry, halo): {"tile":..., "halo":...,
"max_u8": ..., "psnr_db": ..., "seam_rows_px": ...} and a markdown table.

Usage: python scripts/rrdb_halo.py [--size 256x384] [--sizes 2]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

DEMO_MP4 = "/root/reference/reve-cli/assets/onepiece_demo.mp4"


def real_frame(h, w):
    import cv2

    cap = cv2.VideoCapture(DEMO_MP4)
    ok, f = cap.read()
    cap.release()
    if not ok:
        rs = np.random.RandomState(0)
        return rs.randint(0, 256, (h, w, 3), np.uint8)
    f = cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.ascontiguousarray(f[:, :, ::-1])


def measure(cfg, params, frame_u8, tile, halo, scale):
    import jax
    import jax.numpy as jnp

    from reve_tpu.models import rrdb
    from reve_tpu.ops import tiling

    x = jnp.asarray(frame_u8[None]).astype(jnp.float32) / 255.0

    def apply_fn(t):
        return rrdb.apply(params, t, cfg=cfg, compute_dtype=jnp.float32)

    def u8(y):
        return np.asarray(jnp.clip(y * 255.0 + 0.5, 0, 255)
                          .astype(jnp.uint8))

    whole = u8(jax.jit(apply_fn)(x))
    tiled = u8(jax.jit(lambda t: tiling.upscale_tiled(
        apply_fn, t, scale=scale, tile=tile, halo=halo, chunk=4))(x))
    diff = np.abs(whole.astype(np.int16) - tiled.astype(np.int16))
    mse = max(float(np.mean(diff.astype(np.float64) ** 2)), 1e-12)
    # where does the error live?  count rows/cols with any error — seam
    # bands show up as thin stripes at tile boundaries
    err_rows = int(np.count_nonzero(diff.any(axis=(0, 2, 3))))
    return {
        "tile": tile, "halo": halo,
        "max_u8": int(diff.max()),
        "mean_u8": round(float(diff.mean()), 4),
        "psnr_db": round(10 * np.log10(255.0 ** 2 / mse), 2),
        "err_rows_px": err_rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--halos", default="16,24,32,48")
    ap.add_argument("--geoms", default="256x384:128,384x512:192",
                    help="HxW:tile comma list")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from reve_tpu.models import rrdb

    cfg = rrdb.RRDBConfig(upscale=args.scale)
    params = jax.device_put(
        rrdb.init_params(jax.random.PRNGKey(args.seed), cfg))
    halos = [int(h) for h in args.halos.split(",")]
    rows = []
    for geom in args.geoms.split(","):
        hw, tile = geom.split(":")
        h, w = (int(v) for v in hw.split("x"))
        frame = real_frame(h, w)
        for halo in halos:
            r = measure(cfg, params, frame, int(tile), halo, args.scale)
            r["geom"] = f"{h}x{w}"
            rows.append(r)
            print(json.dumps(r), flush=True)

    print("\n| geom | tile | halo | max u8 err | PSNR dB | err rows px |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['geom']} | {r['tile']} | {r['halo']} | {r['max_u8']} "
              f"| {r['psnr_db']} | {r['err_rows_px']} |")


if __name__ == "__main__":
    main()
