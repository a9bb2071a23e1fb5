"""Certificate crop bound: certify-on-crops vs certify-on-full-frames.

The int8 certificate is measured on <=720p windows with cycling anchors
(engine._calib_crop) — at 1080p each window covers ~44% of its frame, and
the done-line prints the dB with no caveat (round-4 VERDICT weak #3 /
next #4).  This probe measures the crop-vs-full-frame delta at the
flagship 1080p production shape on trained-weights proxies (both frontier
seeds; the int8_frontier recipe: self-SR-adapted on REAL frames from the
reference's own demo clip) so the bound is a number, not an argument.

Usage: python scripts/cert_crop_delta.py [--adapt-steps 300]
       [--seeds 0,1] [--frames 16] [--chunk 2]
Prints one JSON line per seed: {"seed", "db_crop", "db_full", "delta_db"}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def frames_1080p(n):
    """n frames sampled across the demo clip, cubic-resized to 1920x1080
    (the flagship input shape)."""
    import cv2

    import distill_frontier as df

    src = df.load_frames()
    idx = np.linspace(0, len(src) - 1, n).astype(int)
    return np.stack([
        cv2.resize(src[i], (1920, 1080), interpolation=cv2.INTER_CUBIC)
        for i in idx
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--adapt-steps", type=int, default=300)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2,
                    help="frames per device dispatch for the full-frame "
                         "measurement (f32 1080p activations)")
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import distill_frontier as df
    from reve_tpu.models import srvgg
    from reve_tpu.pipeline.engine import UpscaleEngine

    train_frames = df.load_frames()[:-24]
    test = frames_1080p(args.frames)
    rows = []
    for seed in (int(s) for s in args.seeds.split(",")):
        cfg = srvgg.SRVGGConfig(num_feat=64, num_conv=16,
                                upscale=args.scale)
        params = df.train_teacher(cfg, train_frames, args.adapt_steps,
                                  seed)
        eng = UpscaleEngine(preloaded=(cfg, params),
                            batch_size=args.frames, compute_dtype="int8")
        eng.calibrate_int8(test)  # production calibration (cropped)
        db_crop = eng.certify_int8(test)
        db_full = eng.certify_int8(test, crop=False, chunk=args.chunk)
        row = {"seed": seed, "db_crop": round(db_crop, 2),
               "db_full": round(db_full, 2),
               "delta_db": round(abs(db_crop - db_full), 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    worst = max(r["delta_db"] for r in rows)
    print(json.dumps({"worst_delta_db": worst,
                      "bound_ok_1db": worst < 1.0}))


if __name__ == "__main__":
    main()
