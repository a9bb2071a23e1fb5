"""Distillation depth frontier: the one untried software lever to 60 fps
(VERDICT r3 #4).

The 16 hidden convs are ~the whole flagship cost (PERF.md ablation:
convs-only 37.9 of ~40 ms/frame), so a shallower student scales fps
near-linearly in num_conv.  This script measures the fps-vs-quality
frontier at num_conv in {8, 10, 12} against the 16-conv teacher:

  * teacher: 16-conv SRVGG self-SR-adapted on REAL frames from the
    reference's own demo clip (onepiece_demo.mp4, 640x480 anime — the
    model's actual domain; no published weights exist on this no-egress
    image, so trained-on-content weights are the most realistic proxy,
    same rationale as scripts/int8_frontier.py);
  * students: distilled from the teacher on the same content
    (train/distill.py machinery);
  * quality: student-vs-teacher PSNR on held-out frames (the "dB versus
    teacher" axis the VERDICT prescribes);
  * fps: the flagship 1080p->4K x4 bench methodology (bench.py
    _measure_path: best-of fresh compiles, on-device checksum sync) per
    depth, int8 turbo + bf16.

Ship bar: any depth holding >= 50 dB vs the teacher at >= 60 fps becomes
an opt-in model variant; otherwise the software story to 60 fps is
closed on this axis too.

Usage: python scripts/distill_frontier.py [--adapt-steps 300]
       [--distill-steps 800] [--depths 8,10,12] [--skip-fps]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # honor an explicit CPU request via jax.config: this image's
    # sitecustomize pre-imports jax with an accelerator plugin that
    # overrides the env var (see scripts/distill.py)
    import jax

    jax.config.update("jax_platforms", "cpu")

DEMO_MP4 = "/root/reference/reve-cli/assets/onepiece_demo.mp4"


def load_frames(path=DEMO_MP4, max_n=181):
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open {path}")
    frames = []
    while len(frames) < max_n:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(np.ascontiguousarray(f[:, :, ::-1]))
    cap.release()
    return np.stack(frames)


def crop_batches(frames, batch, patch, scale, seed):
    """LR/HR pairs: HR = real crops, LR = box-downscale (the
    int8_frontier self-SR recipe)."""
    rs = np.random.RandomState(seed)
    h, w = frames.shape[1:3]
    crop = (min(patch * scale, min(h, w)) // scale) * scale
    while True:
        hr = np.empty((batch, crop, crop, 3), np.float32)
        for b in range(batch):
            f = rs.randint(len(frames))
            y = rs.randint(0, h - crop + 1)
            x = rs.randint(0, w - crop + 1)
            hr[b] = frames[f, y:y + crop, x:x + crop]
        hr /= 255.0
        s = scale
        lr = hr.reshape(batch, crop // s, s, crop // s, s, 3).mean((2, 4))
        yield lr, hr


def train_teacher(cfg, frames, steps, seed=0):
    from reve_tpu.train.trainer import TrainConfig, Trainer

    tr = Trainer(cfg, TrainConfig(learning_rate=2e-4), seed=seed)
    it = crop_batches(frames, 4, 48, cfg.upscale, seed + 11)
    for step in range(steps):
        lr, hr = next(it)
        loss = tr.step(lr, hr)
        if step % 50 == 0:
            print(f"  teacher step {step}: loss {float(loss):.4f}",
                  file=sys.stderr)
    return tr.export_params()


def distill_student(tcfg, tparams, depth, frames, steps, seed=0):
    from reve_tpu.models import srvgg
    from reve_tpu.train.distill import Distiller
    from reve_tpu.train.trainer import TrainConfig

    scfg = srvgg.SRVGGConfig(num_feat=tcfg.num_feat, num_conv=depth,
                             upscale=tcfg.upscale)
    dist = Distiller(tcfg, tparams, scfg,
                     tc=TrainConfig(learning_rate=2e-4), seed=seed)
    it = crop_batches(frames, 4, 48, tcfg.upscale, seed + 23)
    for step in range(steps):
        lr, _ = next(it)
        loss = dist.step(lr)
        if step % 100 == 0:
            print(f"  d{depth} step {step}: loss {float(loss):.5f}",
                  file=sys.stderr)
    return scfg, dist.trainer.export_params()


def _u8_out(cfg, params, eval_lr):
    import jax.numpy as jnp

    from reve_tpu.models import srvgg

    y = srvgg.apply(params, jnp.asarray(eval_lr), cfg=cfg,
                    compute_dtype=jnp.float32)
    return np.asarray(jnp.clip(y * 255.0 + 0.5, 0.0, 255.0)
                      .astype(jnp.uint8))


def _psnr_u8(a_u8, b_u8):
    mse = max(np.mean((a_u8.astype(np.float64)
                       - b_u8.astype(np.float64)) ** 2), 1e-12)
    return 10.0 * np.log10(255.0 ** 2 / mse)


def agreement_db(tcfg, tparams, scfg, sparams, eval_lr):
    """Student-vs-teacher PSNR on the u8 output surface (what a user's
    pixels actually see), held-out frames."""
    return _psnr_u8(_u8_out(tcfg, tparams, eval_lr),
                    _u8_out(scfg, sparams, eval_lr))


def sr_quality_db(cfg, params, eval_lr, eval_hr_u8):
    """PSNR vs GROUND-TRUTH HR on held-out frames — the product-relevant
    quality axis: agreement_db measures mimicry of the teacher, this
    measures how much actual SR quality a depth trades away (a student
    0.2 dB-vs-HR behind the teacher is a near-free +fps even when the
    teacher-agreement number looks far from 50 dB)."""
    return _psnr_u8(_u8_out(cfg, params, eval_lr), eval_hr_u8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--adapt-steps", type=int, default=300)
    ap.add_argument("--distill-steps", type=int, default=800)
    ap.add_argument("--depths", default="8,10,12")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-fps", action="store_true",
                    help="quality axis only (no TPU bench)")
    ap.add_argument("--budget", type=float, default=1500.0,
                    help="fps-measurement deadline budget, seconds")
    args = ap.parse_args()

    import jax

    from reve_tpu.models import srvgg

    frames = load_frames()
    print(f"{len(frames)} real frames {frames.shape[1]}x{frames.shape[2]} "
          f"from {DEMO_MP4}", file=sys.stderr)
    # held-out eval: the last frames, untouched by training crops
    train_frames, eval_frames = frames[:-24], frames[-24:]
    s = args.scale
    eh = eval_frames.shape[1] // s * s
    ew = eval_frames.shape[2] // s * s
    hr = eval_frames[:8, :eh, :ew].astype(np.float32) / 255.0
    eval_lr = hr.reshape(8, eh // s, s, ew // s, s, 3).mean((2, 4))

    eval_hr_u8 = np.clip(hr * 255.0 + 0.5, 0, 255).astype(np.uint8)

    tcfg = srvgg.SRVGGConfig(num_feat=64, num_conv=16, upscale=s)
    t0 = time.time()
    tparams = train_teacher(tcfg, train_frames, args.adapt_steps,
                            args.seed)
    print(f"teacher adapted in {time.time() - t0:.0f}s", file=sys.stderr)

    import bench

    rows = []
    depths = [int(d) for d in args.depths.split(",")]
    for depth in depths + [16]:
        if depth == 16:
            scfg, sparams = tcfg, tparams
            db = float("inf")
        else:
            t0 = time.time()
            scfg, sparams = distill_student(
                tcfg, tparams, depth, train_frames, args.distill_steps,
                args.seed)
            db = agreement_db(tcfg, tparams, scfg, sparams, eval_lr)
            print(f"depth {depth}: {db:.2f} dB vs teacher "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
        hr_db = sr_quality_db(scfg, sparams, eval_lr, eval_hr_u8)
        row = {"num_conv": depth,
               "db_vs_teacher": round(db, 2) if db != float("inf") else None,
               "db_vs_hr": round(hr_db, 2)}
        if not args.skip_fps:
            dev_params = jax.device_put(sparams)
            deadline = time.time() + args.budget
            for path, batch in (("int8", 16), ("xla", 8)):
                fps, att = bench._measure_path(
                    path, scfg, dev_params, 1080, 1920, batch,
                    iters=10, warmup=1, deadline=deadline)
                row[f"fps_{path}"] = round(fps, 2)
                print(f"depth {depth} {path}: {fps:.2f} fps/chip "
                      f"({att} attempts)", file=sys.stderr)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| num_conv | dB vs teacher | dB vs HR | int8 fps | bf16 fps |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["num_conv"]):
        print(f"| {r['num_conv']} | "
              f"{r['db_vs_teacher'] if r['db_vs_teacher'] is not None else 'teacher'} | "
              f"{r.get('db_vs_hr', '-')} | "
              f"{r.get('fps_int8', '-')} | {r.get('fps_xla', '-')} |")


if __name__ == "__main__":
    main()
