"""Distill a teacher model into a (wider) student — CLI driver.

Example (channel-widening, PERF.md "Paths past the N=64 wall"):

    python scripts/distill.py --teacher realesr-animevideov3-x2 \
        --student-feat 128 --student-conv 16 --steps 2000 \
        --data /path/to/frames_dir_or_video --out student.ckpt

With --data absent, synthetic textured patches are used (pipeline
smoke-run; real distillation needs real frames).
"""

import os as _os

# benchmarks/dry runs measure FLOPs, not trained quality: opt into the
# deterministic random-init fallback (the product itself refuses to run
# without weights; see reve_tpu.models.registry.MissingWeightsError)
_os.environ.setdefault("REVE_TPU_ALLOW_RANDOM_INIT", "1")


import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # honor an explicit CPU request via jax.config: on this image a
    # sitecustomize-registered accelerator plugin overrides the env var,
    # and a wedged TPU relay then blocks jax.devices() forever (the
    # hermetic test suite runs this script with JAX_PLATFORMS=cpu)
    import jax

    jax.config.update("jax_platforms", "cpu")


def synthetic_batches(batch, patch, scale, seed=0):
    rs = np.random.RandomState(seed)
    while True:
        # mixed-frequency synthetic texture (better than white noise for
        # exercising an SR net)
        yy, xx = np.mgrid[0:patch, 0:patch].astype(np.float32)
        out = np.empty((batch, patch, patch, 3), np.float32)
        for b in range(batch):
            f1, f2 = rs.uniform(0.05, 0.6, 2)
            ph = rs.uniform(0, 6.28, 2)
            base = 0.5 + 0.25 * np.sin(f1 * xx + ph[0]) * \
                np.cos(f2 * yy + ph[1])
            noise = rs.normal(0, 0.05, (patch, patch, 1))
            out[b] = np.clip(base[..., None] + noise, 0, 1)
        yield out, None


def video_batches(path, batch, patch, scale, seed=0):
    from reve_tpu.io import probe, reader

    info = probe.probe(path)
    rs = np.random.RandomState(seed)
    with reader.open_reader(path, width=info.width,
                            height=info.height) as rd:
        frames = [f for f in rd.read_range(0, min(info.frame_count, 500))]
    frames = np.stack(frames).astype(np.float32) / 255.0
    while True:
        out = np.empty((batch, patch, patch, 3), np.float32)
        for b in range(batch):
            fi = rs.randint(len(frames))
            y = rs.randint(0, frames.shape[1] - patch + 1)
            x = rs.randint(0, frames.shape[2] - patch + 1)
            out[b] = frames[fi, y:y + patch, x:x + patch]
        yield out, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", default="realesr-animevideov3-x2")
    ap.add_argument("--teacher-weights", default=None)
    ap.add_argument("--student-feat", type=int, default=128)
    ap.add_argument("--student-conv", type=int, default=16)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--data", default=None,
                    help="video file with training frames (else synthetic)")
    ap.add_argument("--out", default="student.ckpt")
    args = ap.parse_args()

    from reve_tpu.models import registry, srvgg
    from reve_tpu.train import checkpoint
    from reve_tpu.train.distill import (DistillConfig, Distiller,
                                        run_distillation)
    from reve_tpu.train.trainer import TrainConfig

    spec, scale = registry.parse_model_name(args.teacher)
    tcfg, tparams = registry.load_model(args.teacher, scale,
                                        weights=args.teacher_weights)
    scfg = srvgg.SRVGGConfig(
        num_feat=args.student_feat, num_conv=args.student_conv,
        upscale=tcfg.upscale,
    )
    # data-parallel mesh sized to the batch (dp must divide it)
    import math

    import jax

    from reve_tpu.parallel import mesh as mesh_lib

    dp = math.gcd(args.batch, len(jax.devices()))
    mesh = mesh_lib.make_mesh(jax.devices()[:dp], max_sp=1)
    dist = Distiller(tcfg, tparams, scfg,
                     tc=TrainConfig(learning_rate=args.lr), mesh=mesh)
    batches = (video_batches(args.data, args.batch, args.patch, tcfg.upscale)
               if args.data else
               synthetic_batches(args.batch, args.patch, tcfg.upscale))
    dc = DistillConfig(steps=args.steps, batch=args.batch, patch=args.patch)
    history = run_distillation(dist, batches, dc)
    probe_lr, _ = next(batches)
    print(f"final loss {history[-1]:.5f}; "
          f"student/teacher agreement {dist.agreement_psnr(probe_lr):.2f} dB")
    if args.out.endswith(".pth"):
        # product weights: a realesr-compatible .pth the registry (and the
        # upstream ecosystem) loads directly — drop it in ./models/ under a
        # registered stem and the CLI/GUI pick it up
        from reve_tpu.weights.torch_loader import save_srvgg_pth

        save_srvgg_pth(args.out, scfg, jax.device_get(
            dist.trainer.export_params()))
        print(f"saved student weights: {args.out}")
    else:
        checkpoint.save(args.out, dist.trainer, step=args.steps)
        print(f"saved student checkpoint: {args.out}")


if __name__ == "__main__":
    main()
