"""GAN fine-tuning driver: the published Real-ESRGAN second training phase.

Fine-tune a (pretrained or fresh) SRVGG generator on your own footage with
the full second-order degradation pipeline (reve_tpu.train.degradation) and
the U-Net spectral-norm discriminator (reve_tpu.train.gan).

    python scripts/finetune_gan.py --data footage.mp4 --scale 2 \
        --steps 2000 --out finetuned.ckpt [--weights base.pth]

With --data absent, synthetic textured patches smoke-run the pipeline.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="video file for HR patches")
    ap.add_argument("--model", default="realesr-animevideov3")
    ap.add_argument("--weights", default=None,
                    help="generator init (.pth/.param); default: registry")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--patch", type=int, default=128, help="HR patch side")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--gan-weight", type=float, default=0.1)
    ap.add_argument("--g-lr", type=float, default=1e-4)
    ap.add_argument("--d-lr", type=float, default=1e-4)
    ap.add_argument("--pipeline", default="realesrgan",
                    choices=("realesrgan", "light"))
    ap.add_argument("--out", default="finetuned.ckpt")
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args()

    from reve_tpu.models import registry
    from reve_tpu.train import gan
    from reve_tpu.train.data import DataConfig, batches_from_video

    cfg, params = registry.load_model(args.model, scale=args.scale,
                                      weights=args.weights)
    trainer = gan.GANTrainer(
        cfg, gan.GANConfig(gan_weight=args.gan_weight,
                           g_lr=args.g_lr, d_lr=args.d_lr),
        g_params=params,
    )

    dcfg = DataConfig(scale=args.scale, patch=args.patch, batch=args.batch,
                      pipeline=args.pipeline)
    if args.data:
        def batches():
            while True:
                yield from batches_from_video(args.data, dcfg,
                                              frame_stride=5)
    else:
        from reve_tpu.train.data import degrade

        def batches():
            rs = np.random.RandomState(0)
            yy, xx = np.mgrid[0:args.patch, 0:args.patch] / args.patch
            while True:
                hr = np.empty((args.batch, args.patch, args.patch, 3),
                              np.float32)
                for b in range(args.batch):
                    f1, f2 = rs.uniform(2, 20, 2)
                    hr[b] = np.stack([
                        0.5 + 0.4 * np.sin(f1 * xx + f2 * yy),
                        0.5 + 0.4 * np.cos(f2 * xx - f1 * yy),
                        (yy + xx) / 2,
                    ], -1)
                lr = np.stack([degrade(h, dcfg, rs) for h in hr])
                yield lr, hr

    it = batches()
    for step in range(1, args.steps + 1):
        lr, hr = next(it)
        metrics = trainer.step(lr, hr)
        if step % args.log_every == 0 or step == 1:
            print(f"step {step}: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(metrics.items())))

    from reve_tpu.train import checkpoint

    class _Holder:  # checkpoint.save expects .params/.opt_state
        # ship the EMA generator (export_params) — the upstream
        # net_g_ema convention; the live params stay in opt resume state
        params = trainer.export_params()
        opt_state = trainer.g_opt

    checkpoint.save(args.out, _Holder, args.steps)
    print(f"saved generator checkpoint: {args.out}")


if __name__ == "__main__":
    main()
