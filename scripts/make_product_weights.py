"""Produce trained product weights as registry-loadable .pth files.

No published realesr weights exist on this no-egress image, so the most
realistic proxy is content-adapted training on REAL frames from the
reference's own demo clip (onepiece_demo.mp4 — the same recipe as
scripts/int8_frontier.py / distill_frontier.py):

    models/realesr-animevideov3-x4.pth        16-conv teacher (self-SR
                                              adapted on the demo content)
    models/realesr-animevideov3-fast-x4.pth   8-conv student distilled
                                              from that teacher (PERF.md
                                              round-4 depth frontier)

These let the PRODUCT paths run with real .pth artifacts: the CLI's
`-m models/ --dtype auto` flow resolves them like any upstream checkpoint
(reve_tpu.models.registry), auto-certification measures trained
activations, and the fast variant is an actual loadable model instead of
a recipe (round-4 VERDICT #3 and weak #4/#6).

Usage: python scripts/make_product_weights.py [--out-dir models]
       [--adapt-steps 300] [--distill-steps 800] [--scale 4] [--depth 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="models")
    ap.add_argument("--adapt-steps", type=int, default=300)
    ap.add_argument("--distill-steps", type=int, default=800)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    import distill_frontier as df
    from reve_tpu.models import srvgg
    from reve_tpu.weights.torch_loader import save_srvgg_pth

    frames = df.load_frames()
    print(f"{len(frames)} real frames {frames.shape[1]}x{frames.shape[2]} "
          f"from {df.DEMO_MP4}", file=sys.stderr)
    train_frames, eval_frames = frames[:-24], frames[-24:]
    s = args.scale
    eh, ew = (eval_frames.shape[1] // s) * s, (eval_frames.shape[2] // s) * s
    hr = eval_frames[:8, :eh, :ew].astype(np.float32) / 255.0
    eval_lr = hr.reshape(8, eh // s, s, ew // s, s, 3).mean((2, 4))
    eval_hr_u8 = np.clip(hr * 255.0 + 0.5, 0, 255).astype(np.uint8)

    tcfg = srvgg.SRVGGConfig(num_feat=64, num_conv=16, upscale=s)
    t0 = time.time()
    tparams = df.train_teacher(tcfg, train_frames, args.adapt_steps,
                               args.seed)
    print(f"teacher adapted in {time.time() - t0:.0f}s "
          f"(dB vs held-out HR: "
          f"{df.sr_quality_db(tcfg, tparams, eval_lr, eval_hr_u8):.2f})",
          file=sys.stderr)

    t0 = time.time()
    scfg, sparams = df.distill_student(tcfg, tparams, args.depth,
                                       train_frames, args.distill_steps,
                                       args.seed)
    agree = df.agreement_db(tcfg, tparams, scfg, sparams, eval_lr)
    hr_db = df.sr_quality_db(scfg, sparams, eval_lr, eval_hr_u8)
    print(f"depth-{args.depth} student distilled in {time.time() - t0:.0f}s"
          f" ({agree:.2f} dB vs teacher, {hr_db:.2f} dB vs held-out HR)",
          file=sys.stderr)

    os.makedirs(args.out_dir, exist_ok=True)
    tp = os.path.join(args.out_dir, f"realesr-animevideov3-x{s}.pth")
    sp = os.path.join(args.out_dir,
                      f"realesr-animevideov3-fast-x{s}.pth")
    save_srvgg_pth(tp, tcfg, jax.device_get(tparams))
    save_srvgg_pth(sp, scfg, jax.device_get(sparams))
    print(f"saved: {tp}\nsaved: {sp}")
    print(f'{{"teacher_pth": "{tp}", "student_pth": "{sp}", '
          f'"agreement_db": {agree:.2f}, "student_db_vs_hr": {hr_db:.2f}}}')


if __name__ == "__main__":
    main()
