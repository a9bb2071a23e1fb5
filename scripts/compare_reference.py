"""Acceptance workflow vs reference outputs (BASELINE: PSNR >= 50 dB).

Usage (when real weights + a reference output are available):

    # 1. upscale with this framework
    python -m reve_tpu.cli -i clip.mp4 -s 2 ours.mp4 --yes

    # 2. produce the reference output with realesrgan-ncnn-vulkan (or keep
    #    a stock of its PNG outputs) and compare:
    python scripts/compare_reference.py ours.mp4 reference.mp4
    python scripts/compare_reference.py ours.mp4 ref_frames_dir/

Prints per-frame min/p5/mean PSNR + SSIM and a pass/fail verdict at 50 dB.

Also certifies the int8 turbo mode on your own content (no reference
binary needed) — compare turbo output against the default bf16 output:

    python -m reve_tpu.cli -i clip.mp4 -s 2 turbo.mp4 --yes --dtype int8
    python scripts/compare_reference.py turbo.mp4 ours.mp4 --gate 40
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def frames_from_dir(path):
    import cv2

    for name in sorted(os.listdir(path)):
        if name.lower().endswith((".png", ".jpg")):
            img = cv2.imread(os.path.join(path, name))
            yield img[:, :, ::-1]


def main():
    argv = list(sys.argv[1:])
    gate = 50.0
    if "--gate" in argv:
        i = argv.index("--gate")
        try:
            gate = float(argv[i + 1])
        except (IndexError, ValueError):
            print(__doc__)
            print("error: --gate needs a dB number", file=sys.stderr)
            sys.exit(2)
        del argv[i:i + 2]
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    ours, ref = argv[0], argv[1]
    from reve_tpu.utils import quality

    if os.path.isdir(ref):
        from reve_tpu.io import reader

        psnrs = []
        with reader.open_reader(ours) as rd:
            for a, b in zip(rd.read_range(0, 10 ** 9), frames_from_dir(ref)):
                psnrs.append(quality.psnr(a, b))
        import numpy as np

        report = {
            "frames": len(psnrs),
            "psnr_mean": round(float(np.mean(psnrs)), 3),
            "psnr_min": round(float(np.min(psnrs)), 3),
            "psnr_p5": round(float(np.percentile(psnrs, 5)), 3),
        }
    else:
        report = quality.compare_videos(ours, ref)
    report["gate_db"] = gate
    report["pass_50db"] = report["psnr_min"] >= 50.0  # flagship gate
    report["pass"] = report["psnr_min"] >= gate
    print(json.dumps(report))


if __name__ == "__main__":
    main()
