"""Randomized mutation fuzzer for the native C++ core (ASan + UBSan).

The hermetic suite runs a fixed set of structured mutations
(tests/mp4_mutate.py via tests/test_native_sanitized.py); this script adds
budgeted RANDOM byte-level fuzzing over the same sanitized harness binary:
seed files (cv2-written mp4, codec-variant mp4s from mp4_mutate, our own
native-muxed mkv, y4m) are mutated with flips / integer stomps /
truncations / splices and fed through every parser entry point
(rc_probe_{mp4,mkv,y4m}, rc_concat_{mp4,mkv,y4m} as part AND as remux
original — reve_tpu/_native/test_main.cpp's corrupt-argv loop).  Any heap
overflow / UAF / UB aborts the binary with a sanitizer report; the
offending input is preserved as a repro.

Parsers here consume untrusted video files, so this is the framework's
standing robustness net — run it whenever the native core changes:

    python scripts/fuzz_native.py --seconds 600 [--seed N] [--keep DIR]

Exit code = number of distinct crashing inputs (0 = clean run).
"""

import argparse
import os
import random
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

NATIVE = os.path.join(REPO, "reve_tpu", "_native")

MAGIC32 = (0, 1, 7, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 0xFFFFFFFE,
           0x00000008, 0x40000000)


def build_sanitized(workdir):
    out = os.path.join(workdir, "reve_core_test")
    cmd = ["g++", "-std=c++17", "-g", "-O1",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           "-fno-omit-frame-pointer"]
    cmd += [os.path.join(NATIVE, f) for f in
            ("mp4.cpp", "mkv.cpp", "y4m.cpp", "core.cpp", "test_main.cpp")]
    cmd += ["-o", out]
    subprocess.run(cmd, check=True)
    return out


def make_seeds(workdir):
    """Valid files in every format the core parses, plus the codec-variant
    mp4s the remux paths walk deepest (opus/flac/tx3g/chapters)."""
    import cv2
    import numpy as np

    import mp4_mutate

    seeds = []

    def mp4(name, frames=8, size=(64, 48)):
        p = os.path.join(workdir, name)
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24, size)
        for j in range(frames):
            wr.write(np.full((size[1], size[0], 3), 20 + j * 7, np.uint8))
        wr.release()
        seeds.append(p)
        return p

    base = mp4("seed0.mp4")
    part2 = mp4("seed1.mp4")

    # codec-variant originals: these exercise the deep remux walks
    # (dOps -> OpusHead repack, dfLa, tx3g cues).  The variants need a
    # source with an mp4a audio track — the reference's own clip.
    ref = "/root/reference/reve-cli/assets/test.mp4"
    audio_src = ref if os.path.exists(ref) else None
    if audio_src:
        for name, fn in (("opus.mp4", mp4_mutate.mp4a_to_opus),
                         ("flac.mp4", mp4_mutate.mp4a_to_flac)):
            try:
                dst = os.path.join(workdir, name)
                fn(audio_src, dst)
                if os.path.exists(dst):
                    seeds.append(dst)
            except Exception:
                pass
        try:
            dst = os.path.join(workdir, "tx3g.mp4")
            mp4_mutate.add_tx3g_track(
                audio_src, dst, [(0, 500, "one"), (500, 900, "two")])
            if os.path.exists(dst):
                seeds.append(dst)
        except Exception:
            pass

    # a native-muxed mkv (our own muxer's output is what probe_mkv and the
    # mkv-original verbatim-copy path see in production)
    from reve_tpu import native
    mkv = os.path.join(workdir, "seed.mkv")
    try:
        native.concat_mkv([base, part2], base, mkv)
        seeds.append(mkv)
    except Exception:
        pass

    # y4m
    y4m = os.path.join(workdir, "seed.y4m")
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W8 H4 F24:1 Ip A1:1 C420\n")
        for i in range(4):
            f.write(b"FRAME\n")
            f.write(bytes([i * 31 & 0xFF]) * (32 + 8 + 8))
    seeds.append(y4m)

    # the reference's real clip, if present (a real-world muxer's layout)
    if audio_src:
        seeds.append(audio_src)
    return base, part2, seeds


def mutate(data, rng):
    """1-8 random structural/byte mutations."""
    buf = bytearray(data)
    for _ in range(rng.randint(1, 8)):
        if not buf:
            break
        kind = rng.randrange(6)
        off = rng.randrange(len(buf))
        if kind == 0:  # byte flips
            for _ in range(rng.randint(1, 32)):
                buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        elif kind == 1:  # 32-bit magic stomp (box sizes, counts, offsets)
            v = rng.choice(MAGIC32)
            b = v.to_bytes(4, rng.choice(("big", "little")))
            buf[off:off + 4] = b
        elif kind == 2:  # truncate
            buf = buf[:rng.randrange(1, len(buf) + 1)]
        elif kind == 3:  # duplicate a slice
            a = rng.randrange(len(buf))
            b = min(len(buf), a + rng.randint(1, 512))
            buf[off:off] = buf[a:b]
        elif kind == 4:  # delete a slice
            b = min(len(buf), off + rng.randint(1, 256))
            del buf[off:b]
        else:  # zero a range
            b = min(len(buf), off + rng.randint(1, 128))
            buf[off:b] = bytes(b - off)
    return bytes(buf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=300.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=24,
                    help="mutated files per harness exec")
    ap.add_argument("--keep", metavar="DIR",
                    help="work under DIR and keep repro files")
    args = ap.parse_args()

    root = args.keep or tempfile.mkdtemp(prefix="reve_fuzz_")
    os.makedirs(root, exist_ok=True)
    rng = random.Random(args.seed)

    binary = build_sanitized(root)
    part1, part2, seeds = make_seeds(root)
    corpus = [(p, open(p, "rb").read()) for p in seeds]
    print(f"fuzzing with {len(corpus)} seeds, budget {args.seconds:.0f}s, "
          f"seed {args.seed}")

    env = dict(os.environ,
               ASAN_OPTIONS="abort_on_error=0:exitcode=99:detect_leaks=0",
               UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1")
    out_mp4 = os.path.join(root, "out.mp4")
    deadline = time.time() + args.seconds
    execs = files = crashes = 0
    repros = []

    def run(paths):
        r = subprocess.run(
            [binary, part1, part2, "-", out_mp4] + paths,
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            timeout=120)
        return r

    while time.time() < deadline:
        batch = []
        for i in range(args.batch):
            _, data = corpus[rng.randrange(len(corpus))]
            p = os.path.join(root, f"m{execs}_{i}.bin")
            with open(p, "wb") as f:
                f.write(mutate(data, rng))
            batch.append(p)
        r = run(batch)
        execs += 1
        files += len(batch)
        if r.returncode != 0:
            # bisect to the offending file(s)
            for p in batch:
                ri = run([p])
                if ri.returncode != 0:
                    crashes += 1
                    repro = os.path.join(root, f"repro_{crashes}.bin")
                    shutil.copy(p, repro)
                    repros.append(repro)
                    sys.stderr.write(
                        f"CRASH rc={ri.returncode} repro={repro}\n"
                        f"{ri.stderr.decode(errors='replace')[-2000:]}\n")
            if not repros:
                # valid-path failure independent of the mutated files
                sys.stderr.write(
                    f"harness failed rc={r.returncode} without a mutated-"
                    f"file repro:\n{r.stderr.decode(errors='replace')[-800:]}\n")
                crashes += 1
                break
        for p in batch:
            os.unlink(p)

    print(f"{'FAIL' if crashes else 'PASS'}: {execs} execs, {files} mutated "
          f"files, {crashes} crash(es)"
          + (f"; repros: {repros}" if repros else ""))
    if not args.keep and not repros:
        shutil.rmtree(root, ignore_errors=True)
    return crashes


if __name__ == "__main__":
    sys.exit(main())
