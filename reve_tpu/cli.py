"""Drop-in compatible CLI.

Flag-for-flag parity with the reference CLI (reve-shared/src/lib.rs:209-280):

    reve -i <input.mp4|mkv> -s {2,3,4} [-S segsize] [-c crf] [-p preset]
         [-x x265params] <output.mp4|mkv>

Same validators: input must exist and be mp4/mkv; output must NOT exist and
be mp4/mkv; crf 0..51 (default 15); preset from the x264/x265 preset list
(default slow); segment size default 1000; default x265 params
psy-rd=2:aq-strength=1:deblock=0,0:bframes=8.

Extensions beyond the reference (new capabilities, defaulted off):
    --model / --weights        pick model / weight files (the reference
                               hardcodes realesr-animevideov3, lib.rs:141)
    --batch / --tile / --dtype engine tuning
    --io-backend               force ffmpeg / cv2 / y4m io
    --device N[,M,...]         pin to one accelerator, or shard batches
                               over a comma list (ncnn -g analog)
    -m/--models-dir, -f/--format
                               ncnn engine's model-path / image-format
                               switches
    --yes                      resume non-interactively
    --workspace                override the temp workspace location
    image input/output         `-i in.png -s 4 out.png` upscales a single
                               image; `-i dir/ -s 4 outdir/` a directory
                               of images — the replaced engine's own
                               surface (realesrgan-ncnn-vulkan accepts
                               files or folders; the reference GUI's
                               original flow)

Resume semantics match the reference (reve-cli/src/main.rs:43-102): if a
prior interrupted job's state exists, ask to resume; on refusal confirm and
start fresh.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from fractions import Fraction
from typing import List, Optional

from reve_tpu.pipeline.planner import plan_segments
from reve_tpu.pipeline.state import JobState, Workspace, repair_pending

log = logging.getLogger(__name__)

PRESETS = (
    "ultrafast", "superfast", "veryfast", "faster", "fast", "medium",
    "slow", "slower", "veryslow",
)
VIDEO_EXTS = (".mp4", ".mkv")
#: single-image mode: the surface of the engine this framework replaces —
#: realesrgan-ncnn-vulkan upscales images (`-i in.jpg -o out.png`), and the
#: reference GUI is a half-migrated image upscaler (SURVEY.md §2.5)
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _input_validation(s: str) -> str:
    if not os.path.exists(s):
        raise argparse.ArgumentTypeError("input path not found")
    if os.path.isdir(s):
        # directory of images -> batch image mode (the replaced ncnn
        # engine accepts a folder for -i/-o); content checked in
        # _run_image_dir so the error can name the directory
        return s
    if not s.lower().endswith(VIDEO_EXTS + (".y4m",) + IMAGE_EXTS):
        raise argparse.ArgumentTypeError(
            "valid input formats: mp4/mkv (videos), png/jpg/webp/bmp "
            "(images), or a directory of images"
        )
    return s


def _scale_validation(s: str) -> int:
    v = int(s)
    if v not in (2, 3, 4):
        raise argparse.ArgumentTypeError("upscale ratio must be 2, 3 or 4")
    return v


def _positive_int(name):
    def check(s: str) -> int:
        v = int(s)
        if v <= 0:
            raise argparse.ArgumentTypeError(f"{name} must be positive")
        return v
    return check


def _positive_float(name):
    def check(s: str) -> float:
        v = float(s)
        if v <= 0:
            raise argparse.ArgumentTypeError(f"{name} must be positive")
        return v
    return check


def _crf_validation(s: str) -> int:
    v = int(s)
    if not 0 <= v <= 51:
        raise argparse.ArgumentTypeError("crf must be in 0..51")
    return v


def _int8_calib_validation(s: str) -> str:
    """Same grammar the engine/service accept ("max" or "p<percentile>",
    reve_tpu.pipeline.engine.parse_int8_calib) so the three surfaces
    agree on what a valid spec is."""
    from reve_tpu.pipeline.engine import parse_int8_calib

    try:
        parse_int8_calib(s)
    except ValueError as e:
        raise argparse.ArgumentTypeError(str(e))
    return s


def _preset_validation(s: str) -> str:
    if s not in PRESETS:
        raise argparse.ArgumentTypeError(
            "valid: " + "/".join(PRESETS)
        )
    return s


def build_parser() -> argparse.ArgumentParser:
    from reve_tpu.version import __version__

    p = argparse.ArgumentParser(
        prog="reve",
        description="Real-ESRGAN video upscaler with resumability "
                    "(TPU-native rebuild)",
    )
    p.add_argument("--version", action="version",
                   version=f"reve-tpu {__version__}")
    p.add_argument("-i", "--inputpath", required=True,
                   type=_input_validation, help="input video path (mp4/mkv)")
    p.add_argument("outputpath", help="output video path (mp4/mkv)")
    p.add_argument("-s", "--scale", required=True, type=_scale_validation,
                   help="upscale ratio (2, 3, 4)")
    # the reference's README documents -P while its clap derive implements
    # -S (README.md:54 vs reve-shared/src/lib.rs:220); accept both
    p.add_argument("-S", "-P", "--segmentsize",
                   type=_positive_int("segment size"), default=1000,
                   help="segment size (in frames)")
    p.add_argument("-c", "--crf", type=_crf_validation, default=15,
                   help="video constant rate factor (crf: 51-0)")
    p.add_argument("-p", "--preset", type=_preset_validation, default="slow",
                   help="video encoding preset")
    p.add_argument("-x", "--x265params",
                   default="psy-rd=2:aq-strength=1:deblock=0,0:bframes=8",
                   help="x265 encoding parameters")
    # --- extensions ---
    p.add_argument("--model", default="realesr-animevideov3")
    p.add_argument("--weights", default=None,
                   help="path to .pth or ncnn .param weights")
    p.add_argument("--weights-wdn", default=None,
                   help="denoise-variant .pth for --denoise interpolation")
    p.add_argument("--denoise", type=float, default=None, metavar="D",
                   help="denoise strength 0..1 (needs --weights and "
                        "--weights-wdn; upstream -dni)")
    p.add_argument("--batch", type=_positive_int("batch"), default=4,
                   help="frames per TPU batch")
    p.add_argument("--tile", type=int, default=0,
                   help="tile size (0=auto, -1=never tile)")
    p.add_argument("--dtype",
                   choices=("auto", "bfloat16", "float32", "int8"),
                   default="auto",
                   help="compute dtype.  auto (default): on TPU, use the "
                        "int8 turbo path (~1.6x fps) when its PSNR vs f32 "
                        "measured on frames sampled across THIS video "
                        "clears 50 dB (or --int8-gate), else bfloat16; "
                        "elsewhere bfloat16.  int8 forces the turbo path "
                        "(SRVGG hidden stack / RRDB trunk quantized; "
                        "auto never picks int8 for RRDB — opt in here)")
    p.add_argument("--int8-calib", type=_int8_calib_validation,
                   default=None, dest="int8_calib", metavar="max|p<PCT>",
                   help="int8 turbo calibration statistic for activation "
                        "scales.  p<percentile> clips the outlier tail "
                        "(default p99.9 — best on both trained-weights "
                        "frontier seeds, PERF.md); max = true maxima")
    p.add_argument("--tta", action="store_true",
                   help="8-transform dihedral self-ensemble (the replaced "
                        "ncnn engine's -x switch): ~8x the compute for a "
                        "small quality gain")
    p.add_argument("--int8-gate", type=float, default=None, metavar="DB",
                   help="minimum int8-vs-f32 PSNR (dB) measured on frames "
                        "sampled across this video.  With --dtype auto: "
                        "overrides the 50 dB turbo-selection gate.  With "
                        "--dtype int8: refuse to run below DB (the turbo "
                        "PSNR is always reported)")
    p.add_argument("--device", default=None, metavar="N[,M,...]",
                   help="pin this process to accelerator N of "
                        "jax.devices() (the replaced ncnn engine's -g "
                        "gpu-id; e.g. one --shard-worker per chip on a "
                        "multi-chip host).  A comma list builds a local "
                        "data-parallel mesh over those devices (the ncnn "
                        "engine's multi-GPU `-g 0,1,...`): each batch of "
                        "frames is sharded across them, so --batch must "
                        "be a multiple of the device count")
    p.add_argument("-f", "--format", choices=("png", "jpg", "webp"),
                   default=None,
                   help="image output format for image/directory modes "
                        "(the replaced ncnn engine's -f switch; default: "
                        "keep each input's extension)")
    p.add_argument("-m", "--models-dir", default=None, metavar="DIR",
                   dest="models_dir",
                   help="directory searched for --model's weights "
                        "(<name>.pth or <name>.param+.bin; the replaced "
                        "ncnn engine's -m model-path switch).  Replaces "
                        "the default search path ($REVE_TPU_MODELS_DIR, "
                        "then ./models); an explicit --weights wins")
    p.add_argument("--allow-random-init", action="store_true",
                   dest="allow_random_init",
                   help="run with deterministic RANDOM weights when no "
                        "trained weights resolve for --model (tests/"
                        "benchmarks only: the output will NOT be a trained "
                        "upscale).  Without this flag (or "
                        "REVE_TPU_ALLOW_RANDOM_INIT=1) a job with no "
                        "weights refuses to start — the engine this "
                        "framework replaces fails hard when its model "
                        "files are absent")
    p.add_argument("--compile-attempts", type=_positive_int(
                   "compile-attempts"), default=None, metavar="N",
                   help="best-of-N fresh compiles per resolution, keeping "
                        "the fastest binary (this stack's compiler "
                        "non-deterministically emits 10-500x-slower "
                        "binaries for the same program — PERF.md "
                        "'compile lottery').  Default: 2 on TPU for jobs "
                        ">= 200 frames, else 1; env "
                        "REVE_TPU_COMPILE_ATTEMPTS overrides")
    p.add_argument("--io-backend", choices=("ffmpeg", "cv2", "y4m"),
                   default=None)
    p.add_argument("--workspace", default=None,
                   help="resume workspace dir (default: <output>.revework)")
    p.add_argument("--yes", action="store_true",
                   help="resume without asking (non-interactive)")
    p.add_argument("--keep-workspace", action="store_true",
                   help="do not delete the workspace after success")
    p.add_argument("--scene-align", action="store_true",
                   help="snap segment boundaries to detected scene cuts "
                        "(one extra decode pre-pass)")
    p.add_argument("--progress-json", default=None, metavar="FILE",
                   help="append machine-readable JSON progress snapshots "
                        "to FILE (one object per line)")
    p.add_argument("--trace", default=None, metavar="FILE",
                   help="write JSONL stage-timing events to FILE")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace into DIR")
    p.add_argument("--shard-worker", default=None, metavar="ID",
                   help="participate as a lease-queue worker (multi-host "
                        "segment sharding over a shared workspace); the "
                        "worker that finds all parts complete finalizes")
    p.add_argument("--lease-stale-after",
                   type=_positive_float("lease-stale-after"), default=None,
                   metavar="SECONDS",
                   help="declare a worker's segment lease stale (stealable) "
                        "after this many seconds without a heartbeat "
                        "(default 600; leases renew every few seconds while "
                        "a worker is alive)")
    return p


def _confirm(prompt: str, assume_yes: bool) -> bool:
    """Explicit consent, mirroring the reference's interactive confirms
    (reve-cli/src/main.rs:47-90).  A non-interactive run (no tty) must not
    silently resume or discard prior work: it aborts unless --yes was
    given."""
    if assume_yes:
        return True
    if not sys.stdin.isatty():
        raise SystemExit(
            f"{prompt} — non-interactive session; pass --yes to confirm"
        )
    answer = input(f"{prompt} [Y/n] ").strip().lower()
    return answer in ("", "y", "yes")


def _random_init_allowed() -> bool:
    from reve_tpu.models import registry

    return registry.random_init_allowed()


def _fresh_state(args) -> JobState:
    from reve_tpu.io import probe

    info = probe.probe(args.inputpath, backend=args.io_backend)
    if info.frame_count <= 0:
        raise SystemExit("could not determine frame count")
    fps = info.fps if info.fps else Fraction(30, 1)
    if getattr(args, "scene_align", False):
        from reve_tpu.pipeline import scenes

        pending = scenes.plan_for_video(args.inputpath, args.io_backend,
                                        info, args.segmentsize)
        print(f"scene-align: {len(pending)} segment(s) planned",
              file=sys.stderr)
    else:
        pending = plan_segments(info.frame_count, args.segmentsize)
    plan = list(pending)
    return JobState(
        input_path=os.path.abspath(args.inputpath),
        output_path=os.path.abspath(args.outputpath),
        scale=args.scale,
        segment_size=args.segmentsize,
        frame_count=info.frame_count,
        fps_num=fps.numerator,
        fps_den=fps.denominator,
        width=info.width,
        height=info.height,
        pending=pending,
        plan=plan,
        encode={
            "crf": args.crf,
            "preset": args.preset,
            "x265_params": args.x265params,
        },
        model=args.model,
        opts={
            "weights": args.weights,
            "weights_wdn": args.weights_wdn,
            "denoise": args.denoise,
            "dtype": args.dtype,
            "int8_calib": args.int8_calib,
            "tta": args.tta,
            "io_backend": args.io_backend,
            # persist the random-init opt-in: a resume continues the
            # decision the job was STARTED with (like every other opt)
            "allow_random_init": bool(
                args.allow_random_init or _random_init_allowed()),
        },
    )


def run(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    if "--list-models" in argv:
        from reve_tpu.models import registry

        # honor an -m/--models-dir on the same command line (the natural
        # way to check whether a model directory is picked up)
        dirs = None
        for i, a in enumerate(argv):
            if a in ("-m", "--models-dir") and i + 1 < len(argv):
                dirs = [argv[i + 1]]
            elif a.startswith("--models-dir="):
                dirs = [a.split("=", 1)[1]]
        for name, spec in registry.list_models():
            scales = spec.upscale or "2|3|4"
            found = [s for s in ([spec.upscale] if spec.upscale
                                 else (2, 3, 4))
                     if registry.resolve_weights(name, s, dirs)]
            w = (f"weights: x{'/x'.join(map(str, found))}" if found
                 else "weights: none (jobs refuse to start; "
                      "--allow-random-init to override)")
            print(f"{name}  [{spec.arch}, x{scales}]  {w}")
        return 0
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    err = _apply_models_dir(args)
    if err is not None:
        return err
    err = _require_weights(args)
    if err is not None:
        return err
    if args.dtype not in ("int8", "auto") and args.int8_calib is not None:
        print("--int8-calib requires --dtype int8 or auto (it configures "
              "the int8 turbo path only)", file=sys.stderr)
        return 2
    if args.int8_calib is not None and args.dtype == "auto" and (
            os.path.isdir(args.inputpath)
            or args.inputpath.lower().endswith(IMAGE_EXTS)):
        # image modes resolve auto to the exact path (no certification on
        # stills), so an explicit calibration knob would configure nothing
        # — a silently ignored quality option is worse than none
        print("--int8-calib has no effect in image mode unless --dtype "
              "int8 forces the turbo path (auto runs the exact path on "
              "stills)", file=sys.stderr)
        return 2
    args.int8_calib = args.int8_calib or "p99.9"
    if os.path.isdir(args.inputpath):
        if args.int8_gate is not None:
            print("--int8-gate applies to video jobs (image mode does "
                  "not run certification)", file=sys.stderr)
            return 2
        return _run_image_dir(args)
    if os.path.exists(args.outputpath):
        print("output path already exists", file=sys.stderr)
        return 2
    if args.dtype not in ("int8", "auto") and args.int8_gate is not None:
        # a silently ignored quality gate is worse than no gate: the
        # operator would believe certification ran when nothing did
        print("--int8-gate requires --dtype int8 or auto (it gates the "
              "int8 turbo path only)", file=sys.stderr)
        return 2
    if args.inputpath.lower().endswith(IMAGE_EXTS):
        if args.int8_gate is not None:
            print("--int8-gate applies to video jobs (image mode does "
                  "not run certification)", file=sys.stderr)
            return 2
        return _run_image(args)
    if args.format is not None:
        print("--format applies to image/directory modes (video output "
              "format follows the output extension)", file=sys.stderr)
        return 2
    if not args.outputpath.lower().endswith(VIDEO_EXTS + (".y4m",)):
        print("valid output formats: mp4/mkv", file=sys.stderr)
        return 2
    if args.inputpath.lower().endswith(".mkv") and \
            not args.outputpath.lower().endswith(".mkv"):
        # reference refuses mkv -> mp4 (reve-cli/src/main.rs:124-140)
        print("mkv input requires mkv output", file=sys.stderr)
        return 2

    # resolve --device (and its --batch divisibility) BEFORE any workspace
    # exists: a rejected invocation must not leave behind a fresh state
    # file whose saved opts hijack the user's next, corrected command
    device, mesh, err = _resolve_device(args)
    if err is not None:
        return err
    if mesh is not None and args.batch % mesh.shape["dp"]:
        print(f"--batch {args.batch} must be a multiple of the --device "
              f"count ({mesh.shape['dp']}) so each device gets the same "
              f"share of every batch", file=sys.stderr)
        return 2

    ws = Workspace(args.workspace or args.outputpath + ".revework")
    if not args.shard_worker:
        # single-writer guard: a second concurrent non-sharded run on
        # this workspace would redo every pending segment and race the
        # finalize rename; cooperating writers must use --shard-worker
        # (lease queue).  A crashed owner's lock (dead pid) is stolen.
        if not ws.acquire_owner():
            print(f"another live process is already working on this "
                  f"workspace ({ws.owner_path}); wait for it to finish "
                  f"or run both as --shard-worker", file=sys.stderr)
            return 2
    try:
        if ws.has_state():
            if _confirm("found an interrupted job — resume?", args.yes):
                state = ws.load()
                if state.model != args.model:
                    print(f"workspace holds progress for model {state.model!r};"
                          f" resume with the same --model or start fresh",
                          file=sys.stderr)
                    return 2
                if state.scale != args.scale:
                    # the reference resumes with its SAVED args wholesale
                    # (main.rs:92-101); we match that but say so — a silent
                    # -s override would surprise anyone who changed it
                    print(f"resume: using saved -s {state.scale} (command "
                          f"line said {args.scale})", file=sys.stderr)
                # restore the engine/io settings the job was STARTED with
                # (mirrors the reference's args.temp, main.rs:92-101): resumed
                # segments must go through the same model/weights/container as
                # the committed ones
                # ("fused" may appear in pre-round-3 state files; the Pallas
                # fused kernel was deleted after three rounds of losing to
                # XLA - PERF.md round 3)
                # jobs started before the --tta flag existed ran without it
                state.opts.setdefault("tta", False)
                # jobs started before weights became a product requirement
                # predate the opt-in flag; they ran under the old implicit
                # fallback, so a resume honors that
                state.opts.setdefault("allow_random_init",
                                      not state.opts.get("weights"))
                for key in ("weights", "weights_wdn", "denoise", "dtype",
                            "int8_calib", "tta", "io_backend",
                            "allow_random_init"):
                    if key in state.opts and \
                            getattr(args, key) != state.opts[key]:
                        if key == "dtype" and args.dtype == "auto":
                            # the default: restoring the job's RESOLVED
                            # dtype is auto working as designed, not a
                            # command-line conflict worth a warning
                            print(f"resume: continuing on the saved "
                                  f"--dtype={state.opts[key]!r} path",
                                  file=sys.stderr)
                        else:
                            print(f"resume: using saved "
                                  f"--{key.replace('_', '-')}"
                                  f"={state.opts[key]!r} (command line said "
                                  f"{getattr(args, key)!r})",
                                  file=sys.stderr)
                        setattr(args, key, state.opts[key])
                if args.int8_gate is not None and \
                        args.dtype not in ("int8", "auto"):
                    # the saved job is not int8, so certification will never
                    # run — refusing beats silently dropping an explicit
                    # gate.  A saved "auto" (interrupted before resolution
                    # persisted the resolved dtype) is fine: resolution
                    # reruns on resume and honors the gate.
                    print("--int8-gate was requested but this workspace's "
                          f"saved job runs --dtype {args.dtype}; resume "
                          "without the gate, or start fresh to run int8",
                          file=sys.stderr)
                    return 2
                ws.create(keep_parts=True)
                state = repair_pending(state, ws, ext=_part_ext(args))
                print(
                    f"resuming: {len(state.pending)} segment(s) remaining",
                    file=sys.stderr,
                )
            else:
                if not _confirm("discard previous progress and start over?",
                                args.yes):
                    return 1
                # starting fresh: the weights pre-flight deferred to the
                # saved opts, which are being discarded — re-check now
                err = _require_weights(args, skip_if_resumable=False)
                if err is not None:
                    return err
                ws.create(keep_parts=False)
                state = _fresh_state(args)
        else:
            ws.create(keep_parts=False)
            state = _fresh_state(args)
        ws.save(state)

        from reve_tpu.pipeline.engine import (UpscaleEngine,
                                              auto_compile_attempts)
        from reve_tpu.pipeline.progress import ConsoleRenderer, ProgressTracker
        from reve_tpu.pipeline import scheduler

        preloaded, err = _load_preloaded(args)
        if err is not None:
            return err
        if preloaded is not None and preloaded[0].upscale != state.scale:
            print(f"--denoise weights are x{preloaded[0].upscale} but -s "
                  f"{state.scale} was requested", file=sys.stderr)
            return 2

        def make_engine(dtype: str, int8_calib: str) -> UpscaleEngine:
            return UpscaleEngine(
                model=state.model, scale=state.scale, weights=args.weights,
                batch_size=args.batch, tile=args.tile, compute_dtype=dtype,
                int8_calib=int8_calib, tta=args.tta, device=device,
                mesh=mesh, preloaded=preloaded,
                compile_attempts=args.compile_attempts,
                allow_random_init=args.allow_random_init or None,
            )

        import time as _time

        from reve_tpu.utils import trace as trace_mod

        tracer = trace_mod.Tracer(args.trace) if args.trace else \
            trace_mod.from_env()

        engine = None
        int8_db = None
        resolve_s = None
        if args.dtype == "auto":
            # pick the certified int8 turbo when it clears the on-content
            # quality gate, else bf16 (scheduler.resolve_auto_dtype); the
            # RESOLVED dtype is persisted so a resume runs the same path
            platform = (mesh.devices.flat[0].platform if mesh is not None
                        else device.platform if device is not None
                        else None)
            resolve_t0 = _time.monotonic()
            args.dtype, engine, int8_db, notes = \
                scheduler.resolve_auto_dtype(
                    make_engine, ws, state, io_backend=args.io_backend,
                    gate_db=args.int8_gate, platform=platform,
                    on_note=lambda m: print(m, file=sys.stderr, flush=True),
                    tracer=tracer)
            resolve_s = _time.monotonic() - resolve_t0
            for msg in notes:
                print(msg, file=sys.stderr)
            state.opts["dtype"] = args.dtype
            state.opts["int8_calib"] = args.int8_calib
            ws.save(state)
        if engine is None:
            engine = make_engine(args.dtype, args.int8_calib)
        if args.compile_attempts is None and \
                "REVE_TPU_COMPILE_ATTEMPTS" not in os.environ:
            platform = (mesh.devices.flat[0].platform if mesh is not None
                        else engine.device.platform)
            engine.compile_attempts = auto_compile_attempts(
                platform, sum(s.size for s in state.pending))
        if args.dtype == "int8" and int8_db is None:
            err, int8_db = _certify_int8(args, state, engine, ws)
            if err is not None:
                return err
        from reve_tpu.pipeline.progress import JsonlRenderer, TeeRenderer

        renderer = ConsoleRenderer()
        jsonl = JsonlRenderer(args.progress_json) if args.progress_json else None
        remaining = sum(s.size for s in state.pending)
        tracker = ProgressTracker(
            total_frames=remaining,
            total_segments=len(state.pending),
            on_update=TeeRenderer(renderer, jsonl),
            source_fps=state.fps_num / max(state.fps_den, 1),
        )
        profile_ctx = trace_mod.device_profile(args.profile_dir)

        encoder_desc = None
        run_t0 = _time.monotonic()
        if args.shard_worker:
            from reve_tpu.pipeline import leases

            stale = (args.lease_stale_after
                     if args.lease_stale_after is not None
                     else leases.DEFAULT_STALE_AFTER)
            q = leases.SegmentLeaseQueue(ws, args.shard_worker,
                                         stale_after=stale,
                                         part_ext=_part_ext(args))
            with profile_ctx:
                done = leases.run_sharded(
                    state, ws, engine, args.shard_worker,
                    io_backend=args.io_backend, part_ext=_part_ext(args),
                    progress=tracker, stale_after=stale, tracer=tracer,
                    queue=q,
                )
            print(f"worker {args.shard_worker}: {done} segment(s)",
                  file=sys.stderr)
            if not q.all_done(state.pending):
                print("other workers still running; not finalizing",
                      file=sys.stderr)
                return 0
            # every worker that observes all_done reaches here — elect exactly
            # one finalizer so two near-simultaneous finishers don't both write
            # the output (O_EXCL finalize lease; stale+no-output is stealable)
            if not q.claim_finalize(state.output_path):
                print("another worker is finalizing; exiting", file=sys.stderr)
                return 0
        else:
            job = scheduler.PipelineJob(
                state, ws, engine, io_backend=args.io_backend,
                part_ext=_part_ext(args), progress=tracker, tracer=tracer,
            )
            try:
                with profile_ctx:
                    state = job.run()
                encoder_desc = job.encoder_desc
            except KeyboardInterrupt:
                # graceful interrupt: committed parts + state are already on
                # disk (checkpoint after every segment) — same guarantee the
                # reference gets from kill+resume, with a clean message
                job.cancel()
                done = len(ws.completed_parts(_part_ext(args)))
                print(f"\ninterrupted — {done} segment(s) committed; rerun the "
                      f"same command to resume", file=sys.stderr)
                return 130
        report = scheduler.finalize(
            state, ws, io_backend=args.io_backend, part_ext=_part_ext(args)
        )
        enc_note = f", encoder: {encoder_desc}" if encoder_desc else ""
        # end-to-end x-realtime for the frames THIS run processed (BASELINE.md
        # "end-to-end x realtime per segment: report"; resumed runs only paid
        # for their own pending segments, so that is the honest denominator)
        rate_note = ""
        elapsed = _time.monotonic() - run_t0
        done_frames = tracker.stages["encode"].done
        src_fps = state.fps_num / max(state.fps_den, 1)
        if elapsed > 0 and done_frames and src_fps > 0:
            e2e_fps = done_frames / elapsed
            # 3 significant digits, not fixed-point: a relay-capped run at
            # 0.0126 fps must not round to a meaningless "0.0 fps"
            rate_note = (f", {e2e_fps:.3g} fps end-to-end = "
                         f"{e2e_fps / src_fps:.3g}x realtime")
        # the chosen compute path + its measured quality certificate
        # belong in the done-line: the turbo/exact decision (--dtype
        # auto) must never be invisible in a log
        path_note = f", path: {args.dtype}"
        if args.dtype == "int8" and int8_db is not None:
            path_note = f", path: int8 turbo ({int8_db:.1f} dB certified)"
        if resolve_s is not None:
            # the auto-resolution pre-pass ran before the progress tracker
            # existed; its wall time belongs in the job's accounting
            path_note += f", auto-resolve {resolve_s:.1f} s"
        dev_fps = getattr(engine.stats, "device_fps", None)
        if dev_fps:
            # the compile-lottery probe's checksum-synced rate of the
            # binary this job ran — the chip's sustained throughput, which
            # e2e wall time cannot show when host<->device transfers are
            # the bottleneck (PERF.md); keyed by the job's input resolution
            key = (state.height, state.width)
            fps = dev_fps.get(key) or max(dev_fps.values())
            path_note += f", device {fps:.1f} fps/chip (compile-probe)"
        print(f"\ndone: {state.output_path} (concat backend: "
              f"{report['backend']}{enc_note}{path_note}{rate_note})",
              file=sys.stderr)
        if not args.keep_workspace:
            ws.destroy()
        return 0
    finally:
        if not args.shard_worker:
            ws.release_owner()


def _certify_int8(args, state, engine, ws: Workspace):
    """Report (and optionally gate) the int8 turbo quantization cost on
    THIS video before committing to a long job (explicit --dtype int8;
    --dtype auto runs the same measurement via resolve_auto_dtype):
    int8-vs-f32 PSNR on frames sampled across the video, using the exact
    scales the job will run with (persisted via `ws` — the SAME workspace
    the job runs in, so resume re-certifies identically).  Returns
    (exit_code_or_None, measured_db_or_None)."""
    from reve_tpu.pipeline import scheduler

    try:
        db = scheduler.certify_int8_on_input(engine, ws, state,
                                             io_backend=args.io_backend)
        if db is None:
            return None, None
    except Exception as e:
        if args.int8_gate is not None:
            # an explicit gate must fail CLOSED: if we cannot measure the
            # quantization cost we cannot prove it clears the bar
            print(f"refusing: int8 certification failed ({e}) and "
                  f"--int8-gate {args.int8_gate:g} demands a measured "
                  f"PSNR — run without --dtype int8 or without the gate",
                  file=sys.stderr)
            if not args.shard_worker and \
                    not ws.completed_parts(_part_ext(args)):
                ws.destroy()
            return 3, None
        print(f"int8 certification skipped: {e}", file=sys.stderr)
        return None, None
    ws.save(state)  # persist the sampled indices (opts["calib_frames"])
    n = len(state.opts.get("calib_frames") or ()) or \
        min(engine.batch_size, state.frame_count)
    print(f"int8 turbo: {db:.1f} dB vs f32 on {n} frame(s) sampled "
          f"across the video (quality gate reference: 50 dB)",
          file=sys.stderr)
    if args.int8_gate is not None and db < args.int8_gate:
        print(f"refusing: int8 PSNR {db:.1f} dB is below --int8-gate "
              f"{args.int8_gate:g} — run without --dtype int8 (or lower "
              f"the gate)", file=sys.stderr)
        # single-owner workspaces only: a shard worker's workspace is
        # SHARED (leases, calibration, sibling parts) — never delete it
        # out from under live workers
        if not args.shard_worker and \
                not ws.completed_parts(_part_ext(args)):
            ws.destroy()  # nothing committed: don't leave a resume prompt
        return 3, db
    return None, db


def _load_preloaded(args):
    """Resolve --denoise interpolated weights (shared by image/video modes).
    Returns (preloaded_or_None, error_exit_code_or_None)."""
    if args.denoise is None:
        return None, None
    if not (args.weights and args.weights_wdn):
        print("--denoise requires --weights and --weights-wdn",
              file=sys.stderr)
        return None, 2
    from reve_tpu.weights.interpolate import load_dni

    return load_dni(args.weights_wdn, args.weights, args.denoise), None


def _resolve_device(args):
    """--device N -> jax.devices()[N] (the ncnn engine's -g gpu-id
    analog); --device N,M,... -> a 1-axis 'dp' jax.sharding.Mesh over
    those devices (the ncnn engine's multi-GPU `-g 0,1,...` — here the
    engine shards each frame batch across the mesh instead of spawning
    per-GPU processes).  Returns (device, mesh, error_exit_code); at most
    one of device/mesh is set."""
    if args.device is None:
        return None, None, None
    import jax

    devs = jax.devices()
    try:
        idxs = [int(t) for t in str(args.device).split(",") if t.strip()]
    except ValueError:
        print(f"--device must be a device index or comma list of "
              f"indices, got {args.device!r}", file=sys.stderr)
        return None, None, 2
    if not idxs:
        print("--device needs at least one device index", file=sys.stderr)
        return None, None, 2
    for i in idxs:
        if not 0 <= i < len(devs):
            print(f"--device {i} out of range: this host has "
                  f"{len(devs)} device(s)", file=sys.stderr)
            return None, None, 2
    if len(set(idxs)) != len(idxs):
        print("--device indices must be distinct", file=sys.stderr)
        return None, None, 2
    if len(idxs) == 1:
        return devs[idxs[0]], None, None
    import numpy as np
    from jax.sharding import Mesh

    return None, Mesh(np.array([devs[i] for i in idxs]), ("dp",)), None


def _require_weights(args, skip_if_resumable: bool = True) -> Optional[int]:
    """Weights are a product requirement: the engine this framework
    replaces cannot run without its model files (realesrgan-ncnn-vulkan
    errors out when models/<name>.{param,bin} are absent; the hardcoded
    model the reference loads is reve-shared/src/lib.rs:140-143).  A
    random-init 'upscale' is hours of compute emitting plausible-looking
    garbage, so it is an explicit opt-in (--allow-random-init /
    REVE_TPU_ALLOW_RANDOM_INIT=1), never a fallback.  Runs BEFORE any
    workspace/probe/decode so a weightless invocation fails immediately.

    `skip_if_resumable`: an existing interrupted workspace defers the check
    to the resume path — the saved opts are the contract (they restore the
    original --weights / opt-in like the reference's args.temp,
    main.rs:92-101); a 'start fresh' answer re-runs this check."""
    from reve_tpu.models import registry

    if args.weights or registry.random_init_allowed(
            True if args.allow_random_init else None):
        return None
    if skip_if_resumable and \
            not args.inputpath.lower().endswith(IMAGE_EXTS) and \
            not os.path.isdir(args.inputpath) and \
            Workspace(args.workspace or
                      args.outputpath + ".revework").has_state():
        return None
    if registry.resolve_weights(args.model, args.scale) is not None:
        return None
    spec, _ = registry.parse_model_name(args.model)
    stem = spec.canonical if spec.upscale is not None else \
        f"{spec.canonical}-x{args.scale}"
    print(registry.missing_weights_message(args.model, args.scale, stem),
          file=sys.stderr)
    return 2


def _apply_models_dir(args) -> Optional[int]:
    """--models-dir DIR: resolve --model's weights from DIR into
    args.weights (the ncnn engine's `-m model-path`).  An explicitly
    named directory with no matching weights is an error — the implicit
    search path's random-init fallback would silently ignore the flag."""
    if args.models_dir is None or args.weights:
        return None
    if not os.path.isdir(args.models_dir):
        print(f"--models-dir {args.models_dir!r} is not a directory",
              file=sys.stderr)
        return 2
    from reve_tpu.models import registry

    w = registry.resolve_weights(args.model, args.scale,
                                 [args.models_dir])
    if w is None:
        print(f"no weights for {args.model!r} (x{args.scale}) in "
              f"{args.models_dir!r} (expected <name>.pth or "
              f"<name>.param + .bin)", file=sys.stderr)
        return 2
    args.weights = w
    return None


def _image_engine(args):
    """Build the (shared) engine for image mode; returns (engine, err)."""
    preloaded, err = _load_preloaded(args)
    if err is not None:
        return None, err
    device, mesh, err = _resolve_device(args)
    if err is not None:
        return None, err
    if mesh is not None:
        print("image mode runs one frame at a time on one device; pass "
              "a single --device index", file=sys.stderr)
        return None, 2

    from reve_tpu.pipeline.engine import UpscaleEngine

    # image modes run the exact path under --dtype auto: per-content
    # certification is a video-job contract (sampled frames), and a still
    # image is too small to amortize calibration + turbo compilation
    dtype = "bfloat16" if args.dtype == "auto" else args.dtype
    return UpscaleEngine(
        model=args.model, scale=args.scale, weights=args.weights,
        batch_size=1, tile=args.tile, compute_dtype=dtype,
        int8_calib=args.int8_calib, tta=args.tta,
        device=device,
        preloaded=preloaded,
        allow_random_init=args.allow_random_init or None,
    ), None


def _run_image(args) -> int:
    """Single-image upscale: the replaced engine's own surface
    (realesrgan-ncnn-vulkan `-i in.jpg -o out.png`; the reference GUI's
    original image flow, reve-gui Index.vue `upscale_single_image`).
    Grayscale/alpha/16-bit layouts route through io/image.py."""
    import cv2

    from reve_tpu.io import image as image_mod

    if not args.outputpath.lower().endswith(IMAGE_EXTS):
        print("image input requires an image output "
              "(png/jpg/webp/bmp)", file=sys.stderr)
        return 2
    if args.format is not None and not _format_matches(
            args.outputpath, args.format):
        # the output path names the format in single-file mode; writing
        # <fmt> bytes under a different extension would lie to every
        # later consumer of the file
        print(f"--format {args.format} conflicts with the output "
              f"extension {os.path.splitext(args.outputpath)[1]!r}; in "
              f"single-image mode the output path decides the format",
              file=sys.stderr)
        return 2
    img = cv2.imread(args.inputpath, cv2.IMREAD_UNCHANGED)
    if img is None:
        print(f"cannot decode image {args.inputpath!r}", file=sys.stderr)
        return 2
    try:
        mode = image_mod.classify(img)
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    if mode == "bgra" and not image_mod.alpha_ok(args.outputpath):
        print("input has an alpha channel; output must be png/webp "
              "to keep it", file=sys.stderr)
        return 2
    engine, err = _image_engine(args)
    if err is not None:
        return err
    msg, dims = image_mod.upscale_image_file(
        engine, args.inputpath, args.outputpath, img=img)
    if msg is not None:
        print(msg, file=sys.stderr)
        return 2
    print(f"done: {args.outputpath} ({dims[0]}x{dims[1]})",
          file=sys.stderr)
    return 0


def _run_image_dir(args) -> int:
    """Directory batch: `-i <dir> -s N <outdir>` upscales every image in
    <dir> — the replaced ncnn engine accepts folders for -i/-o.  One
    engine (and its compiled graphs) is shared across files; existing
    outputs are SKIPPED so an interrupted batch re-run continues where it
    stopped (the framework's resume idiom; the ncnn binary overwrites).
    Alpha images whose extension cannot carry alpha are written as .png
    with a note."""
    from reve_tpu.io import image as image_mod

    files = sorted(
        f for f in os.listdir(args.inputpath)
        if f.lower().endswith(IMAGE_EXTS)
        and os.path.isfile(os.path.join(args.inputpath, f))
    )
    if not files:
        print(f"no images (png/jpg/webp/bmp) in {args.inputpath!r}",
              file=sys.stderr)
        return 2
    if os.path.isfile(args.outputpath):
        print("output for a directory input must be a directory",
              file=sys.stderr)
        return 2
    if os.path.realpath(args.outputpath) == \
            os.path.realpath(args.inputpath):
        # outputs would collide with the inputs themselves: every target
        # "already exists" and the whole batch silently skips
        print("output directory must differ from the input directory",
              file=sys.stderr)
        return 2
    os.makedirs(args.outputpath, exist_ok=True)
    engine, err = _image_engine(args)
    if err is not None:
        return err
    import cv2

    fmt = args.format
    #: owner of each default output name: when --format maps two stems
    #: onto one name, the input whose filename already IS that name owns
    #: it (its output must not be shadowed — the skip-exists check would
    #:  silently never upscale it), then sorted-first; everyone else
    #: diverts to <name>.<fmt>
    owner = {}
    for f in files:
        ident = (os.path.splitext(f)[0] + "." + fmt) if fmt else f
        cur = owner.get(ident)
        if cur is None or (f == ident and cur != ident):
            owner[ident] = f
    claimed = set()
    done = failed = skipped = 0
    for name in files:
        in_path = os.path.join(args.inputpath, name)
        stem = os.path.splitext(name)[0]
        own = (stem + "." + fmt) if fmt else name
        out_name = own if owner[own] == name else name + "." + fmt
        if out_name != own:
            print(f"{name}: output name taken -> writing {out_name}",
                  file=sys.stderr)
        img = cv2.imread(in_path, cv2.IMREAD_UNCHANGED)
        if img is not None and img.ndim == 3 and img.shape[2] == 4 \
                and not image_mod.alpha_ok(out_name):
            retarget = stem + ".png"
            if (retarget in owner and owner[retarget] != name) \
                    or retarget in claimed:
                # a sibling input already owns that name — keep the
                # original filename so nothing is shadowed or skipped
                retarget = name + ".png"
            out_name = retarget
            print(f"{name}: alpha channel -> writing {out_name}",
                  file=sys.stderr)
        claimed.add(out_name)
        out_path = os.path.join(args.outputpath, out_name)
        if os.path.exists(out_path):
            skipped += 1
            continue
        msg, _ = image_mod.upscale_image_file(engine, in_path, out_path,
                                              img=img)
        if msg is None:
            done += 1
            print(f"[{done + failed}/{len(files)}] {name}",
                  file=sys.stderr)
        else:
            failed += 1
            print(f"[{done + failed}/{len(files)}] {name}: {msg}",
                  file=sys.stderr)
    summary = f"done: {done} upscaled"
    if skipped:
        summary += f", {skipped} already present (skipped)"
    if failed:
        summary += f", {failed} FAILED"
    print(summary, file=sys.stderr)
    return 0 if not failed else 2


def _format_matches(path: str, fmt: str) -> bool:
    """Does `path`'s extension name the same encoding as --format `fmt`?
    (jpg and jpeg are the same encoder)."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    return ext == fmt or (fmt == "jpg" and ext == "jpeg")


def _part_ext(args) -> str:
    return ".y4m" if args.io_backend == "y4m" else ".mp4"


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
