"""One-call Python API.

The reference is binary-only (reve.exe argv, reve-shared/src/lib.rs:209-247);
this framework is also a library.  These are thin, blocking conveniences over
the same pipeline the CLI drives:

    import reve_tpu
    reve_tpu.upscale_video("in.mp4", "out.mkv", scale=2)
    reve_tpu.upscale_image("in.png", "out.png", scale=4)

Both resume-capable semantics (`upscale_video` keeps the CLI's workspace +
segment checkpoints: re-calling after a crash continues where it stopped)
and every CLI tuning knob are available as keyword arguments.
"""

from __future__ import annotations

import os
from typing import Optional


def _random_init_allowed(explicit_flag: bool) -> bool:
    from reve_tpu.models import registry

    return registry.random_init_allowed(True if explicit_flag else None)


def _check_weights(model, scale, weights, allow_random_init) -> None:
    """Raise registry.MissingWeightsError before any workspace/decode work
    when a job has no weights and random init was not opted into (the
    CLI's _require_weights pre-flight, as a library contract)."""
    from reve_tpu.models import registry

    if weights or registry.random_init_allowed(
            True if allow_random_init else None):
        return
    if registry.resolve_weights(model, scale) is None:
        spec, _ = registry.parse_model_name(model)
        stem = spec.canonical if spec.upscale is not None else \
            f"{spec.canonical}-x{scale}"
        raise registry.MissingWeightsError(
            registry.missing_weights_message(model, scale, stem))


def _resolve_device_index(device):
    """int -> jax.devices()[i] with a contextual range check (negative
    indices would silently wrap to a different accelerator)."""
    if not isinstance(device, int):
        return device
    import jax

    devs = jax.devices()
    if not 0 <= device < len(devs):
        raise ValueError(f"device index {device} out of range: this host "
                         f"has {len(devs)} device(s)")
    return devs[device]


def upscale_video(
    input_path: str,
    output_path: str,
    scale: int = 2,
    *,
    model: str = "realesr-animevideov3",
    weights: Optional[str] = None,
    segment_size: int = 1000,
    batch: int = 4,
    tile: int = 0,
    dtype: str = "auto",
    int8_calib: str = "p99.9",
    tta: bool = False,
    io_backend: Optional[str] = None,
    crf: int = 15,
    preset: str = "slow",
    x265_params: str = "psy-rd=2:aq-strength=1:deblock=0,0:bframes=8",
    workspace: Optional[str] = None,
    keep_workspace: bool = False,
    resume: bool = True,
    on_progress=None,
    scene_align: bool = False,
    device=None,
    mesh=None,
    compile_attempts: Optional[int] = None,
    allow_random_init: bool = False,
) -> dict:
    """Upscale a video through the full segmented, resumable pipeline.

    Returns the finalize report: {"backend": ..., "audio_copied": bool,
    "dtype": resolved compute path}.
    When `resume` and a prior interrupted workspace exists, continues it;
    otherwise starts fresh.  Raises on invalid inputs (same rules as the
    CLI: output must not exist, mkv input requires mkv output).

    `dtype="auto"` (default) selects the int8 turbo path on TPU when its
    PSNR vs f32, measured on frames sampled across this video, clears the
    50 dB gate — else bfloat16 (the CLI's --dtype auto policy).

    `on_progress`: optional callable receiving a snapshot dict
    ({stage: {done, total, rate}} for decode/upscale/encode/total plus
    x_realtime) after every counter update; called from pipeline worker
    threads.

    `device`: a jax.Device or jax.devices() index to pin to (the CLI's
    --device N).  `mesh`: a jax.sharding.Mesh with a 'dp' axis to shard
    each batch across devices (the CLI's --device N,M,...); `batch` must
    be a multiple of the dp size.  Mutually exclusive.

    `compile_attempts`: best-of-N fresh compiles per resolution (the
    compile-lottery mitigation, PERF.md).  None = auto: 2 on TPU for jobs
    >= 200 frames, else 1; REVE_TPU_COMPILE_ATTEMPTS overrides.

    `allow_random_init`: run with deterministic random weights when no
    trained weights resolve (tests/benchmarks only — the output is NOT a
    trained upscale).  Default False: missing weights raise
    registry.MissingWeightsError BEFORE any workspace or decode, matching
    the replaced engine's hard failure on absent model files
    (reve-shared/src/lib.rs:140-143).  REVE_TPU_ALLOW_RANDOM_INIT=1 is the
    env-var equivalent.
    """
    from fractions import Fraction

    from reve_tpu.io import probe as probe_mod
    from reve_tpu.pipeline import scheduler
    from reve_tpu.pipeline.engine import UpscaleEngine, auto_compile_attempts
    from reve_tpu.pipeline.planner import plan_segments
    from reve_tpu.pipeline.state import JobState, Workspace, repair_pending

    if scale not in (2, 3, 4):
        raise ValueError("scale must be 2, 3 or 4")
    if device is not None and mesh is not None:
        raise ValueError("device and mesh are mutually exclusive")
    if mesh is not None and batch % mesh.shape["dp"]:
        raise ValueError(f"batch {batch} must be a multiple of the "
                         f"mesh's dp size ({mesh.shape['dp']})")
    device = _resolve_device_index(device)
    if os.path.exists(output_path):
        raise FileExistsError(f"output path already exists: {output_path}")
    if input_path.lower().endswith(".mkv") and \
            not output_path.lower().endswith(".mkv"):
        raise ValueError("mkv input requires mkv output")
    ws = Workspace(workspace or output_path + ".revework")
    if not (resume and ws.has_state()):
        # an interrupted workspace defers to the resume path, whose saved
        # opts restore the original weights / random-init opt-in
        _check_weights(model, scale, weights, allow_random_init)
    if not ws.acquire_owner():
        raise RuntimeError(
            f"another live process is already working on this "
            f"workspace ({ws.owner_path}); wait for it to finish")
    try:
        if resume and ws.has_state():
            state = ws.load()
            if state.model != model or state.scale != scale:
                raise ValueError(
                    f"workspace {ws.root!r} holds progress for model "
                    f"{state.model!r} x{state.scale}; resume with the same "
                    f"model/scale or remove the workspace to start fresh")
            # restore the engine/io settings the job was STARTED with (the
            # CLI's resume contract, cli.run): resumed segments must go
            # through the same weights/dtype/container as committed ones —
            # a changed io_backend would even flip part_ext and discard them
            if state.opts.get("denoise") is not None:
                # CLI --denoise jobs run dni-INTERPOLATED weights; this API
                # has no denoise kwarg, so a resumed engine would silently
                # upscale the remaining segments with the plain weights —
                # exactly the mixed-model output the restore contract forbids
                raise ValueError(
                    f"workspace {ws.root!r} was started with --denoise "
                    f"(interpolated weights); resume it via the CLI with the "
                    f"original flags, or remove the workspace to start fresh")
            weights = state.opts.get("weights", weights)
            # pre-requirement state files ran under the implicit fallback
            allow_random_init = state.opts.get(
                "allow_random_init",
                allow_random_init or not state.opts.get("weights"))
            dtype = state.opts.get("dtype", dtype)
            int8_calib = state.opts.get("int8_calib", int8_calib)
            tta = state.opts.get("tta", False)
            io_backend = state.opts.get("io_backend", io_backend)
            part_ext = ".y4m" if io_backend == "y4m" else ".mp4"
            ws.create(keep_parts=True)
            state = repair_pending(state, ws, ext=part_ext)
        else:
            part_ext = ".y4m" if io_backend == "y4m" else ".mp4"
            info = probe_mod.probe(input_path, backend=io_backend)
            if info.frame_count <= 0:
                raise ValueError(f"could not determine frame count of "
                                 f"{input_path!r}")
            fps = info.fps or Fraction(30, 1)
            if scene_align:
                from reve_tpu.pipeline import scenes

                pending = scenes.plan_for_video(input_path, io_backend, info,
                                                segment_size)
            else:
                pending = plan_segments(info.frame_count, segment_size)
            ws.create(keep_parts=False)
            state = JobState(
                input_path=os.path.abspath(input_path),
                output_path=os.path.abspath(output_path),
                scale=scale,
                segment_size=segment_size,
                frame_count=info.frame_count,
                fps_num=fps.numerator,
                fps_den=fps.denominator,
                width=info.width,
                height=info.height,
                pending=pending,
                # persist the full plan: on resume repair_pending must see the
                # ACTUAL boundaries (scene-aligned plans are not re-derivable
                # from frame_count/segment_size)
                plan=list(pending),
                encode={"crf": crf, "preset": preset,
                        "x265_params": x265_params},
                model=model,
                opts={"weights": weights, "dtype": dtype,
                      "int8_calib": int8_calib, "tta": tta,
                      "io_backend": io_backend,
                      # persist the opt-in (env or kwarg) so a resumed call
                      # continues the decision the job was started with
                      "allow_random_init": _random_init_allowed(
                          allow_random_init)},
            )
        ws.save(state)

        def make_engine(d: str, calib: str) -> UpscaleEngine:
            return UpscaleEngine(model=state.model, scale=state.scale,
                                 weights=weights, batch_size=batch,
                                 tile=tile, compute_dtype=d,
                                 int8_calib=calib, tta=tta, device=device,
                                 mesh=mesh,
                                 compile_attempts=compile_attempts,
                                 allow_random_init=allow_random_init or None)

        engine = None
        if dtype == "auto":
            # certified int8 turbo on TPU, else bf16 (the CLI's --dtype
            # auto policy, scheduler.resolve_auto_dtype); the resolved
            # dtype is persisted so a resumed call runs the same path
            platform = (mesh.devices.flat[0].platform if mesh is not None
                        else device.platform if device is not None
                        else None)
            dtype, engine, _, _ = scheduler.resolve_auto_dtype(
                make_engine, ws, state, io_backend=io_backend,
                platform=platform)
            state.opts["dtype"] = dtype
            state.opts["int8_calib"] = int8_calib
            ws.save(state)
        if engine is None:
            engine = make_engine(dtype, int8_calib)
        if compile_attempts is None and \
                "REVE_TPU_COMPILE_ATTEMPTS" not in os.environ:
            platform = (mesh.devices.flat[0].platform if mesh is not None
                        else engine.device.platform)
            engine.compile_attempts = auto_compile_attempts(
                platform, sum(s.size for s in state.pending))
        progress = None
        if on_progress is not None:
            from reve_tpu.pipeline.progress import ProgressTracker

            progress = ProgressTracker(
                total_frames=sum(s.size for s in state.pending),
                total_segments=len(state.pending),
                on_update=lambda t: on_progress(t.snapshot()),
                source_fps=state.fps_num / max(state.fps_den, 1),
            )
        job = scheduler.PipelineJob(state, ws, engine, io_backend=io_backend,
                                    part_ext=part_ext, progress=progress)
        state = job.run()
        report = scheduler.finalize(state, ws, io_backend=io_backend,
                                    part_ext=part_ext)
        report["dtype"] = dtype
        if job.encoder_desc:
            report["encoder"] = job.encoder_desc
        if not keep_workspace:
            ws.destroy()
        return report
    finally:
        ws.release_owner()


def upscale_image(
    input_path: str,
    output_path: str,
    scale: int = 2,
    *,
    model: str = "realesr-animevideov3",
    weights: Optional[str] = None,
    tile: int = 0,
    dtype: str = "bfloat16",
    tta: bool = False,
    device=None,
    allow_random_init: bool = False,
) -> tuple:
    """Upscale one image file; returns the output (width, height).

    Grayscale, BGRA (alpha upscaled through the model) and 16-bit inputs
    keep their layout/bit depth (io/image.py — the replaced ncnn engine's
    still-image channel semantics); alpha requires a png/webp output.
    `device`: a jax.Device or jax.devices() index to pin to.
    `allow_random_init`: as in upscale_video — without it (or
    REVE_TPU_ALLOW_RANDOM_INIT=1), missing weights raise
    registry.MissingWeightsError.
    """
    import cv2

    from reve_tpu.io import image as image_mod
    from reve_tpu.pipeline.engine import UpscaleEngine

    _check_weights(model, scale, weights, allow_random_init)
    img = cv2.imread(input_path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError(f"cannot decode image {input_path!r}")
    if image_mod.classify(img) == "bgra" and \
            not image_mod.alpha_ok(output_path):
        raise ValueError("input has an alpha channel; output must be "
                         "png/webp to keep it")
    if dtype == "auto":  # images run the exact path (the CLI's rule)
        dtype = "bfloat16"
    device = _resolve_device_index(device)
    engine = UpscaleEngine(model=model, scale=scale, weights=weights,
                           batch_size=1, tile=tile, compute_dtype=dtype,
                           tta=tta, device=device,
                           allow_random_init=allow_random_init or None)
    err, dims = image_mod.upscale_image_file(engine, input_path,
                                             output_path, img=img)
    if err is not None:
        if err.startswith("cannot write"):
            raise IOError(err)
        raise ValueError(err)
    return dims
