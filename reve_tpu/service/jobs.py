"""Job manager for the web service: queue of upscale jobs, one at a time.

The reference GUI processes a multi-selection of videos sequentially, one
subprocess at a time (reve-gui/src/pages/Index.vue:340-353); here jobs run
sequentially on a worker thread through the SAME pipeline core the CLI uses
(segmentation, resume, progress) — unlike the reference, whose GUI bypassed
its own library and lost segmentation/resume (SURVEY.md §1 note).
"""

from __future__ import annotations

import dataclasses
import itertools
import os
import threading
import traceback
from typing import Dict, List, Optional

from reve_tpu.pipeline.planner import plan_segments
from reve_tpu.pipeline.progress import ProgressTracker
from reve_tpu.pipeline.state import JobState, Workspace, repair_pending


def replace_file_suffix(path: str, factor: int, ext: str = "mp4") -> str:
    """'<stem>.<old>' -> '<stem>_upscaled-{N}x.<ext>' — the reference GUI's
    output naming rule (reve-gui/src-tauri/src/utils.rs:53-57)."""
    stem = os.path.splitext(path)[0]
    return f"{stem}_upscaled-{factor}x.{ext}"


@dataclasses.dataclass
class Job:
    id: int
    input_path: str
    output_path: str
    model: str
    scale: int
    #: auto (default: certified int8 turbo on TPU, else bfloat16 —
    #: resolved to a concrete dtype when the job starts) | bfloat16 |
    #: float32 | int8
    dtype: str = "auto"
    #: int8 only: calibration statistic ("p<percentile>" or "max",
    #: engine.int8_calib; PERF.md int8 frontier)
    int8_calib: str = "p99.9"
    #: 8-transform dihedral self-ensemble (the replaced ncnn engine's -x
    #: switch; engine.tta): ~8x compute for a small quality gain
    tta: bool = False
    status: str = "queued"    # queued | running | done | error | cancelled
    cancel_requested: bool = False
    error: str = ""
    #: --dtype auto resolution note (which path was chosen and why)
    dtype_note: str = ""
    #: int8 turbo only: measured quantization PSNR (dB) vs f32 on this
    #: video's first frames (engine.certify_int8)
    int8_psnr: Optional[float] = None
    progress: Optional[ProgressTracker] = None
    result: Optional[dict] = None
    pipeline: object = None   # live PipelineJob while running
    part_ext: str = ".mp4"

    @property
    def workspace_path(self) -> str:
        return os.path.abspath(self.output_path) + ".revework"

    def committed_parts(self) -> list:
        """Progressive output: segment part files already committed to the
        workspace (streamable while the job is still running)."""
        from reve_tpu.pipeline.state import Workspace

        ws = Workspace(self.workspace_path)
        try:
            idxs = ws.completed_parts(self.part_ext)
        except OSError:
            return []
        out = []
        for i in idxs:
            p = ws.part_path(i, self.part_ext)
            try:
                out.append({"index": i, "path": p,
                            "size": os.path.getsize(p)})
            except OSError:
                pass
        return out

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "input": self.input_path,
            "output": self.output_path,
            "model": self.model,
            "scale": self.scale,
            "dtype": self.dtype,
            "int8_calib": self.int8_calib,
            "tta": self.tta,
            "status": self.status,
            "error": self.error,
            "dtype_note": self.dtype_note,
            "int8_psnr": self.int8_psnr,
            "progress": self.progress.snapshot() if self.progress else None,
            "result": self.result,
        }


class JobManager:
    def __init__(self, service_cfg, engine_factory=None, io_backend=None):
        self.cfg = service_cfg
        self.engine_factory = engine_factory or self._default_engine_factory
        self.io_backend = io_backend
        self.jobs: Dict[int, Job] = {}
        self._engines: Dict[tuple, object] = {}
        self._order: List[int] = []
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._worker = threading.Thread(
            target=self._run_loop, name="reve-jobs", daemon=True
        )
        self._worker.start()

    @staticmethod
    def _default_engine_factory(model: str, scale: int,
                                dtype: str = "bfloat16",
                                int8_calib: str = "p99.9",
                                tta: bool = False):
        from reve_tpu.pipeline.engine import UpscaleEngine

        return UpscaleEngine(model=model, scale=scale, compute_dtype=dtype,
                             int8_calib=int8_calib, tta=tta)

    def _get_engine(self, model: str, scale: int, dtype: str = "bfloat16",
                    int8_calib: str = "p99.9", tta: bool = False):
        """Engines (and their compiled executables) are reused across jobs
        of the same (model, scale, dtype, calib) — a fresh engine per job
        would pay the multi-second XLA compile for every batch-queue entry.

        Custom engine factories with fewer parameters (tests/plugins) keep
        working for the default dtype/calib; a non-default value with such
        a factory is an explicit error rather than a silent fallback."""
        key = (model, scale, dtype, int8_calib, tta)
        engine = self._engines.get(key)
        if engine is None:
            import inspect

            factory = self.engine_factory
            try:
                sig = inspect.signature(factory)
            except (TypeError, ValueError):  # builtins: assume full arity
                sig = None
            # call with the longest positional prefix the factory can BIND
            # (robust to *args/**kwargs and defaults, unlike a raw
            # parameter count); refusing to silently drop a non-default
            # setting stays an explicit error
            for call in ((model, scale, dtype, int8_calib, tta),
                         (model, scale, dtype, int8_calib),
                         (model, scale, dtype),
                         (model, scale)):
                if sig is not None:
                    try:
                        sig.bind(*call)
                    except TypeError:
                        continue
                if len(call) < 5 and tta:
                    raise ValueError(
                        f"engine_factory {factory!r} does not accept a "
                        f"tta argument; cannot run a tta job")
                # int8_calib only matters when the job actually runs int8;
                # the engine's own default is p99.9, so a short factory
                # can still serve default-calibration int8 jobs
                if len(call) < 4 and dtype == "int8" and \
                        int8_calib != "p99.9":
                    raise ValueError(
                        f"engine_factory {factory!r} does not accept an "
                        f"int8_calib argument; cannot run an "
                        f"int8_calib={int8_calib!r} job")
                if len(call) < 3 and dtype != "bfloat16":
                    raise ValueError(
                        f"engine_factory {factory!r} does not accept a "
                        f"dtype argument; cannot run a {dtype} job")
                engine = factory(*call)
                break
            else:
                raise TypeError(
                    f"engine_factory {factory!r} must accept "
                    f"(model, scale[, dtype[, int8_calib[, tta]]])")
            self._engines[key] = engine
        return engine

    def submit(self, input_path: str, scale: Optional[int] = None,
               model: Optional[str] = None,
               output_path: Optional[str] = None,
               dtype: Optional[str] = None,
               int8_calib: Optional[str] = None,
               tta: bool = False) -> Job:
        scale = scale or self.cfg.default_scale
        model = model or self.cfg.default_upscale_type
        if dtype not in (None, "auto", "bfloat16", "float32", "int8"):
            raise ValueError(f"invalid dtype {dtype!r}")
        if int8_calib is not None:
            from reve_tpu.pipeline.engine import parse_int8_calib

            parse_int8_calib(int8_calib)  # raises ValueError -> HTTP 400
        if not isinstance(tta, bool):
            raise ValueError(f"tta must be a boolean, got {tta!r}")
        output_path = output_path or replace_file_suffix(input_path, scale)
        with self._lock:
            job = Job(
                id=next(self._ids), input_path=input_path,
                output_path=output_path, model=model, scale=scale,
                dtype=dtype or "auto",
                int8_calib=int8_calib or "p99.9",
                tta=tta,
            )
            self.jobs[job.id] = job
            self._order.append(job.id)
        self._wake.set()
        return job

    def list_jobs(self) -> List[dict]:
        with self._lock:
            return [self.jobs[i].to_json() for i in self._order]

    def get(self, job_id: int) -> Optional[Job]:
        return self.jobs.get(job_id)

    def cancel(self, job_id: int) -> bool:
        """Cancel a queued or running job; completed parts remain so the
        job can be re-submitted and resume."""
        job = self.jobs.get(job_id)
        if job is None:
            return False
        with self._lock:
            if job.status == "queued":
                job.status = "cancelled"
                return True
        if job.status == "running":
            # the flag covers the probe/engine-build/compile window before
            # job.pipeline is set, and lets the worker classify the
            # outcome as a user cancellation (no substring matching)
            job.cancel_requested = True
            if job.pipeline is not None:
                job.pipeline.cancel()
            return True
        return False

    def shutdown(self):
        self._stop = True
        self._wake.set()

    # -- worker ------------------------------------------------------------

    def _next_queued(self) -> Optional[Job]:
        """Claim the next queued job: the queued->running transition
        happens under the lock, so a concurrent cancel() can never be
        overwritten by the worker."""
        with self._lock:
            for jid in self._order:
                if self.jobs[jid].status == "queued":
                    self.jobs[jid].status = "running"
                    return self.jobs[jid]
        return None

    def _run_loop(self):
        while not self._stop:
            job = self._next_queued()
            if job is None:
                self._wake.wait(timeout=0.2)
                self._wake.clear()
                continue
            try:
                job.result = self._run_job(job)
                job.status = "done"
            except Exception as e:  # surfaced via the API, like the
                if job.cancel_requested:
                    job.status = "cancelled"
                else:
                    job.error = f"{e}\n{traceback.format_exc(limit=3)}"
                    job.status = "error"  # reference's commands.rs:86-94
            finally:
                job.pipeline = None

    def _run_job(self, job: Job) -> dict:
        from fractions import Fraction

        from reve_tpu.io import probe
        from reve_tpu.pipeline import scheduler

        io_backend = self.io_backend
        ws = Workspace(
            os.path.abspath(job.output_path) + ".revework"
        )
        if not ws.acquire_owner():
            raise RuntimeError(
                f"another live process (e.g. a CLI run) owns this "
                f"workspace ({ws.owner_path}); wait for it to finish")
        try:
            if ws.has_state():
                # re-submitted after cancel/crash: resume from completed parts,
                # mirroring the CLI path (cancel() documents this contract)
                st = ws.load()
                if (st.model != job.model or st.scale != job.scale):
                    raise RuntimeError(
                        f"workspace {ws.root!r} holds progress for model "
                        f"{st.model!r} x{st.scale}; resubmit with the same "
                        f"settings to resume, or remove the workspace/choose "
                        f"another output to start fresh")
                # restore the engine/io settings the job was STARTED with (the
                # CLI resume contract, cli.run): resumed segments must be
                # computed like the committed ones — never mix bf16- and
                # int8-upscaled segments in one output, and a changed
                # io_backend would flip part_ext and silently discard every
                # committed part (a CLI y4m job resumed through the service)
                job.dtype = st.opts.get("dtype", job.dtype)
                job.int8_calib = st.opts.get("int8_calib", job.int8_calib)
                job.tta = st.opts.get("tta", False)
                io_backend = st.opts.get("io_backend", io_backend)
                part_ext = ".y4m" if io_backend == "y4m" else ".mp4"
                job.part_ext = part_ext
                ws.create(keep_parts=True)
                st = repair_pending(st, ws, ext=part_ext)
            else:
                part_ext = ".y4m" if io_backend == "y4m" else ".mp4"
                job.part_ext = part_ext
                info = probe.probe(job.input_path, backend=io_backend)
                fps = info.fps or Fraction(30, 1)
                st = JobState(
                    input_path=os.path.abspath(job.input_path),
                    output_path=os.path.abspath(job.output_path),
                    scale=job.scale,
                    segment_size=self.cfg.segment_size,
                    frame_count=info.frame_count,
                    fps_num=fps.numerator, fps_den=fps.denominator,
                    width=info.width, height=info.height,
                    pending=plan_segments(info.frame_count,
                                          self.cfg.segment_size),
                    encode={"crf": self.cfg.crf, "preset": self.cfg.preset},
                    model=job.model,
                    opts={"dtype": job.dtype, "int8_calib": job.int8_calib,
                          "tta": job.tta, "io_backend": io_backend},
                )
                ws.create()
            ws.save(st)
            if job.dtype == "auto":
                # resolve auto -> certified int8 turbo or bf16 (the same
                # policy + measurement as the CLI's --dtype auto); the
                # RESOLVED dtype is persisted so a resubmit/resume runs
                # the same path as the committed segments
                # live visibility while the (possibly minutes-long)
                # certification runs: the pre-note shows in the job's
                # dtype_note until the final notes replace it
                dtype, _, db, notes = scheduler.resolve_auto_dtype(
                    lambda d, c: self._get_engine(job.model, job.scale,
                                                  d, c, job.tta),
                    ws, st, io_backend=io_backend,
                    on_note=lambda m: setattr(job, "dtype_note", m))
                job.dtype = dtype
                job.dtype_note = "; ".join(notes)
                if db is not None and dtype == "int8":
                    # int8_psnr means "ran the turbo, certified N dB"
                    # (Job docstring); a bf16 fallback's measured dB lives
                    # in dtype_note, not in a turbo certificate field
                    job.int8_psnr = round(db, 2)
                st.opts["dtype"] = dtype
                ws.save(st)
            engine = self._get_engine(job.model, job.scale, job.dtype,
                                      job.int8_calib, job.tta)
            # compile-lottery mitigation for fresh resolutions: best-of-2
            # compiles on TPU when this job is long enough to amortize it
            # (already-compiled resolutions in a cached engine are reused
            # as-is).  getattr-guarded: test/plugin engine factories may
            # return stubs without the attribute.
            if "REVE_TPU_COMPILE_ATTEMPTS" not in os.environ and \
                    hasattr(engine, "compile_attempts"):
                from reve_tpu.pipeline.engine import auto_compile_attempts

                dev = getattr(engine, "device", None)
                platform = dev.platform if dev is not None else "cpu"
                engine.compile_attempts = auto_compile_attempts(
                    platform, sum(s.size for s in st.pending))
            if job.dtype == "int8" and job.int8_psnr is None:
                # report the quantization cost on THIS video (the same helper
                # the CLI's --dtype int8 report/gate uses; measures with the
                # job's persisted scales, so a resumed job re-certifies
                # identically).  auto-resolved jobs measured it already.
                # Runs BEFORE PipelineJob: certification calibrates as a
                # side effect, so the job's sampled-calibration pass reuses
                # it instead of decoding + uploading the same frames twice.
                try:
                    db = scheduler.certify_int8_on_input(
                        engine, ws, st, io_backend=io_backend)
                    if db is not None:
                        job.int8_psnr = round(db, 2)
                    ws.save(st)  # persist the sampled calib_frames indices
                except Exception:
                    pass  # certification must never fail the job
            job.progress = ProgressTracker(
                total_frames=sum(s.size for s in st.pending),
                total_segments=len(st.pending),
                source_fps=st.fps_num / max(st.fps_den, 1),
            )
            pipeline = scheduler.PipelineJob(
                st, ws, engine, io_backend=io_backend,
                part_ext=part_ext, progress=job.progress,
            )
            job.pipeline = pipeline
            if job.cancel_requested:  # cancelled during probe/compile window
                pipeline.cancel()
            final = pipeline.run()
            report = scheduler.finalize(
                final, ws, io_backend=io_backend, part_ext=part_ext
            )
            if pipeline.encoder_desc:
                report["encoder"] = pipeline.encoder_desc
            ws.destroy()
            return report
        finally:
            ws.release_owner()
