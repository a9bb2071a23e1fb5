"""TPU inference engine: the in-process replacement for the reference's
`realesrgan-ncnn-vulkan` subprocess (reve-shared/src/lib.rs:129-155).

Design (TPU-first):
  * ONE jitted function per (resolution, batch) doing uint8 -> uint8:
    u8 RGB -> f32 [0,1] -> (tiled) SRVGG forward -> clip -> round -> u8 RGB.
    Keeping quantization on device means host<->device transfers move 3
    bytes/pixel each way and XLA fuses the conversions into the conv graph.
  * Static shapes everywhere: fixed batch size (last batch padded), fixed
    tile geometry per resolution — one compilation, reused for the whole
    video.
  * Async dispatch double-buffering: `submit` returns immediately after
    enqueueing the device work; the caller later blocks on `.result()`.
    With >= 2 batches in flight, H2D copy, MXU compute, and D2H copy of
    consecutive batches overlap — the TPU never waits on the host, which is
    the property the reference's 3-stage pipeline establishes for its GPU
    (SURVEY.md §3.3: 'GPU throughput sets the pace').
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from reve_tpu.models import registry, srvgg
from reve_tpu.ops import tiling

log = logging.getLogger(__name__)

#: HBM budget for whole-frame inference. Measured: whole-frame beats halo
#: tiling decisively whenever a frame fits (720p: +40%, PERF.md sweep;
#: 4K: 2.5x, PERF.md round-3 "4K story"), so the engine runs whole-frame
#: with a lax.map chunk over the batch when the full batch would not fit,
#: and only tiles when a SINGLE frame exceeds the budget (8K+) or the
#: user forces --tile.  Constants calibrated against measured configs on
#: a 16 GB v5e: bf16 1080p b8 fits / b12 does not; int8 1080p b16 fits /
#: b24 does not; bf16+int8 4K b2 fit / b4 does not.
_HBM_BUDGET_BYTES = 13 << 30
#: in-flight batch IO sets (u8 inputs + u8 outputs) the whole-frame plan
#: reserves HBM for, so the pipeline can hold completed batches while the
#: encoder drains and still dispatch the next one.  Measured round 5 on a
#: real v5e (flagship 1080p x4 int8 b16): the UNCHUNKED graph + even ONE
#: extra IO set is RESOURCE_EXHAUSTED, while the 8-frame-chunked graph
#: runs with 3-4 sets alive — so the plan chunks until >= this many sets
#: fit, and recommended_queue_depth() hands the scheduler the depth the
#: leftover headroom affords.  Big frames (> _BIG_FRAME_PIXELS) reserve 1
#: set: their chunked working set dominates and their device rate keeps
#: the queue shallow.
_PLAN_INFLIGHT_SETS = 2
_ACT_BUFFERS = 3
#: int8 hidden activations are 1 byte (2 live buffers) and the bf16
#: first-conv transient amortizes — 3 bytes/elem reproduces the measured
#: fit boundary (16 frames of 1080p fit, 24 do not)
_INT8_BYTES_PER_ELEM = 3
#: measured at 4K: tile 512 compiles + runs chunked; 768/1024 windows
#: crash this stack's compiler at any chunking (PERF.md round 3)
_DEFAULT_TILE = 512
#: windows per model call on the tiled path: the all-windows-in-one-batch
#: graph crashes the compiler at 4K (80 windows); 8 per call compiles
_TILE_CHUNK = 8
#: frames above this area use the epi-double-counted whole-frame gate
#: (between 1080p's 2.1 MP — measured to follow the single-count model —
#: and 4K's 8.3 MP, which does not; see _plan_execution)
_BIG_FRAME_PIXELS = 4 << 20
#: compile-lottery probe: stop timing a candidate binary once this much
#: wall time has accumulated — a catastrophically slow binary (10-500x,
#: PERF.md "environment pathologies") is evident long before 2 full calls
_LOTTERY_PROBE_CAP_S = 20.0
#: auto policy: a second fresh compile (~30 s on this stack) is cheap
#: insurance for jobs past a few hundred frames — dodging one bad binary
#: saves minutes-to-hours; below this, eat the lottery risk
_AUTO_LOTTERY_MIN_FRAMES = 200


def auto_compile_attempts(platform: str, total_frames: int) -> int:
    """Default compile_attempts for a job: best-of-2 fresh compiles on TPU
    when the job is long enough to amortize the extra compile.

    This stack's compiler non-deterministically emits binaries 10-500x
    slower than normal for the SAME HLO (the "compile lottery", PERF.md
    "environment pathologies" — observed live: flagship attempt 0 at
    0.1-1.2 fps vs 31-51 fps on the fresh-compile retry).  bench.py has
    always dodged it with best-of-N fresh compiles; the production engine
    applies the same mitigation via UpscaleEngine(compile_attempts=...)
    so a long video job cannot get stuck running a bad binary end to end.
    """
    if platform == "tpu" and total_frames >= _AUTO_LOTTERY_MIN_FRAMES:
        return 2
    return 1


def parse_int8_calib(int8_calib: str):
    """Validate an int8_calib spec ("max" or "p<percentile>", percentile
    in (0, 100]) and return the percentile as a float, or None for "max".
    Raises ValueError on anything else — shared by the engine constructor
    and the service's submit-time validation (service/jobs.py) so invalid
    specs are refused at the API instead of exploding in the worker."""
    if int8_calib == "max":
        return None
    if not int8_calib.startswith("p"):
        raise ValueError(
            f"int8_calib must be 'max' or 'p<percentile>', "
            f"got {int8_calib!r}")
    try:
        pct = float(int8_calib[1:])
    except ValueError:
        raise ValueError(
            f"invalid int8_calib percentile {int8_calib!r}")
    if not 0.0 < pct <= 100.0:
        raise ValueError(
            f"int8_calib percentile out of range: {int8_calib!r}")
    return pct


@dataclasses.dataclass
class EngineStats:
    frames: int = 0
    batches: int = 0
    compile_count: int = 0
    #: times a fresh-compile reroll replaced a lottery-bad binary (>2x)
    lottery_rerolls: int = 0
    #: {(h, w): fps} — device-sustained rate of the binary the job actually
    #: runs, measured by the compile-lottery probe (checksum-synced, no
    #: host transfers in the timed region; populated when
    #: compile_attempts > 1).  This is the product's own on-device
    #: throughput evidence — e2e wall time on a tunneled host measures the
    #: tunnel, not the chip (PERF.md)
    device_fps: dict = dataclasses.field(default_factory=dict)


class PendingBatch:
    """Handle to an in-flight device computation (one or more pieces —
    several sub-batch calls when the whole batch exceeds the HBM budget,
    e.g. 4K; see UpscaleEngine._plan_execution)."""

    def __init__(self, device_out, valid: int):
        self._outs = device_out if isinstance(device_out, list) \
            else [device_out]
        self._valid = valid
        for o in self._outs:
            try:
                # start the device->host copy as soon as the compute
                # finishes, overlapping D2H of batch k with compute of k+1
                o.copy_to_host_async()
            except AttributeError:
                pass

    @property
    def _out(self):  # single-piece access (tests/back-compat)
        assert len(self._outs) == 1
        return self._outs[0]

    def result(self) -> np.ndarray:
        """Block until done; returns (valid, H*s, W*s, 3) uint8."""
        if len(self._outs) == 1:
            return np.asarray(self._outs[0])[: self._valid]
        return np.concatenate(
            [np.asarray(o) for o in self._outs], axis=0)[: self._valid]


#: the 8 dihedral transforms of the TTA self-ensemble, as (rot90
#: quarter-turns, horizontal flip) pairs applied to the (N, H, W, C)
#: spatial axes
_TTA_SPECS = tuple((k, f) for k in range(4) for f in (False, True))


def _tta_fwd(frames: np.ndarray, k: int, flip: bool) -> np.ndarray:
    t = np.rot90(frames, k, axes=(1, 2))
    if flip:
        t = t[:, :, ::-1]
    return np.ascontiguousarray(t)


def _tta_inv(out: np.ndarray, k: int, flip: bool) -> np.ndarray:
    if flip:
        out = out[:, :, ::-1]
    return np.rot90(out, -k, axes=(1, 2))


@functools.partial(jax.jit, static_argnames=("k", "flip"))
def _tta_acc_device(acc, y, k: int, flip: bool):
    """Inverse-transform one model output on DEVICE and add it to the
    running uint16 sum (8 u8 terms max 2040 — exact in u16 and half the
    HBM of an f32 accumulator).  Keeping the inverse + accumulate on
    device means TTA transfers ONE averaged output to the host instead of
    8 full-size intermediates — on this stack's ~20 MB/s host link that
    is the difference between ~8x and ~60x the single-pass wall time."""
    y = y.astype(jnp.uint16)
    if flip:
        y = y[:, :, ::-1]
    y = jnp.rot90(y, -k, axes=(1, 2))
    return y if acc is None else acc + y


@jax.jit
def _tta_mean_device(acc):
    """u16 sum of the 8 terms -> rounded u8 mean (round-half-up; the
    division by 8 is exact integer arithmetic, so the ensemble stays
    exactly dihedral-equivariant)."""
    return ((acc + 4) >> 3).astype(jnp.uint8)


class TTAPendingBatch:
    """Self-ensemble (TTA) batch: the surface of the replaced engine's
    `-x` switch (realesrgan-ncnn-vulkan runs the model on all 8 dihedral
    transforms of the input and averages; the reference never passes the
    flag, so this is engine-surface parity like single-image mode).

    The model runs once per dihedral transform (4 rotations x optional
    horizontal flip); outputs are inverse-transformed and summed on
    device in uint16 (exact), and the rounded mean is the single tensor
    copied to the host.  Because the dihedral group is closed under
    composition, the ensemble is EXACTLY equivariant: for any dihedral T,
    tta(T(x)) == T(tta(x)) bit-for-bit (the same 8 u8 arrays are summed
    either way) — tested in tests/test_tta.py.

    Dispatch is pipelined one transform ahead: the first transform is
    enqueued at submit time; `result()` enqueues each next transform
    before synchronizing on the previous accumulate (bounding device
    memory to ~2 transforms' outputs while keeping the device busy).
    `result()` is one-shot and enforces it.  Non-square frames compile a
    second (W, H) shape for the odd quarter-turns; `warmup` pre-compiles
    both when TTA is on.
    """

    def __init__(self, engine: "UpscaleEngine", frames: np.ndarray,
                 valid: int):
        self._engine = engine
        self._frames = frames
        self._valid = valid
        self._next = 1
        #: list of per-piece device outputs (pieces = HBM-plan sub-batch
        #: chunks; spatial transforms never cross the batch axis, so
        #: accumulation is piece-wise)
        self._inflight = engine._enqueue(
            _tta_fwd(frames, *_TTA_SPECS[0]))
        self._consumed = False

    def result(self) -> np.ndarray:
        """Block until done; returns (valid, H*s, W*s, 3) uint8."""
        if self._consumed:
            raise RuntimeError("TTAPendingBatch.result() is one-shot")
        self._consumed = True
        acc = None
        for k, flip in _TTA_SPECS:
            cur = self._inflight
            if self._next < len(_TTA_SPECS):
                self._inflight = self._engine._enqueue(
                    _tta_fwd(self._frames, *_TTA_SPECS[self._next]))
                self._next += 1
            if acc is None:
                acc = [_tta_acc_device(None, p, k, flip) for p in cur]
            else:
                acc = [_tta_acc_device(a, p, k, flip)
                       for a, p in zip(acc, cur)]
            # bound in-flight device memory to ~2 transforms' outputs:
            # the NEXT upscale is already enqueued (keeps the device
            # busy); waiting here lets the runtime release this
            # transform's output buffers before enqueueing another
            for a in acc:
                a.block_until_ready()
        self._inflight = None
        self._frames = None
        final = [_tta_mean_device(a) for a in acc]
        for f in final:
            try:
                f.copy_to_host_async()
            except AttributeError:
                pass
        out = np.concatenate([np.asarray(f) for f in final], axis=0) \
            if len(final) > 1 else np.asarray(final[0])
        return out[: self._valid]


class UpscaleEngine:
    """Batched, tiled, jit-compiled video upscaler."""

    def __init__(
        self,
        model: str = "realesr-animevideov3",
        scale: int = 2,
        weights: Optional[str] = None,
        batch_size: int = 4,
        tile: int = 0,            # 0 = auto, -1 = never tile
        compute_dtype: str = "bfloat16",
        int8_calib: str = "p99.9",
        tta: bool = False,
        device: Optional[jax.Device] = None,
        mesh=None,
        preloaded=None,
        compiler_options="auto",
        compile_attempts: Optional[int] = None,
        allow_random_init: Optional[bool] = None,
    ):
        """`mesh`: a jax.sharding.Mesh with a 'dp' axis to shard each batch
        of frames across devices (frames are independent — pure data
        parallelism, the idiomatic multi-chip strategy for this workload,
        SURVEY.md §2.3).  batch_size must be a multiple of the dp size.
        Without a mesh, runs on a single device.

        `compiler_options`: XLA options for the inference compiles.
        "auto" (default) = measured TPU defaults (+25% flagship fps from a
        raised scoped-VMEM budget, utils/compileopts.py; no-op off-TPU);
        None disables; a dict is passed through verbatim.  Env override:
        REVE_TPU_XLA_OPTIONS.

        `compile_attempts`: best-of-N fresh compiles per resolution to
        dodge the compile lottery (see auto_compile_attempts).  None =
        REVE_TPU_COMPILE_ATTEMPTS env var, else 1.  Callers that know the
        job length (cli/api) set this via auto_compile_attempts().

        `allow_random_init`: permit the deterministic random-init fallback
        when no weights resolve (tests/benchmarks).  None (default) defers
        to REVE_TPU_ALLOW_RANDOM_INIT; without either, missing weights
        raise registry.MissingWeightsError — the product never silently
        upscales with untrained weights."""
        if preloaded is not None:  # (cfg, params), e.g. dni-interpolated
            self.cfg, self.params = preloaded
        else:
            self.cfg, self.params = registry.load_model(
                model, scale, weights, allow_random_init=allow_random_init)
        self.scale = self.cfg.upscale
        self.batch_size = batch_size
        self.tile = tile
        #: int8 turbo mode: SRVGG hidden stack / RRDB trunk quantized
        #: (weights/quantize.py), first/last (head) convs + epilogue in
        #: bf16.  ~1.6x the bf16 conv rate on the MXU (PERF.md); costs
        #: PSNR — for SRVGG the product auto-selects it on TPU when
        #: on-content certification clears 50 dB
        #: (scheduler.resolve_auto_dtype); for RRDB it is opt-in
        #: (--dtype int8).  Activation scales come from calibrate_int8
        #: (pipeline: frames sampled across the whole video) or, lazily,
        #: the first real batch submitted.
        self._int8 = compute_dtype == "int8"
        self._qbody = None
        self._qbody_provisional = False
        self._act_maxima = None
        #: int8 calibration statistic: "p<value>" (|activation|
        #: percentile; the default p99.9 clips the outlier tail for a
        #: finer bulk grid — measured best on BOTH frontier seeds, +7/+1
        #: dB over max, fps-neutral; scripts/int8_frontier.py / PERF.md)
        #: or "max" (true maxima).
        #: Affects only how fresh calibrations are computed; persisted /
        #: injected scales (set_calibration) are used verbatim either way.
        self._calib_percentile = parse_int8_calib(int8_calib)
        self.int8_calib = int8_calib
        #: 8-transform dihedral self-ensemble (the replaced engine's `-x`
        #: TTA switch): ~8x the compute for a small quality gain; see
        #: TTAPendingBatch
        self.tta = bool(tta)
        #: optional arbitration hook for calibration determinism: called
        #: with this engine's freshly computed activation maxima, returns
        #: the AUTHORITATIVE maxima to use (e.g. Workspace.claim_calibration
        #: persists first-wins maxima so resumed runs and shard workers all
        #: quantize with identical scales).  Only consulted for real
        #: (non-provisional) calibrations.
        self.calibration_hook = None
        self.compute_dtype = jnp.bfloat16 if compute_dtype in (
            "bfloat16", "bf16", "int8"
        ) else jnp.float32
        self.mesh = mesh
        self._compiler_options = compiler_options
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"]
            if batch_size % dp:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by dp={dp}"
                )
            self._batch_sharding = NamedSharding(mesh, P("dp"))
            self.device = None
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, P())
            )
        else:
            self._batch_sharding = None
            # local_devices, not devices: under jax.distributed (multi-host
            # lease sharding) jax.devices()[0] is process 0's device, which
            # other processes cannot address — each worker runs on its own
            # local chip (proven by tests/test_distributed.py)
            self.device = device or jax.local_devices()[0]
            self.params = jax.device_put(self.params, self.device)
        if compile_attempts is None:
            compile_attempts = int(
                os.environ.get("REVE_TPU_COMPILE_ATTEMPTS", "1"))
        if compile_attempts < 1:
            raise ValueError(f"compile_attempts must be >= 1, "
                             f"got {compile_attempts}")
        #: best-of-N fresh compiles per resolution (compile-lottery
        #: mitigation); mutable — cli/api set it once the job length is
        #: known (auto_compile_attempts)
        self.compile_attempts = compile_attempts
        self.stats = EngineStats()
        self._compiled = {}

    # -- jitted core -------------------------------------------------------

    def _arch_apply(self, params, x, quantize_u8=False, s2d=True,
                    qbody=None, pre_shuffle=False, compute_dtype=None):
        from reve_tpu.models import rrdb

        dtype = compute_dtype or self.compute_dtype
        if isinstance(self.cfg, srvgg.SRVGGConfig):
            if qbody is not None:
                return srvgg.apply_int8(params, qbody, x, cfg=self.cfg,
                                        compute_dtype=dtype,
                                        quantize_u8=quantize_u8, s2d=s2d,
                                        pre_shuffle=pre_shuffle)
            return srvgg.apply(params, x, cfg=self.cfg,
                               compute_dtype=dtype,
                               quantize_u8=quantize_u8, s2d=s2d,
                               pre_shuffle=pre_shuffle)
        if qbody is not None:
            return rrdb.apply_int8(params, qbody, x, cfg=self.cfg,
                                   compute_dtype=dtype,
                                   quantize_u8=quantize_u8, s2d=s2d)
        y = rrdb.apply(params, x, cfg=self.cfg, compute_dtype=dtype,
                       s2d=s2d)
        if quantize_u8:
            y = jnp.clip(y * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        return y

    def _frame_bytes(self, h: int, w: int) -> int:
        """Rough peak HBM for ONE frame of un-tiled inference at (h, w)."""
        return self._act_bytes(h, w) + self._epi_bytes(h, w)

    def _out_bytes(self, h: int, w: int) -> int:
        """The u8 OUTPUT buffer per frame — alive beyond the graph (the
        pipeline holds completed batches while the encoder drains, and
        the lottery probe's next dispatch overlaps the previous output).
        Omitting it left zero headroom at the flagship boundary: 1080p
        int8 b16 single-shot measured 'fits' standalone in round 4, but
        the round-5 PRODUCT run (same graph + in-flight outputs + a
        second lottery binary) hit a real RESOURCE_EXHAUSTED; with this
        term the plan chunks that boundary instead."""
        return h * w * self.scale ** 2 * 3

    def _act_bytes(self, h: int, w: int) -> int:
        feat = getattr(self.cfg, "num_feat", 64)
        bpe = 2 if self.compute_dtype == jnp.bfloat16 else 4
        # int8 shrinks the live SRVGG hidden buffers to 1 byte.  RRDB's
        # int8 trunk keeps FLOAT32 feature copies alive across the dense
        # concats (rrdb.apply_int8: dequant -> lrelu -> residual chains
        # stay f32), so its trunk term is billed at the f32 bpe — larger
        # than the bf16 formula, never smaller (round-4 ADVICE #4; the
        # RRDB fit boundary itself was calibrated on bf16 runs where
        # _epi_bytes dominates, so the f32 trunk term only adds margin)
        if self._int8:
            per_elem = (_INT8_BYTES_PER_ELEM
                        if isinstance(self.cfg, srvgg.SRVGGConfig)
                        else 4 * _ACT_BUFFERS)
        else:
            per_elem = bpe * _ACT_BUFFERS
        return h * w * feat * per_elem

    def _epi_bytes(self, h: int, w: int) -> int:
        if self._has_pre_shuffle:
            # SRVGG: f32 epilogue at input res x out_ch*scale^2 channels
            out_ch = getattr(self.cfg, "num_out_ch", 3)
            return h * w * out_ch * self.scale ** 2 * 4
        # RRDB upsamples INSIDE apply (interpolate -> conv at 2x then s):
        # its peak holds ~3.5 output-resolution num_feat-channel buffers
        # (compute dtype).  Calibrated on the measured x4 bf16 whole-frame
        # boundary (scripts/perf_rrdb_fit.py, 16 GB v5e): total input
        # pixels <= 1.84 MP compile+run (720p b2, 480x640 b4), >= 2.07 MP
        # fail (1080p b1/b2, 720p b4, 480x640 b8); 3.5 puts every plan —
        # whole-frame gates, chunk sizes, tiled window batches — at or
        # under the measured-fit 1.84 MP.
        feat = getattr(self.cfg, "num_feat", 64)
        bpe = 2 if self.compute_dtype == jnp.bfloat16 else 4
        return h * w * self.scale ** 2 * feat * bpe * 7 // 2

    def _per_device_batch(self) -> int:
        if self.mesh is not None:
            return max(1, self.batch_size // self.mesh.shape["dp"])
        return self.batch_size

    def _plan_execution(self, h: int, w: int):
        """Measurement-derived execution plan (PERF.md round-3 "4K story"):
        whole-frame whenever a single frame fits the HBM budget, chunking
        the batch via lax.map when the FULL batch does not (4K: whole-frame
        beats tiling 2.5x); halo tiling only for user-forced --tile or
        frames too large for the budget alone (8K+), with windows chunked
        (the one-giant-batch tiled graph crashes this stack's compiler).

        Returns (tile, wf_chunk, tile_chunk): tile == 0 -> whole-frame,
        wf_chunk = frames per model call (0 = full batch at once);
        tile_chunk = windows per model call on the tiled path."""
        batch = self._per_device_batch()
        if self.tile > 0 or (self.tile == 0
                             and self._frame_bytes(h, w)
                             > _HBM_BUDGET_BYTES):
            tile = self.tile if self.tile > 0 else _DEFAULT_TILE
            halo = self.halo
            wh = min(h, tile + 2 * halo)
            ww = min(w, tile + 2 * halo)
            per_win = max(1, self._frame_bytes(wh, ww))
            tile_chunk = max(1, min(_TILE_CHUNK,
                                    _HBM_BUDGET_BYTES // per_win))
            return tile, 0, tile_chunk
        # whole-frame; HBM accounting is PER DEVICE (`batch` above is the
        # per-device share on a dp mesh).  The plan sizes the chunk so the
        # chunked working set PLUS an in-flight IO reserve fit: the
        # pipeline dispatches asynchronously with bounded queues, so
        # batches of device buffers (u8 inputs + outputs) stay allocated
        # on top of the executing dispatch while the encoder drains.
        # Measured round 5 (real v5e, flagship 1080p x4 int8 b16): the
        # unchunked graph + ONE extra IO set is RESOURCE_EXHAUSTED; the
        # 8-frame chunk + 3-4 sets runs, and its piece graph benches at
        # 88% of the unchunked rate (raw-b8 75.2 vs raw-b16 85.6 fps on
        # the depth-8 student) — chunking is the cheap side of the trade.
        big = h * w > _BIG_FRAME_PIXELS
        io_batch = batch * (h * w * 3 + self._out_bytes(h, w))
        if self._has_pre_shuffle:
            per_frame = self._frame_bytes(h, w) + self._out_bytes(h, w)
            if big:
                # 4K-class frames pay an extra epilogue-res scratch
                # (measured: int8 4K b4 at 12.7 GB single-count "fits"
                # was RESOURCE_EXHAUSTED while 1080p int8 b16 — the
                # identical total bytes — runs; epi-double-counting
                # matches all four measured fit boundaries)
                per_frame += self._epi_bytes(h, w)
            reserve = (1 if big else _PLAN_INFLIGHT_SETS) * io_batch
        else:
            # RRDB chunks as-is (no pre-shuffle scratch): peak is
            # chunk x the calibrated per-frame bytes, single-counted.
            # No _out_bytes/in-flight terms: RRDB's epi formula (3.5
            # output-res feat buffers) already over-covers the u8 output
            # ~75x, its ~2 fps device rate keeps the pipeline from ever
            # stacking batches, and the extra terms would push the
            # MEASURED 720p-b2 whole-frame fit (scripts/perf_rrdb_fit.py)
            # out of plan
            per_frame = self._frame_bytes(h, w)
            reserve = 0
        fits = int(min(max(1, (_HBM_BUDGET_BYTES - reserve) // per_frame),
                       batch))
        if fits >= batch:
            return 0, 0, 0
        # chunk choice: first minimize dispatch count, then padded waste
        # (a non-divisor chunk repeat-pads the tail INSIDE the same
        # compiled piece graph — no extra compile, but wasted compute:
        # wf=5 on b16 burns 20 padded frames per 16 useful; wf=4 burns 0)
        dispatches = -(-batch // fits)
        chunk = -(-batch // dispatches)
        if self.mesh is None:
            return 0, chunk, 0
        # dp mesh: submit() slices the GLOBAL batch into wf_chunk
        # pieces; each piece keeps the P('dp') sharding iff its
        # length is a dp multiple, so the chunk is the per-device
        # fit x dp (every device runs `chunk` frames per call)
        return 0, chunk * self.mesh.shape["dp"], 0

    def recommended_queue_depth(self, h: int, w: int) -> int:
        """Device-queue depth (completed batches the scheduler may hold
        beyond the executing dispatch) the HBM plan's leftover headroom
        affords at this resolution.  PipelineJob sizes its encode queue
        with this so backpressure engages BEFORE the allocator runs out:
        queue depth + the executing dispatch must keep
        working_set + sets * io_bytes inside the budget (the round-5
        flagship OOM was exactly this product, unbounded)."""
        tile, wf, tile_chunk = self._plan_execution(h, w)
        batch = self._per_device_batch()
        io_batch = batch * (h * w * 3 + self._out_bytes(h, w))
        if tile:
            wh = min(h, tile + 2 * self.halo)
            ww = min(w, tile + 2 * self.halo)
            ws = self._frame_bytes(wh, ww) * max(tile_chunk, 1)
        else:
            per_frame = self._frame_bytes(h, w) + self._out_bytes(h, w)
            if not self._has_pre_shuffle:
                per_frame = self._frame_bytes(h, w)
            elif h * w > _BIG_FRAME_PIXELS:
                per_frame += self._epi_bytes(h, w)
            per_dev_chunk = max(1, wf // (self.mesh.shape["dp"]
                                          if self.mesh is not None else 1))
            ws = per_frame * (per_dev_chunk if wf else batch)
        headroom = (_HBM_BUDGET_BYTES - ws) // max(io_batch, 1)
        return int(min(3, max(1, headroom - 1)))

    @property
    def _has_pre_shuffle(self) -> bool:
        """SRVGG ends in a pixel-shuffle the chunked path can split out
        as its own jit; RRDB's apply upsamples internally (interpolate +
        conv) and already returns the full-resolution tensor."""
        return isinstance(self.cfg, srvgg.SRVGGConfig)

    @property
    def halo(self) -> int:
        """Tile halo radius.  SRVGG: exact receptive-field radius (1 px per
        3x3 conv).  RRDB: the true receptive field spans hundreds of pixels;
        24 px of context is visually seam-free (documented approximation)."""
        if isinstance(self.cfg, srvgg.SRVGGConfig):
            return self.cfg.num_conv + 2
        return 24

    def _build(self, h: int, w: int, attempt: int = 0):
        tile, wf_chunk, tile_chunk = self._plan_execution(h, w)

        def bust(x):
            # attempt > 0: force a DISTINCT HLO so the compile cache cannot
            # hand back attempt 0's binary (compile-lottery reroll).  The
            # shape-varying barrier constant contributes +0.0f — numerically
            # exact, so every attempt computes identical output bytes.
            if not attempt:
                return x
            z = jax.lax.optimization_barrier(
                jnp.zeros((attempt + 1,), jnp.float32))
            return x + z[0]

        def fn(params, qbody, u8):
            if tile:
                x = bust(u8.astype(jnp.float32) * (1.0 / 255.0))
                # s2d in tiles is bit-exact vs the s2d whole frame iff every
                # window row-origin is even (same global row parity -> same
                # reduction order): true when frame height, tile and halo
                # are all even (tiling._plan_axis clamps stay even then).
                # Otherwise fall back to the classic stack so seams remain
                # bit-exact among themselves.  (int8: the hidden convs are
                # exact integer math, so the same parity rule covers the
                # float first/last convs.)
                s2d_ok = h % 2 == 0 and tile % 2 == 0 and self.halo % 2 == 0
                y = tiling.upscale_tiled(
                    lambda t: self._arch_apply(params, t, s2d=s2d_ok,
                                               qbody=qbody),
                    x, scale=self.scale, tile=tile, halo=self.halo,
                    chunk=tile_chunk,
                )
                y = jnp.clip(y * 255.0 + 0.5, 0.0, 255.0)
                return y.astype(jnp.uint8)

            # whole-frame.  When the full batch exceeds HBM (wf_chunk > 0,
            # e.g. 4K, or the flagship with its in-flight IO reserve),
            # this fn is compiled for wf_chunk-frame sub-batches and
            # submit() dispatches it several times per batch — measured
            # 2.5x faster than tiling at 4K (PERF.md round 3).
            x = bust(u8.astype(jnp.float32) * (1.0 / 255.0))
            # quantize before the pixel-shuffle inside the model epilogue
            # (exact; 4x less HBM traffic at output res).  Chunked
            # BIG frames (4K-class): emit the PRE-shuffle u8 tensor and
            # run the depth-to-space as a separate small jit (submit) —
            # the in-graph d2s transpose at this size crashes / degrades
            # the compiler (PERF.md round-3 "4K story").  Chunked SMALL
            # frames (1080p-class, chunked only for the in-flight IO
            # reserve) keep the shuffle IN-graph: the split-out shuffle
            # measured ~40 fps vs 75.2 in-graph on the same 8-frame piece
            # (round 5, depth-8 student).  Only SRVGG has a pixel-shuffle
            # epilogue to split out; RRDB upsamples via interpolate+conv
            # inside apply and chunks as-is.
            return self._arch_apply(params, x, quantize_u8=True,
                                    qbody=qbody,
                                    pre_shuffle=bool(wf_chunk)
                                    and self._has_pre_shuffle
                                    and h * w > _BIG_FRAME_PIXELS)

        opts = self._compiler_options
        if opts == "auto":
            from reve_tpu.utils import compileopts

            if isinstance(self.cfg, srvgg.SRVGGConfig):
                backend = (self.mesh.devices.flat[0].platform if self.mesh
                           is not None else self.device.platform)
                opts = compileopts.default_compiler_options(backend)
            else:
                # RRDB-scale graphs (350+ convs): with the raised
                # scoped-VMEM budget a whole-model compile ran past 25 min
                # without finishing (control without options: 130 s, same
                # 1.82 fps as before) — no measured defaults here, but an
                # explicit REVE_TPU_XLA_OPTIONS override still applies
                opts = compileopts.env_compiler_options()
        jitted = jax.jit(fn, compiler_options=opts or None)
        shuffle = None
        if wf_chunk and self._has_pre_shuffle \
                and h * w > _BIG_FRAME_PIXELS:
            from reve_tpu.ops.pixel_shuffle import pixel_shuffle_rowphase

            # the d2s for the pre-shuffle output, as its own tiny jit
            # (row-phase formulation: the classic transpose at 4K-class
            # shapes crashes this stack's compiler even standalone)
            shuffle = jax.jit(
                lambda y: pixel_shuffle_rowphase(y, self.scale))
        self.stats.compile_count += 1
        return jitted, wf_chunk, shuffle

    def release_measurement_caches(self) -> None:
        """Drop certification/calibration jit executables: device program
        memory + cached buffers.  The auto-resolve trial engine is reused
        as the production engine, and at flagship batch (16x1080p int8
        whole-frame) the production graph needs ~the whole HBM — the
        measurement leftovers caused a real RESOURCE_EXHAUSTED during the
        round-5 hardware product run.  Scales (the installed qbody) are
        kept; a later re-certification simply recompiles."""
        self._certify_jitted = None
        from reve_tpu.weights import quantize

        for fn in (quantize.collect_act_maxima,
                   quantize.collect_act_maxima_rrdb):
            try:
                fn.clear_cache()
            except Exception:  # cache API is version-dependent; best-effort
                pass
        import gc

        gc.collect()

    def _get_compiled(self, h: int, w: int):
        """Returns (jitted_fn, wf_chunk, shuffle_fn); wf_chunk > 0 means
        the fn is compiled for wf_chunk-frame sub-batches (submit splits)
        and emits pre-shuffle u8 that `shuffle_fn` finishes."""
        key = (h, w)
        if key not in self._compiled:
            if not self._compiled:
                # first production compile: measurement-time executables
                # must not share the HBM with the production program
                self.release_measurement_caches()
            built = self._build(h, w)
            if self.compile_attempts > 1:
                built = self._best_of_compiles(built, h, w)
            self._compiled[key] = built
        return self._compiled[key]

    def _probe_fps(self, fn, wf_chunk: int, h: int, w: int) -> float:
        """Steady-state fps of a compiled fn on dummy frames.  Syncs via an
        on-device scalar reduction (block_until_ready alone does not
        reliably observe completion on this stack — CLAUDE.md); stops early
        once a binary is evidently lottery-bad."""
        call_batch = wf_chunk or self.batch_size
        dummy = np.zeros((call_batch, h, w, 3), np.uint8)
        # int8 engines need a quantized body pytree to call fn at all; a
        # provisional calibration is replaced by the first real batch
        self._maybe_calibrate(dummy, provisional=True)
        x = self._place(jnp.asarray(dummy))
        # first call pays the compile; not timed
        float(jnp.sum(fn(self.params, self._qbody, x), dtype=jnp.int32))
        # catastrophic-binary check: one fully-synced call under the cap
        # timer.  Never BIND the output: the on-device sum consumes it
        # and the ~100 MB/frame u8 buffer frees immediately — a probe
        # holding an extra full-batch output next to two candidate
        # binaries contributed to the round-5 flagship RESOURCE_EXHAUSTED
        t0 = time.perf_counter()
        float(jnp.sum(fn(self.params, self._qbody, x), dtype=jnp.int32))
        synced = call_batch / max(time.perf_counter() - t0, 1e-9)
        if not wf_chunk or time.perf_counter() - t0 > _LOTTERY_PROBE_CAP_S:
            # unchunked plans fill the budget with ONE dispatch's working
            # set — per-call sync keeps at most one output alive.  (The
            # sync round-trip is amortized over the full batch there.)
            return synced
        # chunked plans: the production pipeline enqueues pieces
        # back-to-back with NO device ops between them (PendingBatch
        # consumes outputs via async host copies), so measure a burst of
        # bare fn dispatches synced ONCE at the end.  Anything else
        # mis-measures on this stack: an eager sum per call added ~80 ms
        # of consumption overhead per piece (38.7 "probe fps" where the
        # same binary sustains ~74 — round-5 three-way experiment), and
        # block_until_ready does not reliably observe completion
        # (CLAUDE.md).  Dropping the previous output's ref each
        # iteration frees it right after its producing dispatch retires,
        # so ~2 piece outputs are alive at once — inside the plan's IO
        # reserve.
        burst = max(4, 2 * (self.batch_size // max(wf_chunk, 1)))
        t1 = time.perf_counter()
        y = None
        for _ in range(burst):
            y = fn(self.params, self._qbody, x)
        # consume a small contiguous window of the LAST output: in-order
        # execution means this sync covers the whole burst
        float(jnp.sum(y[:, :8, :128].astype(jnp.int32)))
        return call_batch * burst / max(time.perf_counter() - t1, 1e-9)

    def _best_of_compiles(self, built, h: int, w: int):
        """Compile-lottery mitigation: probe attempt 0's binary, reroll
        with cache-busted fresh compiles, keep the fastest.  Every attempt
        computes bit-identical output (the bust adds +0.0f), so the choice
        affects only throughput.  A failed reroll never breaks a working
        engine."""
        try:
            best_fps = self._probe_fps(built[0], built[1], h, w)
        except Exception as e:
            # a probe-time failure (e.g. transient HBM pressure) must not
            # kill the job: keep attempt 0 unprobed, skip the lottery
            log.warning("compile probe failed (%s); skipping the lottery "
                        "reroll for this resolution", str(e)[:200])
            return built
        log.info("compile attempt 0 (%dx%d): %.1f fps probe", h, w, best_fps)
        best = built
        for attempt in range(1, self.compile_attempts):
            try:
                cand = self._build(h, w, attempt=attempt)
                fps = self._probe_fps(cand[0], cand[1], h, w)
            except Exception as e:
                log.warning("compile attempt %d failed (%s); keeping the "
                            "best binary so far", attempt, str(e)[:200])
                continue
            log.info("compile attempt %d (%dx%d): %.1f fps probe",
                     attempt, h, w, fps)
            if fps > best_fps:
                if fps > 2.0 * best_fps:
                    self.stats.lottery_rerolls += 1
                    log.warning(
                        "compile lottery detected: attempt %d runs %.0fx "
                        "faster than attempt 0 (%.1f vs %.1f fps); using it",
                        attempt, fps / max(best_fps, 1e-9), fps, best_fps)
                best_fps, best = fps, cand
        self.stats.device_fps[(h, w)] = best_fps
        return best

    # -- public API --------------------------------------------------------

    def _place(self, frames):
        if self._batch_sharding is not None:
            return jax.device_put(frames, self._batch_sharding)
        return jax.device_put(frames, self.device)

    def _dp_pad(self, frames: np.ndarray):
        """Pad a calibration/certification batch to a multiple of the mesh
        dp size by repeating frames cyclically — `device_put` with a
        P('dp') sharding requires a dp-divisible leading dim, and the
        sampled whole-video batch (scheduler.CALIB_SAMPLE_FRAMES, or fewer
        on short clips) is not validated against dp the way batch_size is.
        Returns (padded, n_real); duplicates are excluded from PSNR
        (certify slices to n_real) and only repeat existing content in the
        activation statistics.  Deterministic in (n, dp)."""
        if self._batch_sharding is None:
            return frames, len(frames)
        dp = self.mesh.shape["dp"]
        n = len(frames)
        pad = (-n) % dp
        if pad == 0:
            return frames, n
        reps = frames[np.arange(n, n + pad) % n]
        return np.concatenate([frames, reps]), n

    @staticmethod
    def _calib_crop(frames: np.ndarray) -> np.ndarray:
        """Bound calibration/certification frames to <=720p windows (the
        f32 reference path's working set) — with the crop ANCHOR cycling
        center/corners per frame instead of always center: action living
        at frame edges (letterboxed bursts, HUDs, credits) must reach the
        activation statistics and the certification measurement too.
        Deterministic in the frame's position within the batch, so
        resumed/sharded runs measure identical crops."""
        n, h, w, _ = frames.shape
        ch, cw = min(h, 720), min(w, 1280)
        if (ch, cw) == (h, w):
            return frames
        anchors = ((1, 1), (0, 0), (0, 2), (2, 0), (2, 2))  # halves of 2
        out = np.empty((n, ch, cw, 3), frames.dtype)
        for i in range(n):
            ay, ax = anchors[i % len(anchors)]
            y0, x0 = (h - ch) * ay // 2, (w - cw) * ax // 2
            out[i] = frames[i, y0:y0 + ch, x0:x0 + cw]
        return out

    def calibrate_int8(self, frames: np.ndarray) -> None:
        """Calibrate the int8 quantization on `frames` ((n, H, W, 3) u8)
        — the pipeline passes frames SAMPLED evenly across the video
        (scheduler.ensure_int8_calibrated) so late scenes shape the
        activation scales too.  Goes through calibration_hook (first-wins
        workspace persistence) like lazy calibration; no recompile (the
        quantized pytree is a jit argument)."""
        if not self._int8:
            raise ValueError("calibrate_int8 requires an int8 engine")
        self._calibrate_int8(np.asarray(frames, np.uint8),
                             provisional=False)

    #: activation elements (h*w*feat) per calibration chunk: the unfused
    #: f32 calibration forward materializes per-layer activation buffers
    #: of n*h*w*feat*4 bytes, and the full 16-frame 720p-crop sample
    #: (~9.4e8 elements -> 3.8 GB/buffer, several live at once) OOM'd a
    #: 16 GB v5e on hardware (round 5) — which silently failed every
    #: on-hardware certification.  2e8 caps the chunk at ~0.8 GB/buffer.
    _CALIB_CHUNK_ELEMS = int(2e8)

    def _calibrate_int8(self, frames: np.ndarray, provisional: bool) -> None:
        """Build/refresh the quantized body from a calibration batch.

        The quantized pytree is a jit ARGUMENT (same shapes/dtypes every
        time), so re-calibration never recompiles.  A warmup on dummy
        frames produces a provisional calibration that the first real
        batch replaces.

        The sample is processed in frame CHUNKS with per-layer stats
        max-combined across chunks (see _CALIB_CHUNK_ELEMS): exact for
        max-calibration, and for percentile calibration the statistic is
        max-of-chunk-percentiles — deterministic in (frames, chunking),
        so every worker/resume still derives identical scales before the
        first-wins hook arbitrates.  The sample is padded (cyclic frame
        repeats, like _dp_pad) to a chunk multiple so EVERY chunk shares
        one compiled shape: this stack's remote per-compile latency
        dominates the resolution pre-pass."""
        from reve_tpu.weights import quantize

        frames, _ = self._dp_pad(self._calib_crop(frames))
        n, h, w, _c = frames.shape
        feat = getattr(self.cfg, "num_feat", 64)
        chunk = max(1, self._CALIB_CHUNK_ELEMS // max(h * w * feat, 1))
        if self._batch_sharding is not None:
            # a dp mesh already divides the batch across devices (and a
            # non-divisible chunk would break the sharded placement)
            chunk = n
        pad = (-n) % chunk
        if pad:
            # repeated frames only re-observe existing content — they can
            # never raise a max, and only (deterministically) re-weight
            # the last chunk's percentile
            frames = np.concatenate([frames, frames[np.arange(pad) % n]])
        maxima = None
        for i in range(0, len(frames), chunk):
            # ship u8, convert on device: host<->device links (this
            # image's relay especially) should carry 1 byte/px, not 4
            x = self._place(
                np.ascontiguousarray(frames[i:i + chunk], np.uint8))
            x = x.astype(jnp.float32) / 255.0
            m = np.asarray(quantize.collect_maxima(
                self.params, x, cfg=self.cfg, compute_dtype=jnp.float32,
                percentile=self._calib_percentile))
            maxima = m if maxima is None else np.maximum(maxima, m)
        if self.calibration_hook is not None and not provisional:
            maxima = np.asarray(self.calibration_hook(maxima), np.float32)
        self._install_qbody(maxima, provisional)

    def _install_qbody(self, maxima: np.ndarray, provisional: bool) -> None:
        from reve_tpu.weights import quantize

        # margin absorbs content hotter than the calibration batch
        qbody = quantize.build_qbody(self.params, self.cfg,
                                     np.asarray(maxima), margin=1.25)
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            qbody = jax.device_put(qbody, NamedSharding(self.mesh, P()))
        else:
            qbody = jax.device_put(qbody, self.device)
        self._qbody = qbody
        self._qbody_provisional = provisional
        self._act_maxima = np.asarray(maxima, np.float32)

    def get_calibration(self):
        """The activation maxima the current int8 quantization was built
        from, or None (not int8 / not yet calibrated / provisional)."""
        if not self._int8 or self._qbody_provisional:
            return None
        return self._act_maxima

    def set_calibration(self, maxima) -> None:
        """Quantize the hidden stack with EXTERNALLY provided activation
        maxima (e.g. persisted by a previous run): resumed jobs and shard
        workers inject the job's saved calibration so every segment of one
        output video is quantized with identical scales.  No recompile —
        the quantized pytree is a jit argument."""
        if not self._int8:
            raise ValueError("set_calibration requires an int8 engine")
        maxima = np.asarray(maxima, np.float32)
        if (self._act_maxima is not None and not self._qbody_provisional
                and np.array_equal(self._act_maxima, maxima)):
            return  # already quantized with exactly these scales
        self._install_qbody(maxima, provisional=False)

    def reset_calibration(self) -> None:
        """Drop any existing int8 calibration so the next real batch
        recalibrates — engines reused across jobs (service JobManager)
        must not carry a previous input's activation scales."""
        self._qbody = None
        self._qbody_provisional = False
        self._act_maxima = None

    def _maybe_calibrate(self, frames: np.ndarray, provisional: bool) -> None:
        if not self._int8:
            return
        if self._qbody is None or (self._qbody_provisional
                                   and not provisional):
            self._calibrate_int8(frames, provisional)

    def certify_int8(self, frames: np.ndarray, crop: bool = True,
                     chunk: "Optional[int]" = None) -> float:
        """PSNR (dB, 8-bit scale) of the int8 turbo path vs the f32 path
        on `frames` ((n, H, W, 3) uint8; by default cropped to <=720p
        windows with the same cycling anchors calibration uses — the
        measured crop-vs-full-frame delta is <0.2 dB at 1080p on trained
        proxies, PERF.md round 5 "certificate crop bound").  Calibrates
        first if needed — the measurement uses the exact scales the job
        will run with, so the number certifies THIS job's quantization on
        THIS content (BASELINE's 50 dB gate is defined vs the reference
        engine; f32-vs-int8 on the same weights isolates the quantization
        cost, scripts/compare_reference.py covers the reference side).

        `crop=False` measures on the FULL frames (the crop-delta probe,
        scripts/cert_crop_delta.py); `chunk` = frames per device dispatch
        so the measurement's f32 activations fit HBM — None (default)
        auto-derives from _CALIB_CHUNK_ELEMS (the same budget that kept
        calibration from OOMing a 16 GB v5e at 16x720p), an int
        overrides.  Ignored under a dp mesh, whose sharding already
        divides the batch.

        Both model passes run inside ONE jitted function (one compile per
        chunk shape): the previous eager form paid a remote per-op
        compile for every op of the 16-layer f32 stack on this image's
        compile-service stack — minutes of certification latency."""
        if not self._int8:
            raise ValueError("certify_int8 requires an int8 engine")
        self._maybe_calibrate(frames, provisional=False)
        measured = self._calib_crop(frames) if crop else \
            np.asarray(frames, np.uint8)
        padded, n_real = self._dp_pad(measured)
        if chunk is None:
            _n, ch, cw, _c = padded.shape
            feat = getattr(self.cfg, "num_feat", 64)
            chunk = max(1, self._CALIB_CHUNK_ELEMS // max(ch * cw * feat, 1))
        fn = self._certify_fn()
        if self._batch_sharding is not None or not chunk or \
                chunk >= n_real == len(padded):
            # single dispatch (dp-pad duplicates masked out by n_real)
            x = self._place(np.ascontiguousarray(padded, np.uint8))
            sse = float(fn(self.params, self._qbody, x,
                           jnp.int32(n_real)))
        else:
            # pad to a chunk multiple so every dispatch shares ONE
            # compiled shape (n_real is a traced scalar, so the masked
            # tail chunk reuses the same executable)
            pad = (-n_real) % chunk
            seq = measured if not pad else np.concatenate(
                [measured, measured[np.arange(pad) % n_real]])
            sse = 0.0
            for i in range(0, len(seq), chunk):
                x = self._place(
                    np.ascontiguousarray(seq[i:i + chunk], np.uint8))
                sse += float(fn(self.params, self._qbody, x,
                                jnp.int32(min(chunk, n_real - i))))
        cnt = n_real * (padded.shape[1] * self.scale) * \
            (padded.shape[2] * self.scale) * 3
        mse = max(sse / max(cnt, 1), 1e-12)
        return float(10.0 * np.log10(255.0 ** 2 / mse))

    def _certify_fn(self):
        """Cached jit of the int8-vs-f32 certification pass: both model
        applies + the masked squared-error reduction, ONE compile per
        chunk shape (the valid-frame count is a traced scalar)."""
        if getattr(self, "_certify_jitted", None) is None:
            def fn(params, qbody, x_u8, n_real):
                # u8 over the link; normalize on device
                x = x_u8.astype(jnp.float32) / 255.0
                y8 = self._arch_apply(params, x, quantize_u8=True,
                                      qbody=qbody)
                yf = self._arch_apply(params, x, quantize_u8=True,
                                      compute_dtype=jnp.float32)
                d = y8.astype(jnp.float32) - yf.astype(jnp.float32)
                mask = (jnp.arange(x.shape[0]) < n_real)
                return jnp.sum(jnp.square(d)
                               * mask.astype(jnp.float32)[:, None, None,
                                                          None])

            self._certify_jitted = jax.jit(fn)
        return self._certify_jitted

    def warmup(self, h: int, w: int) -> None:
        """Pre-compile for a resolution (first XLA compile is ~20-40 s).
        With TTA on, non-square frames also pre-compile the rotated
        (w, h) shape the odd quarter-turns dispatch."""
        shapes = [(h, w)]
        if self.tta and h != w:
            shapes.append((w, h))
        for hh, ww in shapes:
            fn, wf_chunk, shuffle = self._get_compiled(hh, ww)
            call_batch = wf_chunk or self.batch_size
            dummy = np.zeros((self.batch_size, hh, ww, 3), np.uint8)
            self._maybe_calibrate(dummy, provisional=True)
            out = fn(self.params, self._qbody,
                     self._place(jnp.asarray(dummy[:call_batch])))
            if shuffle is not None:
                out = shuffle(out)
            out.block_until_ready()

    def submit(self, frames: np.ndarray) -> PendingBatch:
        """Enqueue a batch; returns a handle. frames: (n<=batch, H, W, 3) u8.

        Short batches are padded to `batch_size` by repeating the last frame
        (keeps the compiled shape static); padding is cropped in result().
        When the resolution's plan chunks the batch (wf_chunk > 0, e.g.
        4K), the compiled fn covers wf_chunk frames and is dispatched
        ceil(batch/wf_chunk) times — all calls enqueue asynchronously, so
        the device pipelines them like one submission.
        """
        n, h, w, _ = frames.shape
        if n < self.batch_size:
            pad = np.repeat(frames[-1:], self.batch_size - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        elif n > self.batch_size:
            raise ValueError(f"batch {n} > batch_size {self.batch_size}")
        self._maybe_calibrate(frames, provisional=False)
        self.stats.frames += n
        self.stats.batches += 1
        if self.tta:
            return TTAPendingBatch(self, frames, n)
        return self._dispatch(frames, n)

    def _dispatch(self, frames: np.ndarray, valid: int) -> PendingBatch:
        """Enqueue one already-padded (batch_size, H, W, 3) u8 batch and
        start its D2H copies.  Calibration and stats are submit's job."""
        return PendingBatch(self._enqueue(frames), valid)

    def _enqueue(self, frames: np.ndarray) -> list:
        """Async-dispatch one already-padded batch; returns the raw
        per-piece device outputs WITHOUT starting host copies (TTA
        accumulates them on device and never moves intermediates)."""
        h, w = frames.shape[1:3]
        fn, wf_chunk, shuffle = self._get_compiled(h, w)
        if wf_chunk:
            outs = []
            for i in range(0, self.batch_size, wf_chunk):
                piece = frames[i:i + wf_chunk]
                if len(piece) < wf_chunk:  # ragged tail: repeat-pad
                    piece = np.concatenate(
                        [piece, np.repeat(piece[-1:],
                                          wf_chunk - len(piece), axis=0)])
                y = fn(self.params, self._qbody, self._place(piece))
                outs.append(shuffle(y) if shuffle is not None else y)
            return outs
        return [fn(self.params, self._qbody, self._place(frames))]

    def upscale_frames(self, frames: np.ndarray) -> np.ndarray:
        """Synchronous convenience: (N, H, W, 3) u8 -> (N, H*s, W*s, 3) u8."""
        outs = []
        pending = []
        for i in range(0, len(frames), self.batch_size):
            pending.append(self.submit(frames[i:i + self.batch_size]))
            # keep at most 2 batches in flight
            while len(pending) > 2:
                outs.append(pending.pop(0).result())
        for p in pending:
            outs.append(p.result())
        return np.concatenate(outs, axis=0)
