"""End-to-end pipeline tests over the hermetic y4m backend: overlap,
segment checkpointing, crash/resume, frame-exactness across segment
boundaries — the coverage SURVEY.md §4 says the rebuild must add."""

import dataclasses
import fractions

import numpy as np
import pytest

from reve_tpu.io import reader, writer
from reve_tpu.pipeline import planner, scheduler, state
from reve_tpu.pipeline.progress import ProgressTracker


class FakeEngine:
    """Engine stand-in: nearest-neighbor x2 'upscale' that preserves frame
    content, so tests can assert exact frame identity and ordering.
    Implements the engine surface the scheduler uses (submit/batch_size)."""

    def __init__(self, batch_size=3, fail_after_batches=None):
        self.batch_size = batch_size
        self.scale = 2
        self.submitted = 0
        self.fail_after_batches = fail_after_batches

    def submit(self, frames):
        self.submitted += 1
        if self.fail_after_batches is not None and \
                self.submitted > self.fail_after_batches:
            raise RuntimeError("injected engine fault")
        out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

        class _P:
            def result(self_inner):
                return out

        return _P()


def _luma_of(frame):
    return int(frame[frame.shape[0] // 2, frame.shape[1] // 2, 0])


def _make_input(tmp_path, num_frames=25, w=32, h=24):
    """y4m input whose frame i has solid gray level 20 + 8*i (exact under
    YUV420 because the frame is spatially constant)."""
    path = str(tmp_path / "input.y4m")
    with writer.Y4MWriter(path, w, h, fractions.Fraction(24)) as wr:
        for i in range(num_frames):
            wr.write(np.full((h, w, 3), 20 + 8 * i, np.uint8))
    return path


def _make_state(tmp_path, input_path, num_frames=25, seg=7, w=32, h=24):
    ws = state.Workspace(str(tmp_path / "work"))
    ws.create()
    st = state.JobState(
        input_path=input_path,
        output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=seg, frame_count=num_frames,
        fps_num=24, fps_den=1, width=w, height=h,
        pending=planner.plan_segments(num_frames, seg),
    )
    ws.save(st)
    return ws, st


def _read_lumas(path):
    rd = reader.Y4MReader(path)
    return [_luma_of(f) for f in rd.read_range(0, rd.frame_count())]


def test_end_to_end_y4m(tmp_path):
    inp = _make_input(tmp_path)
    ws, st = _make_state(tmp_path, inp)
    eng = FakeEngine(batch_size=3)
    job = scheduler.PipelineJob(st, ws, eng, io_backend="y4m",
                                part_ext=".y4m")
    final = job.run()
    assert final.pending == []
    assert ws.completed_parts(".y4m") == [0, 1, 2, 3]  # ceil(25/7)=4

    report = scheduler.finalize(final, ws, io_backend="y4m", part_ext=".y4m")
    # y4m parts stream-copy through the native core when it's built,
    # byte-exact; the Python rewrite path is the fallback
    assert report["backend"] in ("native", "y4m")

    lumas = _read_lumas(st.output_path)
    want = [20 + 8 * i for i in range(25)]
    assert len(lumas) == 25
    # exact sequence (within yuv420 roundtrip tolerance of +-2)
    for got, expect in zip(lumas, want):
        assert abs(got - expect) <= 2, (got, expect)

    snap = job.progress.snapshot()
    assert snap["decode"]["done"] == 25
    assert snap["upscale"]["done"] == 25
    assert snap["encode"]["done"] == 25
    assert snap["total"]["done"] == 4


def test_output_dimensions(tmp_path):
    inp = _make_input(tmp_path, num_frames=5)
    ws, st = _make_state(tmp_path, inp, num_frames=5, seg=5)
    job = scheduler.PipelineJob(st, ws, FakeEngine(), io_backend="y4m",
                                part_ext=".y4m")
    scheduler.finalize(job.run(), ws, io_backend="y4m", part_ext=".y4m")
    rd = reader.Y4MReader(st.output_path)
    assert (rd.width, rd.height) == (64, 48)


def test_crash_then_resume(tmp_path):
    """Kill the pipeline mid-job (injected engine fault), restart from saved
    state, verify the final output has every frame exactly once — the
    reference's flagship resumability scenario (BASELINE.json config #3)."""
    inp = _make_input(tmp_path)
    ws, st = _make_state(tmp_path, inp)

    # fault after 4 batches (12 frames) -> segment 0 (7 frames) committed,
    # segment 1 partially decoded
    bad = FakeEngine(batch_size=3, fail_after_batches=4)
    job = scheduler.PipelineJob(st, ws, bad, io_backend="y4m",
                                part_ext=".y4m")
    with pytest.raises(RuntimeError, match="injected"):
        job.run()
    assert 0 in ws.completed_parts(".y4m")
    assert ws.has_state()

    # resume: load + repair (exactly what the CLI resume path does)
    st2 = ws.load()
    st2 = state.repair_pending(st2, ws, ext=".y4m")
    done = set(ws.completed_parts(".y4m"))
    assert all(s.index not in done for s in st2.pending)

    job2 = scheduler.PipelineJob(st2, ws, FakeEngine(batch_size=3),
                                 io_backend="y4m", part_ext=".y4m")
    final = job2.run()
    assert final.pending == []
    scheduler.finalize(final, ws, io_backend="y4m", part_ext=".y4m")

    lumas = _read_lumas(str(tmp_path / "out.y4m"))
    want = [20 + 8 * i for i in range(25)]
    assert len(lumas) == 25
    for got, expect in zip(lumas, want):
        assert abs(got - expect) <= 2


def test_decode_failure_surfaces(tmp_path):
    inp = _make_input(tmp_path, num_frames=10)
    ws, st = _make_state(tmp_path, inp, num_frames=10, seg=5)
    # lie about the frame count: decode must notice the shortfall
    st = dataclasses.replace(
        st, frame_count=40, pending=planner.plan_segments(40, 5)
    )
    job = scheduler.PipelineJob(st, ws, FakeEngine(), io_backend="y4m",
                                part_ext=".y4m")
    with pytest.raises(Exception, match="expected 5 frames"):
        job.run()


def test_progress_rates_present(tmp_path):
    inp = _make_input(tmp_path, num_frames=6)
    ws, st = _make_state(tmp_path, inp, num_frames=6, seg=6)
    tracker = ProgressTracker(total_frames=6, total_segments=1)
    job = scheduler.PipelineJob(st, ws, FakeEngine(), io_backend="y4m",
                                part_ext=".y4m", progress=tracker)
    job.run()
    snap = tracker.snapshot()
    assert snap["encode"]["done"] == 6 and snap["encode"]["rate"] >= 0
    # no source_fps given -> no x_realtime claim
    assert "x_realtime" not in snap


def test_progress_x_realtime(tmp_path):
    """With a known source fps the snapshot reports the end-to-end
    x-realtime factor (encode rate / source fps — BASELINE.md's
    'end-to-end x realtime per segment: report' row), and the default
    PipelineJob tracker wires it from the job state's fps."""
    import time

    tracker = ProgressTracker(total_frames=6, total_segments=1,
                              source_fps=24.0)
    tracker.advance("encode", 6)
    time.sleep(0.05)  # let the elapsed time dominate the per-call skew
    snap = tracker.snapshot()
    assert snap["x_realtime"] == pytest.approx(
        snap["encode"]["rate"] / 24.0, rel=0.2)
    # nothing pending -> no eta claim; a part-done stage carries one
    assert "eta_s" not in snap["encode"]
    tracker.advance("decode", 3)
    snap = tracker.snapshot()
    assert snap["decode"]["eta_s"] > 0

    inp = _make_input(tmp_path, num_frames=6)
    ws, st = _make_state(tmp_path, inp, num_frames=6, seg=6)
    job = scheduler.PipelineJob(st, ws, FakeEngine(), io_backend="y4m",
                                part_ext=".y4m")
    assert job.progress.source_fps == st.fps_num / st.fps_den
    job.run()
    assert "x_realtime" in job.progress.snapshot()


def test_pipeline_stress_tiny_queues(tmp_path):
    """Race shakeout: minimal queue depths, many small segments, jittery
    stage timing — output must still be frame-exact (the synchronization
    audit the reference never had, SURVEY.md §5 'race detection')."""
    import random
    import time as time_mod

    class JitteryEngine:
        batch_size = 2
        scale = 2

        def submit(self, frames):
            out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)
            rng = random.Random(int(frames[0, 0, 0, 0]))

            class _P:
                def result(self_inner):
                    time_mod.sleep(rng.random() * 0.003)
                    return out

            return _P()

    num_frames = 120
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 16, fractions.Fraction(24)) as wr:
        for i in range(num_frames):
            wr.write(np.full((16, 32, 3), (i * 2 + 10) % 250, np.uint8))
    ws = state.Workspace(str(tmp_path / "work"))
    ws.create()
    st = state.JobState(
        input_path=inp, output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=3, frame_count=num_frames,
        fps_num=24, fps_den=1, width=32, height=16,
        pending=planner.plan_segments(num_frames, 3),  # 40 segments
    )
    job = scheduler.PipelineJob(
        st, ws, JitteryEngine(), io_backend="y4m", part_ext=".y4m",
        decode_queue_depth=1, device_queue_depth=1,
    )
    final = job.run()
    assert final.pending == []
    scheduler.finalize(final, ws, io_backend="y4m", part_ext=".y4m")
    lumas = _read_lumas(str(tmp_path / "out.y4m"))
    assert len(lumas) == num_frames
    for i, v in enumerate(lumas):
        assert abs(v - ((i * 2 + 10) % 250)) <= 2, (i, v)


def test_pipeline_cancel(tmp_path):
    """Cooperative cancel mid-run leaves resumable state."""
    import threading as threading_mod

    inp = _make_input(tmp_path, num_frames=200)
    ws, st = _make_state(tmp_path, inp, num_frames=200, seg=10)

    class SlowEngine(FakeEngine):
        def submit(self, frames):
            import time as t

            t.sleep(0.02)
            return super().submit(frames)

    job = scheduler.PipelineJob(st, ws, SlowEngine(batch_size=3),
                                io_backend="y4m", part_ext=".y4m")
    timer = threading_mod.Timer(0.4, job.cancel)
    timer.start()
    with pytest.raises(Exception, match="cancelled"):
        job.run()
    timer.cancel()
    # committed parts are intact and state is resumable
    done = ws.completed_parts(".y4m")
    st2 = state.repair_pending(ws.load(), ws, ext=".y4m")
    assert len(st2.pending) == 20 - len(done)


def _flock_holder(lock_path):
    """Spawn a process that flocks `lock_path` and sleeps — a live foreign
    owner for lock tests.  Returns the Popen after the lock is held."""
    import subprocess
    import sys

    code = (
        "import fcntl, os, sys, time\n"
        f"fd = os.open({lock_path!r}, os.O_CREAT | os.O_RDWR)\n"
        "fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)\n"
        "print('locked', flush=True)\n"
        "time.sleep(60)\n"
    )
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "locked"
    return p


def test_workspace_owner_lock(tmp_path):
    """Single-writer guard (kernel flock): a live holder refuses a second
    acquire from another process; a crashed owner's lock evaporates with
    its process (no staleness); re-acquiring through the same instance
    succeeds; release drops only a held lock."""
    import os

    from reve_tpu.pipeline.state import Workspace

    ws = Workspace(str(tmp_path / "w"))
    assert ws.acquire_owner()
    assert ws.acquire_owner()  # re-entrant for the same instance
    ws.release_owner()

    # a LIVE foreign flock holder refuses us
    os.makedirs(ws.root, exist_ok=True)
    child = _flock_holder(ws.owner_path)
    try:
        assert not ws.acquire_owner()
        ws.release_owner()  # not held by us: must be a no-op
        assert os.path.exists(ws.owner_path)
    finally:
        child.kill()
        child.wait()
    # the owner process is gone -> the kernel dropped its lock
    assert ws.acquire_owner()
    ws.release_owner()
    assert not os.path.exists(ws.owner_path)

    # a leftover lock FILE from a crashed owner is not a lock at all
    with open(ws.owner_path, "w") as f:
        f.write("stale")
    assert ws.acquire_owner()
    ws.release_owner()


def test_owner_lock_flock_unsupported_falls_back(tmp_path, monkeypatch):
    """Filesystems where flock raises ENOLCK/EOPNOTSUPP (network mounts
    without a lock manager) must DEGRADE to the O_EXCL pid-file lock, not
    crash and not report 'someone else owns this' forever."""
    import errno
    import fcntl
    import json
    import os
    import subprocess
    import sys

    from reve_tpu.pipeline.state import Workspace

    def no_flock(fd, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", no_flock)
    ws = Workspace(str(tmp_path / "w"))
    assert ws.acquire_owner()
    assert ws.acquire_owner()          # re-entrant for the same instance
    # a second contender sees a LIVE pid -> refused
    ws2 = Workspace(ws.root)
    assert not ws2.acquire_owner()
    ws.release_owner()
    assert ws2.acquire_owner()         # free again after release
    ws2.release_owner()

    # dead-pid steal: a crashed owner's pid file is taken over
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    with open(ws.owner_path, "w") as f:
        json.dump({"pid": child.pid}, f)
    assert ws.acquire_owner()
    ws.release_owner()

    # torn/unreadable pid file: stay safe (assume live)
    with open(ws.owner_path, "w") as f:
        f.write("not json")
    assert not ws.acquire_owner()
    os.unlink(ws.owner_path)


def test_claim_calibration_hardlinkless_fs(tmp_path, monkeypatch):
    """os.link raising a non-EEXIST OSError (hardlink-less mounts — FAT,
    some NFS/FUSE) must degrade to O_EXCL first-wins publication instead
    of crashing the job (VERDICT r3 weak #6)."""
    import errno
    import os

    from reve_tpu.pipeline.state import Workspace

    real_link = os.link

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(os, "link", no_link)
    ws = Workspace(str(tmp_path / "w"))
    ws.create()
    got = ws.claim_calibration([1.0, 2.0])
    assert got == [1.0, 2.0]
    assert ws.load_calibration() == [1.0, 2.0]
    # first-wins: a later claim defers to the published calibration
    assert ws.claim_calibration([9.0, 9.0]) == [1.0, 2.0]
    # and the flock-based path still wins over the fallback when mixed
    monkeypatch.setattr(os, "link", real_link)
    assert ws.claim_calibration([7.0, 7.0]) == [1.0, 2.0]


def test_cli_refuses_second_live_writer(tmp_path, capsys):
    """A second non-sharded CLI run on a workspace owned by a LIVE
    process exits 2 with a clear message instead of silently redoing
    (and racing) the first run's work; once the owner dies the next run
    proceeds."""
    import fractions
    import os

    from reve_tpu import cli
    from reve_tpu.io import writer as writer_mod
    from reve_tpu.io.reader import SyntheticReader
    from reve_tpu.pipeline.state import Workspace

    inp = str(tmp_path / "in.y4m")
    with writer_mod.Y4MWriter(inp, 24, 16, fractions.Fraction(24)) as wr:
        for i in range(4):
            wr.write(SyntheticReader.frame(i, 16, 24))
    out = str(tmp_path / "o.y4m")
    ws = Workspace(out + ".revework")
    os.makedirs(ws.root, exist_ok=True)
    child = _flock_holder(ws.owner_path)
    try:
        rc = cli.run(["-i", inp, "-s", "2", out, "--yes",
                      "--io-backend", "y4m"])
        assert rc == 2
        assert "another live process" in capsys.readouterr().err
    finally:
        child.kill()
        child.wait()
    # owner gone: the run proceeds and cleans up after itself
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes",
                  "--io-backend", "y4m", "--dtype", "float32"])
    assert rc == 0


def test_owner_pidfile_steal_single_winner_under_race(tmp_path, monkeypatch):
    """Round-4 review finding: two contenders that both observe a dead
    owner pid must not BOTH acquire (the read-unlink-create TOCTOU let
    one unlink the other's freshly created live lock).  The steal is now
    mkdir-serialized and re-verified inside the mutex; hammer it with
    racing threads and assert exactly one winner per round."""
    import concurrent.futures
    import errno
    import fcntl
    import json
    import os
    import subprocess
    import sys

    from reve_tpu.pipeline.state import Workspace

    def no_flock(fd, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", no_flock)
    root = str(tmp_path / "w")
    os.makedirs(root, exist_ok=True)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    for _ in range(5):
        contenders = [Workspace(root) for _ in range(8)]
        with open(contenders[0].owner_path, "w") as f:
            json.dump({"pid": dead.pid}, f)
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            got = list(ex.map(lambda w: w.acquire_owner(), contenders))
        assert sum(got) == 1, got
        for w in contenders:
            w.release_owner()


def test_owner_pidfile_steal_mutex_blocks_then_recovers(tmp_path,
                                                        monkeypatch):
    """A steal IN PROGRESS (live mutex dir) makes contenders stand down;
    a CRASHED stealer's mutex (stale mtime) is cleaned up so the lock
    does not wedge forever."""
    import errno
    import fcntl
    import json
    import os
    import subprocess
    import sys
    import time

    from reve_tpu.pipeline.state import Workspace

    def no_flock(fd, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", no_flock)
    ws = Workspace(str(tmp_path / "w"))
    os.makedirs(ws.root, exist_ok=True)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    with open(ws.owner_path, "w") as f:
        json.dump({"pid": dead.pid}, f)
    mutex = ws.owner_path + ".steal"
    os.mkdir(mutex)
    assert not ws.acquire_owner()      # live steal in progress: stay safe
    old = time.time() - 60.0
    os.utime(mutex, (old, old))        # crashed stealer: stale mutex
    assert ws.acquire_owner()
    ws.release_owner()


# -- pacing property: the TPU sets the pace (SURVEY.md §3.3) ----------------
#
# The reference's hot loop blocks its main thread on the GPU stage, so GPU
# throughput sets the pace (reve-cli/src/main.rs:262-273); the rebuild's
# claim is the same property through bounded queues.  These tests prove it
# QUANTITATIVELY with a synthetic serial device of known per-batch latency
# and throttled host stages (round-4 VERDICT #5): (a) end-to-end throughput
# ~= the slowest stage, (b) device idle ~= 0 when host stages are faster.

class PacedEngine:
    """Serial-device model: each submitted batch occupies the device for
    exactly `latency` seconds, back-to-back (like an async-dispatch XLA
    queue); result() blocks until that batch's completion time.  Device
    idle = span between first submit and last completion minus busy time —
    exactly the starvation the pipeline must avoid."""

    def __init__(self, batch_size, latency):
        import threading

        self.batch_size = batch_size
        self.scale = 2
        self.latency = latency
        self._free_at = None
        self.busy = 0.0
        self.first_submit = None
        self.last_done = None
        self._lock = threading.Lock()

    def submit(self, frames):
        import time

        now = time.monotonic()
        with self._lock:
            if self.first_submit is None:
                self.first_submit = now
            start = now if self._free_at is None else max(now, self._free_at)
            done_at = start + self.latency
            self._free_at = done_at
            self.busy += self.latency
            self.last_done = done_at
        out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

        class _P:
            def result(_s):
                import time as _t

                while _t.monotonic() < done_at:
                    _t.sleep(0.001)
                return out

        return _P()

    @property
    def idle_fraction(self):
        span = self.last_done - self.first_submit
        return max(0.0, span - self.busy) / span if span > 0 else 0.0


def _run_paced(tmp_path, monkeypatch, n_frames, batch, device_latency,
               decode_per_frame, encode_per_frame):
    """One pipeline run with a paced device + throttled host stages;
    returns (wall_seconds, engine)."""
    import time

    from reve_tpu.io import reader as reader_io
    from reve_tpu.io import writer as writer_io

    inp = _make_input(tmp_path, num_frames=n_frames)
    ws, st = _make_state(tmp_path, inp, num_frames=n_frames,
                         seg=n_frames // 2)
    orig_open_reader = reader_io.open_reader
    orig_open_writer = writer_io.open_writer

    class ThrottledReader:
        def __init__(self, inner):
            self.inner = inner

        def read_range(self, a, b):
            for f in self.inner.read_range(a, b):
                time.sleep(decode_per_frame)
                yield f

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self.inner.close()

        def close(self):
            self.inner.close()

    def slow_reader(path, **kw):
        return ThrottledReader(orig_open_reader(path, **kw))

    def slow_writer(path, *a, **kw):
        wr = orig_open_writer(path, *a, **kw)
        orig_write = wr.write

        def write(frame):
            time.sleep(encode_per_frame)
            orig_write(frame)

        wr.write = write
        return wr

    monkeypatch.setattr(scheduler.reader_mod, "open_reader", slow_reader)
    monkeypatch.setattr(scheduler.writer_mod, "open_writer", slow_writer)
    eng = PacedEngine(batch_size=batch, latency=device_latency)
    job = scheduler.PipelineJob(st, ws, eng, io_backend="y4m",
                                part_ext=".y4m")
    t0 = time.monotonic()
    final = job.run()
    wall = time.monotonic() - t0
    assert final.pending == []
    return wall, eng


def test_pacing_device_sets_the_pace(tmp_path, monkeypatch):
    """Host stages faster than the device: (a) e2e wall ~= device-only
    time, (b) device idle fraction ~= 0.  Tolerances: +50% wall slack and
    a 15% idle bound absorb sleep() granularity (~1-15 ms per wake on a
    loaded CI box) and the one-batch pipeline fill; an UNpipelined loop
    (decode+infer+encode serialized) would cost 2.1x device-only time
    here, far outside both bounds."""
    n, batch, lat = 48, 4, 0.05
    wall, eng = _run_paced(tmp_path, monkeypatch, n, batch,
                           device_latency=lat,
                           decode_per_frame=0.002,   # 0.008/batch << 0.05
                           encode_per_frame=0.002)
    device_only = (n // batch) * lat                  # 0.6 s
    serialized = device_only + n * (0.002 + 0.002)    # what no-overlap costs
    assert wall < min(device_only * 1.5, serialized), (wall, device_only)
    assert eng.idle_fraction < 0.15, eng.idle_fraction


def test_pacing_slowest_host_stage_sets_the_pace(tmp_path, monkeypatch):
    """Decode slower than the device: e2e wall ~= decode-only time (the
    device starves, visibly: idle fraction is LARGE) — the other half of
    'throughput ~= min(stage)'.  Bounds as above; the serialized
    alternative would cost decode+device = 1.25x decode-only."""
    n, batch = 48, 4
    decode_pf = 0.02                                  # 0.08/batch
    wall, eng = _run_paced(tmp_path, monkeypatch, n, batch,
                           device_latency=0.02,       # 0.02/batch << 0.08
                           decode_per_frame=decode_pf,
                           encode_per_frame=0.001)
    decode_only = n * decode_pf                       # 0.96 s
    assert decode_only * 0.95 <= wall < decode_only * 1.4, \
        (wall, decode_only)
    # the starvation is real and measured: the device waits on decode
    assert eng.idle_fraction > 0.5, eng.idle_fraction


# -- progress-aware encode drain (round-5 hardware finding) -----------------

def test_slow_but_progressing_encoder_finishes(tmp_path, monkeypatch):
    """A legitimately slow encoder (relay-walled writes, VP9 lookahead
    flush in close()) must be allowed to finish: the drain fails on a
    STALL, not on a total budget.  Here every write outlasts repeated
    15s-sliced joins scaled down: stall window 1.2 s, writes 0.4 s apart
    -> the job completes even though the drain takes > the stall window
    in total."""
    import time

    from reve_tpu.io import writer as writer_io

    inp = _make_input(tmp_path, num_frames=6)
    ws, st = _make_state(tmp_path, inp, num_frames=6, seg=6)
    orig_open_writer = writer_io.open_writer

    def slow_writer(path, *a, **kw):
        wr = orig_open_writer(path, *a, **kw)
        orig_write = wr.write

        def write(frame):
            time.sleep(0.4)
            orig_write(frame)

        wr.write = write
        return wr

    monkeypatch.setattr(scheduler.writer_mod, "open_writer", slow_writer)
    job = scheduler.PipelineJob(st, ws, FakeEngine(batch_size=2),
                                io_backend="y4m", part_ext=".y4m")
    job.ENCODE_STALL_S = 1.2
    final = job.run()
    assert final.pending == []
    assert ws.completed_parts(".y4m") == [0]


def test_hung_encoder_still_hard_fails(tmp_path, monkeypatch):
    """An encoder making NO progress past the stall window is an error —
    the invariant the fixed drain keeps from the old total-budget form
    (a truncated last segment must never finalize)."""
    import threading

    from reve_tpu.io import writer as writer_io

    inp = _make_input(tmp_path, num_frames=6)
    ws, st = _make_state(tmp_path, inp, num_frames=6, seg=6)
    orig_open_writer = writer_io.open_writer
    release = threading.Event()

    def hung_writer(path, *a, **kw):
        wr = orig_open_writer(path, *a, **kw)
        wr.write = lambda frame: release.wait()  # blocks forever
        return wr

    monkeypatch.setattr(scheduler.writer_mod, "open_writer", hung_writer)
    job = scheduler.PipelineJob(st, ws, FakeEngine(batch_size=2),
                                io_backend="y4m", part_ext=".y4m")
    job.ENCODE_STALL_S = 0.8
    with pytest.raises(scheduler.PipelineError,
                       match="no progress|stopping"):
        job.run()
    release.set()  # unblock the daemon thread for teardown
