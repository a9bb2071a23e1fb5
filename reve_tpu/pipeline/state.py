"""Resume state machine: segment-granularity checkpoint/restart.

This is the reference's flagship feature (SURVEY.md §5): it persists
`temp\\args.temp` (the CLI args) and `temp\\video.temp` (a pending-segment
queue consumed front-first, rewritten after every completed segment,
reve-cli/src/main.rs:112-121, 340-343), detects a prior run by the state
file existing (main.rs:43-45), and repairs the queue on restart
(main.rs:142-159): the segment *before* the first pending one is re-queued
because its encode may have died mid-write, and its possibly-torn part file
is deleted.

Differences from the reference (deliberate):
  * One JSON state file with an explicit schema version + atomic
    write-rename, instead of two bincode-ish blobs.
  * Part files are written to `<part>.tmp` and renamed on encoder close, so
    a completed `.mp4` part is always whole — the predecessor re-queue then
    only matters for crashes between "segment popped" and "state rewritten",
    which the same repair rule covers.
  * Cross-platform paths (the reference hardcodes `temp\\` backslashes).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import tempfile
from typing import List, Optional

from reve_tpu.pipeline.planner import Segment

STATE_VERSION = 1
STATE_FILE = "state.json"
PARTS_DIR = "parts"
CALIBRATION_FILE = "int8_calibration.json"
OWNER_FILE = "owner.lock"


@dataclasses.dataclass
class JobState:
    """Everything needed to resume an interrupted upscale job."""

    input_path: str
    output_path: str
    scale: int
    segment_size: int
    frame_count: int
    fps_num: int
    fps_den: int
    width: int
    height: int
    pending: List[Segment]
    #: the full segment plan (pending + completed).  Needed on resume when
    #: the plan is not derivable from (frame_count, segment_size) — e.g.
    #: scene-aligned boundaries.  None -> uniform plan (re-derived).
    plan: Optional[List[Segment]] = None
    encode: dict = dataclasses.field(default_factory=dict)
    model: str = "realesr-animevideov3"
    #: engine/io settings the job was started with (weights, dtype,
    #: io_backend, denoise...).  A resume restores these instead of
    #: trusting the new command line — the reference persists its whole
    #: Args for the same reason (reve-cli/src/main.rs:112-113).
    opts: dict = dataclasses.field(default_factory=dict)
    version: int = STATE_VERSION

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["pending"] = [s.to_json() for s in self.pending]
        d["plan"] = [s.to_json() for s in self.plan] if self.plan else None
        return d

    @staticmethod
    def from_json(d: dict) -> "JobState":
        if d.get("version") != STATE_VERSION:
            raise ValueError(f"unsupported state version {d.get('version')}")
        d = dict(d)
        d["pending"] = [Segment.from_json(s) for s in d["pending"]]
        if d.get("plan"):
            d["plan"] = [Segment.from_json(s) for s in d["plan"]]
        return JobState(**d)


class Workspace:
    """The temp workspace: state file + completed part files.

    Analog of the reference's `temp/` tree + `rebuild_temp`
    (reve-shared/src/lib.rs:291-312), minus the PNG frame dirs — frames
    never touch disk here.
    """

    def __init__(self, root: str):
        self.root = root
        self.parts_dir = os.path.join(root, PARTS_DIR)
        self.state_path = os.path.join(root, STATE_FILE)
        self._owner_fd: Optional[int] = None

    # -- lifecycle ---------------------------------------------------------

    def create(self, keep_parts: bool = False) -> None:
        """(Re)create the workspace; keep_parts=True preserves completed
        segment files for resume (lib.rs:301-311 semantics)."""
        os.makedirs(self.root, exist_ok=True)
        if not keep_parts and os.path.isdir(self.parts_dir):
            shutil.rmtree(self.parts_dir)
        if not keep_parts and os.path.exists(self.state_path):
            os.unlink(self.state_path)
        os.makedirs(self.parts_dir, exist_ok=True)

    def destroy(self) -> None:
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)

    # -- state persistence -------------------------------------------------

    def has_state(self) -> bool:
        """Resume detection: 'does the state file exist' (main.rs:43-45)."""
        return os.path.exists(self.state_path)

    def save(self, state: JobState) -> None:
        """Atomic write: the state file is never observable half-written."""
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".state.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state.to_json(), f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.state_path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def load(self) -> JobState:
        with open(self.state_path) as f:
            return JobState.from_json(json.load(f))

    # -- int8 calibration (first-wins, job-scoped) -------------------------

    # -- single-writer owner lock -------------------------------------------

    @property
    def owner_path(self) -> str:
        return os.path.join(self.root, OWNER_FILE)

    def acquire_owner(self) -> bool:
        """Single-writer advisory lock for NON-sharded runs: a second
        concurrent CLI/API/service run on the same workspace would redo
        every pending segment and race the finalize rename (the reference
        has the same hazard on its exe-relative `temp\\`; two instances
        there silently corrupt each other's state).  Multi-writer is the
        lease queue's job (--shard-worker), which skips this lock.

        Kernel `flock` on `owner.lock`: the lock dies with the holding
        process (a crashed owner needs no stealing, and there is no
        read-check-delete race between contenders).  The pid inside the
        file is diagnostic only.  Re-acquiring through the same Workspace
        instance succeeds; a second live process gets False.

        Filesystems where flock is UNSUPPORTED (ENOLCK/EOPNOTSUPP on some
        network mounts; no fcntl module off-POSIX) degrade to an O_EXCL
        pid file with dead-pid stealing (_acquire_owner_pidfile) instead
        of crashing — weaker (pid liveness is per-HOST, and an unclean
        kill leaves the file until the next contender steals it), which
        is fine because cross-host coordination is the lease queue's job,
        not this lock's (docs/ARCHITECTURE.md, "Shared-filesystem
        requirements")."""
        if self._owner_fd is not None:
            return True
        os.makedirs(self.root, exist_ok=True)
        try:
            import fcntl
        except ImportError:
            return self._acquire_owner_pidfile()
        while True:
            fd = os.open(self.owner_path, os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError as e:
                os.close(fd)
                import errno

                if e.errno in (errno.EACCES, errno.EAGAIN):
                    return False  # held by another live process
                # flock itself unsupported here (e.g. ENOLCK on an NFS
                # mount without a lock manager): degrade, don't crash
                return self._acquire_owner_pidfile()
            # the path may have been unlinked+recreated between our open
            # and the flock (a releasing owner): a lock on an orphaned
            # inode excludes nobody — verify we locked the live file
            try:
                live = os.stat(self.owner_path)
            except FileNotFoundError:
                os.close(fd)
                continue
            if os.fstat(fd).st_ino != live.st_ino:
                os.close(fd)
                continue
            os.ftruncate(fd, 0)
            os.write(fd, json.dumps({"pid": os.getpid()}).encode())
            self._owner_fd = fd
            return True

    def _acquire_owner_pidfile(self) -> bool:
        """Owner-lock fallback for filesystems without flock: O_EXCL
        create of a pid file; a contender steals it only when the
        recorded pid is verifiably dead ON THIS HOST.  One steal attempt
        per call (no unbounded loops against a hostile/flapping FS)."""
        for _ in range(2):
            try:
                fd = os.open(self.owner_path,
                             os.O_CREAT | os.O_EXCL | os.O_RDWR, 0o644)
            except FileExistsError:
                body = None
                try:
                    with open(self.owner_path) as f:
                        body = f.read()
                    pid = int(json.loads(body).get("pid", 0))
                except (OSError, ValueError):
                    # an EMPTY file is a flock-era artifact (O_CREAT
                    # before the failed flock) or a contender caught
                    # mid-create; recheck once — stably empty == stale.
                    # Torn NON-empty content: assume live, stay safe.
                    if body != "":
                        return False
                    try:
                        import time

                        time.sleep(0.05)
                        if os.path.getsize(self.owner_path) != 0:
                            return False
                        os.unlink(self.owner_path)
                    except OSError:
                        return False
                    continue
                if pid > 0:
                    try:
                        os.kill(pid, 0)
                        return False          # owner alive
                    except ProcessLookupError:
                        pass                  # owner dead: steal below
                    except OSError:
                        return False          # can't verify: stay safe
                try:
                    os.unlink(self.owner_path)
                except OSError:
                    return False
                continue  # retry the O_EXCL create once
            os.write(fd, json.dumps({"pid": os.getpid()}).encode())
            self._owner_fd = fd
            return True
        return False

    def release_owner(self) -> None:
        """Drop the owner lock iff this Workspace instance holds it."""
        fd, self._owner_fd = self._owner_fd, None
        if fd is None:
            return
        try:
            os.unlink(self.owner_path)
        except OSError:
            pass
        try:
            os.close(fd)  # drops the flock
        except OSError:
            pass

    @property
    def calibration_path(self) -> str:
        return os.path.join(self.root, CALIBRATION_FILE)

    def load_calibration(self):
        """The job's persisted int8 activation maxima, or None."""
        try:
            with open(self.calibration_path) as f:
                return json.load(f)["act_maxima"]
        except (OSError, KeyError, ValueError):
            return None

    def claim_calibration(self, maxima):
        """First-calibration-wins arbitration (engine.calibration_hook):
        atomically publish `maxima` as THE job's calibration; if another
        worker (or a pre-crash run) already published one, return that
        instead.  One output video must never mix segments quantized with
        different scales, and kill/resume must be reproducible.

        Atomicity: write a complete tmp file, then hardlink it into place
        — link() fails with EEXIST exactly once per race, and a reader can
        never observe a half-written file.  Filesystems WITHOUT hardlinks
        (some network/FUSE mounts — exactly where the multi-host lease
        scenario shares a workspace) raise a non-EEXIST OSError; those
        degrade to an O_EXCL create-and-write, which keeps first-wins but
        has a tiny torn-read window (a reader hitting it gets None and
        falls back to its own maxima — same as a torn pre-existing
        file)."""
        maxima = [float(v) for v in maxima]
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".calib.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"act_maxima": maxima}, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self.calibration_path)
                return maxima
            except FileExistsError:
                saved = self.load_calibration()
                # unreadable existing file (torn by something non-atomic?)
                # -> fall back to our own maxima rather than crash
                return saved if saved is not None else maxima
            except OSError:
                return self._claim_calibration_excl(maxima)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _claim_calibration_excl(self, maxima):
        """claim_calibration fallback for hardlink-less filesystems:
        O_EXCL-create the calibration file and write it directly (the
        create is the first-wins arbitration; the write is not atomic,
        so a write failure unlinks the file rather than leaving a torn
        claim other workers would defer to)."""
        try:
            fd = os.open(self.calibration_path,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            saved = self.load_calibration()
            return saved if saved is not None else maxima
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"act_maxima": maxima}, f)
                f.flush()
                os.fsync(f.fileno())
            return maxima
        except BaseException:
            try:
                os.unlink(self.calibration_path)
            except OSError:
                pass
            raise

    # -- part files --------------------------------------------------------

    def part_path(self, index: int, ext: str = ".mp4") -> str:
        return os.path.join(self.parts_dir, f"{index:06d}{ext}")

    def part_tmp_path(self, index: int, ext: str = ".mp4") -> str:
        # ".tmp" goes before the container extension: writers (cv2/ffmpeg)
        # infer the container format from the final extension.  The pid
        # makes the tmp PER-PROCESS: a stalled shard worker (SIGSTOP, long
        # GC) whose lease was stolen and that later resumes writing can
        # only tear its own tmp file, never the takeover worker's.
        return os.path.join(self.parts_dir,
                            f"{index:06d}.tmp{os.getpid()}{ext}")

    def commit_part(self, index: int, ext: str = ".mp4") -> None:
        """Rename <part>.tmp -> <part>: parts become visible atomically."""
        os.replace(self.part_tmp_path(index, ext), self.part_path(index, ext))

    def completed_parts(self, ext: str = ".mp4") -> List[int]:
        if not os.path.isdir(self.parts_dir):
            return []
        out = []
        for name in os.listdir(self.parts_dir):
            stem, file_ext = os.path.splitext(name)
            if file_ext == ext and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def clean_stale_tmp(self) -> int:
        """Delete *.tmp part files left by DEAD encoders only.

        Tmp names embed the writer's pid (part_tmp_path); a tmp whose
        owner is a different, still-alive process is another shard
        worker's in-flight part — unlinking it would make that worker's
        commit_part fail.  Own-pid tmps are always stale (an encoder from
        this process cannot be running when repair is called)."""
        n = 0
        if os.path.isdir(self.parts_dir):
            for name in os.listdir(self.parts_dir):
                i = name.find(".tmp")
                if i < 0:
                    continue
                pid_s = name[i + 4:].split(".", 1)[0]
                if pid_s.isdigit() and int(pid_s) != os.getpid():
                    try:
                        os.kill(int(pid_s), 0)
                    except ProcessLookupError:
                        pass            # owner dead: stale, delete
                    except PermissionError:
                        continue        # owner alive (other uid): keep
                    else:
                        continue        # owner alive: keep
                os.unlink(os.path.join(self.parts_dir, name))
                n += 1
        return n


def repair_pending(state: JobState, workspace: Workspace,
                   all_segments: Optional[List[Segment]] = None,
                   ext: str = ".mp4") -> JobState:
    """Queue repair on resume — the analog of reve-cli/src/main.rs:142-159.

    Rules:
      * stale .tmp part files are deleted (crashed encoder output);
      * any planned segment whose part file does not exist is pending —
        derived from the parts on disk rather than trusting only the saved
        queue, so a crash between part-commit and state-save self-heals;
      * pending list is sorted by index.
    """
    from reve_tpu.pipeline.planner import plan_segments

    workspace.clean_stale_tmp()
    if all_segments is None:
        all_segments = state.plan or plan_segments(
            state.frame_count, state.segment_size
        )
    done = set(workspace.completed_parts(ext))
    pending = [s for s in all_segments if s.index not in done]
    return dataclasses.replace(state, pending=pending)
