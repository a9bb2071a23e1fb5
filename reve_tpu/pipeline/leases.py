"""File-lease segment queue: shard segments across workers/hosts.

Segments are embarrassingly parallel (SURVEY.md §2.3-2.4), so the multi-host
strategy is a shared work queue, not collectives.  Coordination uses atomic
lease files in the shared workspace — the same file-based state idiom the
reference uses for resume — so it works over any shared filesystem (NFS/GCS
fuse) with no extra services:

  * claim:   O_CREAT|O_EXCL create of `leases/<idx>.lease` containing the
             worker id; EEXIST means another worker owns it.
  * renew:   touch the lease file (mtime heartbeat) while working.
  * release: delete the lease (after the part file is committed).
  * steal:   a lease older than `stale_after` seconds whose part has not
             appeared is deleted and re-claimed (crash takeover).

Completion is defined by the part file existing (the same source of truth
`repair_pending` uses), so the queue and resume logic can never disagree.
"""

from __future__ import annotations

import errno
import os
import time
from typing import List, Optional

from reve_tpu.pipeline.planner import Segment
from reve_tpu.pipeline.state import Workspace

LEASES_DIR = "leases"


class SegmentLeaseQueue:
    def __init__(self, workspace: Workspace, worker_id: str,
                 stale_after: float = 120.0, part_ext: str = ".mp4"):
        self.ws = workspace
        self.worker_id = worker_id
        self.stale_after = stale_after
        self.part_ext = part_ext
        self.dir = os.path.join(workspace.root, LEASES_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _lease_path(self, index: int) -> str:
        return os.path.join(self.dir, f"{index:06d}.lease")

    def _try_create(self, path: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except OSError as e:
            if e.errno == errno.EEXIST:
                return False
            raise
        with os.fdopen(fd, "w") as f:
            f.write(self.worker_id)
        return True

    def _is_stale(self, path: str) -> bool:
        try:
            return time.time() - os.path.getmtime(path) > self.stale_after
        except OSError:
            return False  # vanished: owner released or finished

    def claim(self, segments: List[Segment]) -> Optional[Segment]:
        """Claim the first unowned, uncompleted segment; None if none left
        to claim (they may still be in-flight on other workers)."""
        done = set(self.ws.completed_parts(self.part_ext))
        for seg in segments:
            if seg.index in done:
                continue
            path = self._lease_path(seg.index)
            if self._try_create(path):
                return seg
            if self._is_stale(path):
                # crashed owner: take over (best-effort unlink + re-create)
                try:
                    os.unlink(path)
                except OSError:
                    pass
                if self._try_create(path):
                    return seg
        return None

    def renew(self, seg: Segment) -> None:
        try:
            os.utime(self._lease_path(seg.index))
        except OSError:
            pass

    def release(self, seg: Segment) -> None:
        try:
            os.unlink(self._lease_path(seg.index))
        except OSError:
            pass

    def all_done(self, segments: List[Segment]) -> bool:
        done = set(self.ws.completed_parts(self.part_ext))
        return all(s.index in done for s in segments)

    def wait_all_done(self, segments: List[Segment],
                      timeout: float = 3600.0, poll: float = 0.5) -> bool:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self.all_done(segments):
                return True
            time.sleep(poll)
        return False


def run_sharded(state, workspace: Workspace, engine, worker_id: str,
                io_backend: Optional[str] = None, part_ext: str = ".mp4",
                progress=None, stale_after: float = 120.0) -> int:
    """Worker loop: claim segments one at a time and run them through the
    standard pipeline until the queue is exhausted.  Returns the number of
    segments this worker completed.  Any worker can then `finalize` once
    `SegmentLeaseQueue.all_done` holds."""
    import dataclasses

    from reve_tpu.pipeline.scheduler import PipelineJob

    queue = SegmentLeaseQueue(workspace, worker_id,
                              stale_after=stale_after, part_ext=part_ext)
    all_segments = list(state.pending)
    completed = 0
    while True:
        seg = queue.claim(all_segments)
        if seg is None:
            return completed
        try:
            job = PipelineJob(
                dataclasses.replace(state, pending=[seg]),
                workspace, engine, io_backend=io_backend,
                part_ext=part_ext, progress=progress,
            )
            job.run()
            completed += 1
        finally:
            queue.release(seg)
