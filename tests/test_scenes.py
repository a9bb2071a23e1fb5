"""Scene-cut detection and cut-aligned segment planning."""

import numpy as np
import pytest

from reve_tpu.io.reader import FrameReader
from reve_tpu.pipeline import scenes
from reve_tpu.pipeline.planner import Segment


class SceneReader(FrameReader):
    """Frames with hard content switches at given cut indices."""

    def __init__(self, num_frames, cuts, h=48, w=64):
        self.num_frames = num_frames
        self.cuts = sorted(cuts)
        self.h, self.w = h, w

    def read_range(self, start, stop):
        for i in range(start, min(stop, self.num_frames)):
            scene = sum(1 for c in self.cuts if c <= i)
            rs = np.random.RandomState(scene)  # per-scene random texture
            base = rs.randint(0, 256, (self.h, self.w, 3)).astype(np.int16)
            noise = np.random.RandomState(1000 + i).randint(
                -4, 5, base.shape
            )  # small intra-scene flicker
            yield np.clip(base + noise, 0, 255).astype(np.uint8)


def test_detect_cuts():
    cuts = [40, 90, 140]
    rd = SceneReader(180, cuts)
    got = scenes.detect_cuts(rd, 180)
    assert got == cuts


def test_detect_no_cuts_on_smooth_content():
    rd = SceneReader(100, cuts=[])  # one scene, flicker only
    assert scenes.detect_cuts(rd, 100) == []


def _check_invariants(segs, frame_count):
    covered = []
    for s in segs:
        assert s.size > 0
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(frame_count))
    assert [s.index for s in segs] == list(range(len(segs)))


def test_aligned_plan_snaps_to_cuts():
    segs = scenes.plan_segments_aligned(300, 100, cuts=[95, 180, 270])
    _check_invariants(segs, 300)
    # first boundary snapped from 100 to the cut at 95
    assert segs[0] == Segment(0, 0, 95)
    # second boundary: target 195, cut 180 within window 25 -> snap
    assert segs[1].stop == 180


def test_aligned_plan_without_cuts_matches_fixed():
    from reve_tpu.pipeline.planner import plan_segments

    assert scenes.plan_segments_aligned(250, 100, cuts=[]) == \
        plan_segments(250, 100)


def test_aligned_plan_ignores_far_cuts():
    segs = scenes.plan_segments_aligned(300, 100, cuts=[50])  # > window away
    assert segs[0].stop == 100


def test_aligned_plan_invariants_fuzz():
    rs = np.random.RandomState(0)
    for _ in range(50):
        n = rs.randint(1, 500)
        seg = rs.randint(1, 120)
        cuts = sorted(rs.randint(1, max(n, 2), size=rs.randint(0, 8)))
        _check_invariants(
            scenes.plan_segments_aligned(n, seg, cuts), n
        )


def test_invalid_args():
    with pytest.raises(ValueError):
        scenes.plan_segments_aligned(0, 10, [])


def test_resume_with_aligned_plan(tmp_path):
    """Scene-aligned (non-uniform) plans must survive save -> repair: the
    repair derives pending from the saved plan, not the uniform formula."""
    from reve_tpu.pipeline import state as state_mod

    plan = scenes.plan_segments_aligned(300, 100, cuts=[95, 180, 270])
    assert [s.size for s in plan] != [100, 100, 100]  # actually non-uniform
    ws = state_mod.Workspace(str(tmp_path / "w"))
    ws.create()
    st = state_mod.JobState(
        input_path="in.mp4", output_path="out.mp4", scale=2,
        segment_size=100, frame_count=300, fps_num=24, fps_den=1,
        width=64, height=48, pending=list(plan), plan=list(plan),
    )
    ws.save(st)
    # complete segment 0, then "crash" and repair from reloaded state
    with open(ws.part_tmp_path(0), "w") as f:
        f.write("x")
    ws.commit_part(0)
    st2 = state_mod.repair_pending(ws.load(), ws)
    assert [s.index for s in st2.pending] == [1, 2, 3]
    assert st2.pending[0] == plan[1]  # non-uniform boundary preserved
