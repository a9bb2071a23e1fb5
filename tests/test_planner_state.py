"""Planner math and resume state machine tests — the unit coverage the
reference lacked entirely (SURVEY.md §4: 'no unit tests of segmentation math,
resume repair, or arg validation')."""

import json

import pytest

from reve_tpu.pipeline import planner, state


# -- planner ---------------------------------------------------------------

def test_exact_division():
    segs = planner.plan_segments(1000, 250)
    assert len(segs) == 4
    assert [s.size for s in segs] == [250] * 4
    assert segs[-1].stop == 1000


def test_remainder_tail():
    segs = planner.plan_segments(1001, 250)
    assert len(segs) == 5
    assert segs[-1].size == 1  # NOT remainder-1: reference's lib.rs:282-289
    assert segs[-1].stop == 1001


def test_no_gap_no_overlap():
    for n, size in [(1, 1), (7, 3), (1440, 1000), (999, 1000), (100, 7)]:
        segs = planner.plan_segments(n, size)
        covered = []
        for s in segs:
            covered.extend(range(s.start, s.stop))
        assert covered == list(range(n)), (n, size)
        assert [s.index for s in segs] == list(range(len(segs)))


def test_single_segment_when_short():
    segs = planner.plan_segments(5, 1000)
    assert len(segs) == 1 and segs[0].size == 5


def test_invalid_args():
    with pytest.raises(ValueError):
        planner.plan_segments(0, 10)
    with pytest.raises(ValueError):
        planner.plan_segments(10, 0)


# -- state machine ---------------------------------------------------------

def _mkstate(tmp_path, frame_count=100, segment_size=30):
    ws = state.Workspace(str(tmp_path / "work"))
    ws.create()
    segs = planner.plan_segments(frame_count, segment_size)
    st = state.JobState(
        input_path="in.mp4", output_path="out.mp4", scale=2,
        segment_size=segment_size, frame_count=frame_count,
        fps_num=24, fps_den=1, width=64, height=48, pending=segs,
    )
    return ws, st


def test_save_load_roundtrip(tmp_path):
    ws, st = _mkstate(tmp_path)
    ws.save(st)
    assert ws.has_state()
    st2 = ws.load()
    assert st2 == st


def test_state_file_is_json(tmp_path):
    ws, st = _mkstate(tmp_path)
    ws.save(st)
    with open(ws.state_path) as f:
        d = json.load(f)
    assert d["version"] == state.STATE_VERSION
    assert len(d["pending"]) == 4


def test_part_commit_atomicity(tmp_path):
    ws, st = _mkstate(tmp_path)
    with open(ws.part_tmp_path(0), "w") as f:
        f.write("x")
    assert ws.completed_parts() == []  # .tmp not visible
    ws.commit_part(0)
    assert ws.completed_parts() == [0]


def test_repair_requeues_missing_parts(tmp_path):
    ws, st = _mkstate(tmp_path)  # 4 segments: 0..3
    # parts 0 and 2 completed; 1 crashed mid-encode (tmp file), 3 untouched
    for i in (0, 2):
        with open(ws.part_tmp_path(i), "w") as f:
            f.write("x")
        ws.commit_part(i)
    with open(ws.part_tmp_path(1), "w") as f:
        f.write("torn")
    # saved queue claims only 3 is pending (stale state: crash after pop)
    st.pending = st.pending[3:]
    repaired = state.repair_pending(st, ws)
    assert [s.index for s in repaired.pending] == [1, 3]
    # torn tmp file removed
    import os

    assert not os.path.exists(ws.part_tmp_path(1))


def test_repair_empty_queue_but_missing_part(tmp_path):
    """Reference analog: queue empty -> re-push final segment
    (main.rs:142-146); our invariant derives pending from parts on disk."""
    ws, st = _mkstate(tmp_path)
    for i in (0, 1, 2):
        with open(ws.part_tmp_path(i), "w") as f:
            f.write("x")
        ws.commit_part(i)
    st.pending = []
    repaired = state.repair_pending(st, ws)
    assert [s.index for s in repaired.pending] == [3]


def test_create_keep_parts(tmp_path):
    ws, st = _mkstate(tmp_path)
    with open(ws.part_tmp_path(0), "w") as f:
        f.write("x")
    ws.commit_part(0)
    ws.save(st)
    ws.create(keep_parts=True)
    assert ws.completed_parts() == [0]
    ws.create(keep_parts=False)
    assert ws.completed_parts() == []
    assert not ws.has_state()
