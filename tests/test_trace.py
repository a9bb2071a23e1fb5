"""Tracing subsystem tests: JSONL events, spans, pipeline integration."""

import fractions
import json

import numpy as np

from reve_tpu.io import writer
from reve_tpu.pipeline import planner, scheduler, state
from reve_tpu.utils import trace


def test_disabled_tracer_is_noop():
    t = trace.null()
    t.event("x", a=1)
    with t.span("y"):
        pass
    assert not t.enabled


def test_events_and_spans(tmp_path):
    path = str(tmp_path / "t.jsonl")
    t = trace.Tracer(path)
    t.event("hello", n=3)
    with t.span("work", seg=1):
        pass
    t.close()
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["ev"] == "hello" and lines[0]["n"] == 3
    assert lines[1]["ev"] == "work" and "dur" in lines[1]
    assert lines[1]["seg"] == 1


class FakeEngine:
    batch_size = 4
    scale = 2

    def submit(self, frames):
        out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

        class _P:
            def result(self):
                return out

        return _P()


def test_pipeline_emits_stage_events(tmp_path):
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(8):
            wr.write(np.full((24, 32, 3), 40 + i, np.uint8))
    ws = state.Workspace(str(tmp_path / "work"))
    ws.create()
    st = state.JobState(
        input_path=inp, output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=4, frame_count=8,
        fps_num=24, fps_den=1, width=32, height=24,
        pending=planner.plan_segments(8, 4),
    )
    tpath = str(tmp_path / "trace.jsonl")
    job = scheduler.PipelineJob(
        st, ws, FakeEngine(), io_backend="y4m", part_ext=".y4m",
        tracer=trace.Tracer(tpath),
    )
    job.run()
    records = [json.loads(line) for line in open(tpath)]
    events = [r["ev"] for r in records]
    assert "submit" in events
    assert "encode_batch" in events
    commits = [r for r in records if r["ev"] == "segment_commit"]
    assert len(commits) == 2
    # per-segment end-to-end x-realtime report (BASELINE.md "per segment")
    for c in commits:
        assert c["frames"] == 4
        assert c["wall_s"] > 0 and c["x_realtime"] > 0
