"""IO backend tests: probe, frame-exact read ranges, writers, y4m roundtrip."""

import fractions

import numpy as np
import pytest

from reve_tpu.io import probe, reader, writer, concat

TEST_MP4 = "/root/reference/reve-cli/assets/test.mp4"


def _have_test_asset():
    import os

    return os.path.exists(TEST_MP4)


@pytest.mark.skipif(not _have_test_asset(), reason="reference asset missing")
def test_probe_cv2():
    info = probe.probe(TEST_MP4, backend="cv2")
    assert info.width == 100 and info.height == 100
    assert info.frame_count == 1440
    assert abs(info.fps_float - 23.976) < 0.01


@pytest.mark.skipif(not _have_test_asset(), reason="reference asset missing")
def test_cv2_reader_frame_exact():
    with reader.Cv2Reader(TEST_MP4) as rd:
        first = list(rd.read_range(0, 3))
        assert len(first) == 3
        assert first[0].shape == (100, 100, 3)
        # re-read a later range, then an earlier one (backward seek)
        mid = list(rd.read_range(10, 12))
        assert len(mid) == 2
        again = list(rd.read_range(0, 3))
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)


def test_synthetic_reader_deterministic():
    rd = reader.SyntheticReader(32, 24, 100)
    a = list(rd.read_range(5, 8))
    b = list(rd.read_range(5, 8))
    assert len(a) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # distinct frames differ
    assert not np.array_equal(a[0], a[1])


def test_y4m_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "clip.y4m")
    fps = fractions.Fraction(24, 1)
    frames = [
        reader.SyntheticReader.frame(i, 32, 48) for i in range(6)
    ]
    with writer.Y4MWriter(path, 48, 32, fps) as w:
        for f in frames:
            w.write(f)

    rd = reader.Y4MReader(path)
    assert rd.width == 48 and rd.height == 32
    assert rd.fps == (24, 1)
    assert rd.frame_count() == 6
    got = list(rd.read_range(2, 5))
    assert len(got) == 3
    # YUV420 8-bit roundtrip loses chroma detail; luma-ish tolerance
    for g, f in zip(got, frames[2:5]):
        assert g.shape == f.shape
        assert np.mean(np.abs(g.astype(int) - f.astype(int))) < 12


def test_y4m_range_exactness(tmp_path):
    """Frame N must come back as frame N — the property the reference's
    seek-1-early hack (lib.rs:94-98) could not guarantee."""
    path = str(tmp_path / "clip.y4m")
    with writer.Y4MWriter(path, 64, 32, fractions.Fraction(30)) as w:
        for i in range(20):
            # encode the index into the luma of a solid frame
            f = np.full((32, 64, 3), i * 10 + 20, np.uint8)
            w.write(f)
    rd = reader.Y4MReader(path)
    for start, stop in [(0, 2), (7, 11), (18, 20)]:
        for offset, frame in enumerate(rd.read_range(start, stop)):
            want = (start + offset) * 10 + 20
            assert abs(int(frame[16, 32, 0]) - want) <= 3, (start, offset)


def test_cv2_writer_roundtrip(tmp_path):
    path = str(tmp_path / "out.mp4")
    fps = fractions.Fraction(24)
    with writer.Cv2Writer(path, 64, 48, fps) as w:
        for i in range(5):
            w.write(reader.SyntheticReader.frame(i, 48, 64))
    info = probe.probe(path, backend="cv2")
    assert (info.width, info.height, info.frame_count) == (64, 48, 5)


def test_rewrite_concat(tmp_path):
    fps = fractions.Fraction(24)
    parts = []
    n = 0
    for part_idx in range(3):
        p = str(tmp_path / f"part{part_idx}.y4m")
        with writer.Y4MWriter(p, 32, 32, fps) as w:
            for _ in range(4):
                w.write(np.full((32, 32, 3), n * 5 + 10, np.uint8))
                n += 1
        parts.append(p)
    out = str(tmp_path / "out.y4m")
    report = concat.concatenate(parts, "unused", out, fps, backend="y4m")
    assert report["audio_copied"] is False
    rd = reader.Y4MReader(out)
    assert rd.frame_count() == 12
    lumas = [int(f[16, 16, 0]) for f in rd.read_range(0, 12)]
    assert all(b >= a for a, b in zip(lumas, lumas[1:]))  # monotone sequence


def test_y4m_10bit_roundtrip(tmp_path):
    """C420p10 write/read — the reference's 10-bit pixel format
    (yuv420p10le, main.rs:317-318) without any codec binary."""
    path = str(tmp_path / "clip10.y4m")
    fps = fractions.Fraction(24)
    # chroma-flat frames (constant 2x2 blocks): 4:2:0 subsampling is then
    # lossless and quantization depth is the only error source
    rs = np.random.RandomState(0)
    frames = [
        np.repeat(np.repeat(rs.randint(0, 256, (16, 24, 3)), 2, 0), 2, 1)
        .astype(np.uint8)
        for _ in range(4)
    ]
    with writer.Y4MWriter(path, 48, 32, fps, bits=10) as w:
        for f in frames:
            w.write(f)
    rd = reader.Y4MReader(path)
    assert rd.bits == 10
    got = list(rd.read_range(0, 4))
    assert len(got) == 4
    # 10-bit quantization error should be ~4x smaller than 8-bit
    err10 = np.mean([
        np.abs(g.astype(int) - f.astype(int)).mean()
        for g, f in zip(got, frames)
    ])
    path8 = str(tmp_path / "clip8.y4m")
    with writer.Y4MWriter(path8, 48, 32, fps, bits=8) as w:
        for f in frames:
            w.write(f)
    err8 = np.mean([
        np.abs(g.astype(int) - f.astype(int)).mean()
        for g, f in zip(reader.Y4MReader(path8).read_range(0, 4), frames)
    ])
    assert err10 < err8 * 0.7, (err10, err8)
    assert err10 < 1.0


def test_y4m_10bit_pipeline(tmp_path):
    """Pipeline end-to-end with 10-bit parts."""
    
    from reve_tpu.pipeline import planner as planner_mod
    from reve_tpu.pipeline import scheduler, state

    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 16, fractions.Fraction(24), bits=10) as w:
        for i in range(6):
            w.write(np.full((16, 32, 3), 40 + i * 20, np.uint8))

    class FakeEngine:
        batch_size = 3
        scale = 2

        def submit(self, frames):
            out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

            class _P:
                def result(self):
                    return out

            return _P()

    ws = state.Workspace(str(tmp_path / "w"))
    ws.create()
    st = state.JobState(
        input_path=inp, output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=3, frame_count=6,
        fps_num=24, fps_den=1, width=32, height=16,
        pending=planner_mod.plan_segments(6, 3),
    )
    job = scheduler.PipelineJob(st, ws, FakeEngine(), io_backend="y4m",
                                part_ext=".y4m")
    scheduler.finalize(job.run(), ws, io_backend="y4m", part_ext=".y4m")
    rd = reader.Y4MReader(str(tmp_path / "out.y4m"))
    assert rd.frame_count() == 6


@pytest.mark.skipif(not _have_test_asset(), reason="reference asset missing")
def test_cv2_reader_far_seek_frame_exact():
    """Deep forward seeks (resume scenario) must stay frame-exact: the
    seeked read of a far range equals the sequential read."""
    with reader.Cv2Reader(TEST_MP4) as rd_seq:
        rd_seq.SEEK_THRESHOLD = 10 ** 9   # force pure skip-decode baseline
        seq = list(rd_seq.read_range(1200, 1204))
    with reader.Cv2Reader(TEST_MP4) as rd_seek:
        rd_seek.SEEK_THRESHOLD = 100      # force the container-seek path
        via_seek = list(rd_seek.read_range(1200, 1204))
    assert len(seq) == len(via_seek) == 4
    for a, b in zip(seq, via_seek):
        np.testing.assert_array_equal(a, b)


def test_y4m_parameterized_frame_markers_exact(tmp_path):
    """Spec-valid y4m with frame parameters ("FRAME Ip\\n"): the reader
    must walk markers (no fixed-stride seek) and decode byte-identically
    to the bare-marker file, including mid-range seeks and frame_count."""
    plain = str(tmp_path / "plain.y4m")
    with writer.Y4MWriter(plain, 40, 24, fractions.Fraction(30, 1)) as wr:
        for i in range(8):
            wr.write(np.full((24, 40, 3), 20 + 8 * i, np.uint8))
    param = str(tmp_path / "param.y4m")
    with open(plain, "rb") as f:
        data = f.read()
    with open(param, "wb") as f:
        f.write(data.replace(b"FRAME\n", b"FRAME Ip\n"))

    rp = reader.Y4MReader(param)
    assert rp.frame_count() == 8
    want = list(reader.Y4MReader(plain).read_range(0, 8))
    got = list(rp.read_range(0, 8))
    assert len(got) == 8
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(want[3:7], reader.Y4MReader(param).read_range(3, 7)):
        np.testing.assert_array_equal(a, b)


def test_y4m_mixed_frame_markers_exact(tmp_path):
    """Spec-valid y4m whose FIRST marker is bare but later frames carry
    parameters: the first-marker classification alone would take the
    fixed-stride fast path and read shifted garbage — the stride
    assumption must be re-verified per seek (and in frame_count)."""
    plain = str(tmp_path / "plain.y4m")
    with writer.Y4MWriter(plain, 40, 24, fractions.Fraction(30, 1)) as wr:
        for i in range(8):
            wr.write(np.full((24, 40, 3), 20 + 8 * i, np.uint8))
    with open(plain, "rb") as f:
        data = f.read()
    # frames 0-2 keep bare markers; 3.. carry a parameter (and one of
    # them a >255-byte parameter line, which a capped readline truncates)
    frame_size = 40 * 24 * 3 // 2
    per = frame_size + len(b"FRAME\n")
    header_end = data.index(b"\n") + 1
    long_param = b"FRAME X" + b"q" * 300 + b"\n"
    mixed = bytearray(data[:header_end + 3 * per])
    for i in range(3, 8):
        off = header_end + i * per
        marker = long_param if i == 5 else b"FRAME Ip\n"
        mixed += marker + data[off + 6:off + per]
    param = str(tmp_path / "mixed.y4m")
    with open(param, "wb") as f:
        f.write(bytes(mixed))

    want = list(reader.Y4MReader(plain).read_range(0, 8))
    rp = reader.Y4MReader(param)
    assert rp.frame_count() == 8
    got = list(rp.read_range(0, 8))
    assert len(got) == 8
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    # a mid-range seek landing past the parameterized region must not
    # use the (now wrong) stride either
    for a, b in zip(want[4:7], reader.Y4MReader(param).read_range(4, 7)):
        np.testing.assert_array_equal(a, b)


def test_rrdb_missing_explicit_weights_is_loud(tmp_path):
    """A typo'd --weights path must raise, never silently fall back to
    random init (matches the srvgg loader's behavior)."""
    from reve_tpu.models import registry

    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        registry.load_model("realesrgan-x4plus", 4,
                            str(tmp_path / "nope.pth"))


def test_concat_native_case_insensitive_mp4_report(tmp_path):
    """Report honesty: audio_copied must reflect what native_concat
    actually did — gates and report both case-fold extensions now."""
    from reve_tpu.io.concat import native_concat

    # uppercase original extension: the gate should still pass it through
    # (previously the gate was case-sensitive while the report wasn't)
    parts = []
    assert native_concat(parts or ["x.y4m"], "ORIG.MP4",
                         str(tmp_path / "out.mp4")) is False  # no mp4 parts


def test_y4m_long_parameter_marker_lines(tmp_path):
    """Spec-valid FRAME lines may carry long parameter strings: anything
    under the marker cap must parse exactly (the old 256-byte readline
    cap silently truncated and desynced the walk)."""
    h, w = 24, 32
    fsz = w * h * 3 // 2
    params = b" X" + b"p" * 600  # > the old 256-byte cap
    payload = bytes([128]) * fsz
    path = str(tmp_path / "long_marker.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W32 H24 F24:1 C420\n")
        for _ in range(3):
            f.write(b"FRAME" + params + b"\n")
            f.write(payload)
    rd = reader.Y4MReader(path)
    assert rd.frame_count() == 3
    assert len(list(rd.read_range(0, 3))) == 3


def test_y4m_corrupt_tail_bounded_marker_read(tmp_path):
    """A newline-free byte run where a marker should be (corrupt file, or
    payload bytes after a truncation) must be treated as not-a-marker
    within the bounded cap — never an unbounded readline() that hunts the
    rest of a multi-GB file for a newline."""
    h, w = 24, 32
    fsz = w * h * 3 // 2
    path = str(tmp_path / "corrupt_tail.y4m")
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W32 H24 F24:1 C420\n")
        f.write(b"FRAME\n" + bytes([128]) * fsz)
        f.write(b"A" * 16384)  # garbage: no newline anywhere
    rd = reader.Y4MReader(path)
    assert rd.frame_count() == 1
    frames = list(rd.read_range(0, 5))
    assert len(frames) == 1 and frames[0].shape == (h, w, 3)


def test_probe_ffprobe_prefers_avg_frame_rate(monkeypatch, tmp_path):
    """Interlaced/telecined streams: r_frame_rate is the LCM of frame
    timings (2x the playback rate); avg_frame_rate is what the
    reference's mediainfo %FrameRate% reports — a doubled fps would
    desync the encode from the remuxed audio.  And a probe with no frame
    count must fall through to the next backend, not 'succeed' with 0."""
    import json as json_mod
    import subprocess
    import types

    from reve_tpu.io import probe as probe_mod

    def fake_run(payload):
        def run(*a, **k):
            return types.SimpleNamespace(
                returncode=0, stdout=json_mod.dumps(payload))
        return run

    monkeypatch.setattr(probe_mod.shutil, "which", lambda exe: "/bin/fake")
    telecined = {"streams": [{
        "codec_type": "video", "width": 720, "height": 480,
        "r_frame_rate": "60000/1001", "avg_frame_rate": "30000/1001",
        "nb_frames": "300",
    }]}
    monkeypatch.setattr(subprocess, "run", fake_run(telecined))
    info = probe_mod._probe_ffprobe("x.mp4")
    assert info.fps == fractions.Fraction(30000, 1001)

    # broken avg ("0/0", common on some muxers) falls back to r_frame_rate
    telecined["streams"][0]["avg_frame_rate"] = "0/0"
    monkeypatch.setattr(subprocess, "run", fake_run(telecined))
    assert probe_mod._probe_ffprobe("x.mp4").fps == \
        fractions.Fraction(60000, 1001)

    # no frame count anywhere -> None (next backend counts)
    del telecined["streams"][0]["nb_frames"]
    monkeypatch.setattr(subprocess, "run", fake_run(telecined))
    assert probe_mod._probe_ffprobe("x.mp4") is None


def test_probe_cv2_rejects_damaged_headers(monkeypatch):
    """cv2 reports 0 / NaN instead of failing on damaged headers; the
    probe must return None (-> chain error) rather than a VideoInfo that
    plans zero segments or feeds fps=0 into an encoder."""
    from reve_tpu.io import probe as probe_mod

    class FakeCap:
        def __init__(self, fps):
            self._fps = fps

        def isOpened(self):
            return True

        def get(self, prop):
            import cv2

            return {cv2.CAP_PROP_FPS: self._fps,
                    cv2.CAP_PROP_FRAME_WIDTH: 0,
                    cv2.CAP_PROP_FRAME_HEIGHT: 0,
                    cv2.CAP_PROP_FRAME_COUNT: 0}[prop]

        def release(self):
            pass

    import cv2

    for bad_fps in (0.0, float("nan")):
        monkeypatch.setattr(cv2, "VideoCapture",
                            lambda p, f=bad_fps: FakeCap(f))
        assert probe_mod._probe_cv2("x.mp4") is None


def test_frame_ring_validates_memory_safety_preconditions():
    import numpy as np
    import pytest as _pytest

    from reve_tpu import native

    if not native.available():
        _pytest.skip("native core unavailable")
    with _pytest.raises(ValueError, match="positive"):
        native.FrameRing(16, 0)
    with _pytest.raises(ValueError, match="positive"):
        native.FrameRing(-1, 4)
    ring = native.FrameRing(16, 2)
    with _pytest.raises(ValueError, match="bytes"):
        ring.push(np.zeros(8, np.uint8))
    ring.push(np.zeros(16, np.uint8))
    with _pytest.raises(ValueError, match="contiguous|bytes"):
        ring.pop(np.zeros(8, np.uint8))
    out = np.zeros(16, np.uint8)
    assert ring.pop(out) == 0
    ring.close()
