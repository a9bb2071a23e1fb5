"""Native C++ core tests: planner parity, mp4 probe/concat/remux, frame ring."""

import threading

import numpy as np
import pytest

from reve_tpu import native
from reve_tpu.pipeline import planner

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core unavailable (no g++?)"
)

TEST_MP4 = "/root/reference/reve-cli/assets/test.mp4"
DEMO_MP4 = "/root/reference/reve-cli/assets/onepiece_demo.mp4"


def test_planner_parity():
    """The C++ planner and the Python planner must agree exactly."""
    for frames, seg in [(1, 1), (7, 3), (1000, 250), (1001, 250),
                        (1440, 1000), (999, 1000), (100, 7)]:
        py = [(s.start, s.size) for s in planner.plan_segments(frames, seg)]
        cc = native.plan_segments(frames, seg)
        assert py == cc, (frames, seg)


def test_probe_reference_assets():
    import os

    if not os.path.exists(TEST_MP4):
        pytest.skip("reference asset missing")
    info = native.probe_mp4(TEST_MP4)
    assert info["width"] == 100 and info["height"] == 100
    assert info["video_samples"] == 1440
    assert info["has_audio"] is True
    demo = native.probe_mp4(DEMO_MP4)
    assert demo["width"] == 640 and demo["has_audio"] is True


def _write_parts(tmp_path, sizes, w=64, h=48):
    import cv2

    parts = []
    n = 0
    for i, count in enumerate(sizes):
        p = str(tmp_path / f"p{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
        for _ in range(count):
            wr.write(np.full((h, w, 3), 20 + n * 9, np.uint8))
            n += 1
        wr.release()
        parts.append(p)
    return parts


def test_concat_video_only(tmp_path):
    import cv2

    parts = _write_parts(tmp_path, [8, 8, 5])
    out = str(tmp_path / "out.mp4")
    native.concat_mp4(parts, None, out)
    info = native.probe_mp4(out)
    assert info["video_samples"] == 21 and info["has_audio"] is False
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    vals = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        vals.append(int(f[24, 32, 0]))
    cap.release()
    assert len(vals) == 21
    # monotone ramp survives (mp4v is lossy; compare loosely)
    for i, v in enumerate(vals):
        assert abs(v - (20 + i * 9)) < 12, (i, v)


def test_concat_with_audio_remux(tmp_path):
    import os

    if not os.path.exists(TEST_MP4):
        pytest.skip("reference asset missing")
    import cv2

    parts = _write_parts(tmp_path, [6, 6])
    out = str(tmp_path / "out.mp4")
    native.concat_mp4(parts, TEST_MP4, out)
    info = native.probe_mp4(out)
    assert info["video_samples"] == 12
    assert info["has_audio"] is True          # remuxed from the original
    assert info["n_tracks"] >= 2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


def test_concat_single_part(tmp_path):
    parts = _write_parts(tmp_path, [10])
    out = str(tmp_path / "out.mp4")
    native.concat_mp4(parts, None, out)
    assert native.probe_mp4(out)["video_samples"] == 10


def test_concat_error_on_missing_part(tmp_path):
    with pytest.raises(native.NativeError):
        native.concat_mp4([str(tmp_path / "nope.mp4")], None,
                          str(tmp_path / "o.mp4"))


def test_io_concat_prefers_native(tmp_path):
    import fractions

    from reve_tpu.io import concat as concat_mod

    parts = _write_parts(tmp_path, [4, 4])
    out = str(tmp_path / "out.mp4")
    report = concat_mod.concatenate(
        parts, "missing.bin", out, fractions.Fraction(24)
    )
    assert report["backend"] == "native"
    assert native.probe_mp4(out)["video_samples"] == 8


def test_frame_ring_roundtrip():
    ring = native.FrameRing(frame_bytes=48, capacity=4)
    frames = [np.arange(48, dtype=np.uint8) + i for i in range(10)]
    got = []

    def consumer():
        buf = np.empty(48, np.uint8)
        while True:
            rc = ring.pop(buf, timeout_ms=2000)
            if rc != 0:
                return
            got.append(buf.copy())

    t = threading.Thread(target=consumer)
    t.start()
    for f in frames:
        assert ring.push(f) == 0
    ring.close()
    t.join(timeout=5)
    assert len(got) == 10
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_frame_ring_backpressure():
    ring = native.FrameRing(frame_bytes=8, capacity=2)
    f = np.zeros(8, np.uint8)
    assert ring.push(f, timeout_ms=100) == 0
    assert ring.push(f, timeout_ms=100) == 0
    assert ring.push(f, timeout_ms=100) == 2  # full -> timeout
    out = np.empty(8, np.uint8)
    assert ring.pop(out, timeout_ms=100) == 0
    assert ring.push(f, timeout_ms=100) == 0  # space again


def test_counters():
    lib = native.load()
    c = lib.rc_counters_create(3)
    lib.rc_counter_add(c, 0, 5)
    lib.rc_counter_add(c, 0, 2)
    lib.rc_counter_add(c, 2, 1)
    assert lib.rc_counter_get(c, 0) == 7
    assert lib.rc_counter_get(c, 1) == 0
    assert lib.rc_counter_get(c, 2) == 1
    lib.rc_counters_destroy(c)


def test_concat_corrupt_part_rejected(tmp_path):
    """Fault injection: a torn/corrupt part file must surface an error, not
    a silent bad output (SURVEY.md §5: failure detection the reference
    lacked beyond exit codes)."""
    parts = _write_parts(tmp_path, [4])
    bad = str(tmp_path / "bad.mp4")
    with open(parts[0], "rb") as f:
        data = f.read()
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 3])  # truncated mid-mdat/moov
    with pytest.raises(native.NativeError):
        native.concat_mp4([parts[0], bad], None, str(tmp_path / "o.mp4"))


def test_concat_garbage_part_rejected(tmp_path):
    bad = str(tmp_path / "junk.mp4")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 4096)
    with pytest.raises(native.NativeError):
        native.concat_mp4([bad], None, str(tmp_path / "o.mp4"))


def test_concat_v1_mvhd(tmp_path):
    """A version-1 mvhd (64-bit times) first part: the output movie header
    is copied from it and patched in place — next_track_ID lives at payload
    offset 108 in v1, not 136 (ADVICE.md round-1 heap-overflow finding)."""
    import mp4_mutate

    parts = _write_parts(tmp_path, [6, 6])
    mp4_mutate.mvhd_v0_to_v1(parts[0])
    info0 = native.probe_mp4(parts[0])  # still parseable after the upgrade
    assert info0["video_samples"] == 6
    out = str(tmp_path / "out.mp4")
    native.concat_mp4(parts, None, out)
    info = native.probe_mp4(out)
    assert info["video_samples"] == 12 and info["width"] == 64


def test_table_count_lies_do_not_overread(tmp_path):
    """Sample tables whose in-file entry count exceeds the box payload must
    be clamped (parse_stbl), never read past the box: probe/concat may
    reject the file but must not crash or mis-size."""
    import mp4_mutate

    parts = _write_parts(tmp_path, [4])
    for table in (b"stts", b"ctts", b"stss", b"stsc", b"stsz", b"stco",
                  b"co64"):
        bad = str(tmp_path / f"lie_{table.decode()}.mp4")
        if not mp4_mutate.lie_table_count(parts[0], bad, table):
            continue  # table absent from this encoding
        try:
            native.probe_mp4(bad)
        except native.NativeError:
            pass
        try:
            native.concat_mp4([bad], None, str(tmp_path / "o.mp4"))
        except native.NativeError:
            pass


def test_short_header_boxes_rejected_cleanly(tmp_path):
    """tkhd/mdhd/mvhd boxes too small for their fixed-offset fields must
    not be read past (parse_trak/parse_movie minimum-size checks)."""
    import mp4_mutate

    parts = _write_parts(tmp_path, [4])
    cases = [
        ([b"moov", b"mvhd"], 4),
        ([b"moov", b"trak", b"tkhd"], 2),
        ([b"moov", b"trak", b"mdia", b"mdhd"], 3),
    ]
    for path, plen in cases:
        bad = str(tmp_path / ("short_" + path[-1].decode() + ".mp4"))
        assert mp4_mutate.truncate_box(parts[0], bad, path, plen)
        try:
            native.probe_mp4(bad)
        except native.NativeError:
            pass
        try:
            native.concat_mp4([bad], None, str(tmp_path / "o.mp4"))
        except native.NativeError:
            pass


# -- Matroska (mkv) muxing ---------------------------------------------------

def _cv2_lumas(path):
    import cv2

    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), path
    vals = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        vals.append(int(f[24, 32, 0]))
    cap.release()
    return vals


def test_concat_mkv_video_only(tmp_path):
    """mp4 parts -> mkv without re-encoding; cv2's bundled FFmpeg demuxer
    is the conformance check (it must decode every frame in order)."""
    parts = _write_parts(tmp_path, [8, 8, 5])
    out = str(tmp_path / "out.mkv")
    native.concat_mkv(parts, None, out)
    info = native.probe_mkv(out)
    assert info["video_blocks"] == 21 and info["width"] == 64
    assert info["has_audio"] is False
    vals = _cv2_lumas(out)
    assert len(vals) == 21
    for i, v in enumerate(vals):
        assert abs(v - (20 + i * 9)) < 12, (i, v)


@pytest.mark.skipif(not __import__("os").path.exists(TEST_MP4),
                    reason="reference asset missing")
def test_concat_mkv_mp4_original_audio(tmp_path):
    """Audio (AAC) remuxed sample-by-sample from an mp4 original into the
    mkv output — the reference's `-map 1:a? -c copy` behavior
    (reve-shared/src/lib.rs:181-204) without ffmpeg."""
    parts = _write_parts(tmp_path, [6, 6])
    out = str(tmp_path / "out.mkv")
    native.concat_mkv(parts, TEST_MP4, out)
    info = native.probe_mkv(out)
    assert info["has_audio"] is True and info["n_tracks"] == 2
    assert info["video_blocks"] == 12
    assert len(_cv2_lumas(out)) == 12


@pytest.mark.skipif(not __import__("os").path.exists(TEST_MP4),
                    reason="reference asset missing")
def test_concat_mkv_mkv_original_verbatim_tracks(tmp_path):
    """mkv original: non-video TrackEntry + blocks are copied verbatim."""
    parts = _write_parts(tmp_path, [6, 6])
    orig_mkv = str(tmp_path / "orig.mkv")
    native.concat_mkv(parts, TEST_MP4, orig_mkv)  # mkv WITH audio
    out = str(tmp_path / "out.mkv")
    native.concat_mkv(parts, orig_mkv, out)
    info = native.probe_mkv(out)
    assert info["has_audio"] is True and info["n_tracks"] == 2
    assert len(_cv2_lumas(out)) == 12


def test_io_concat_routes_mkv_to_native(tmp_path):
    parts = _write_parts(tmp_path, [4, 4])
    from fractions import Fraction

    from reve_tpu.io import concat as concat_mod

    out = str(tmp_path / "out.mkv")
    report = concat_mod.concatenate(parts, parts[0], out, Fraction(24))
    assert report["backend"] == "native"
    assert native.probe_mkv(out)["video_blocks"] == 8


def test_concat_mkv_corrupt_part_rejected(tmp_path):
    parts = _write_parts(tmp_path, [4])
    bad = str(tmp_path / "bad.mp4")
    with open(parts[0], "rb") as f:
        data = f.read()
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 3])
    with pytest.raises(native.NativeError):
        native.concat_mkv([parts[0], bad], None, str(tmp_path / "o.mkv"))
    with pytest.raises(native.NativeError):
        native.concat_mkv(parts, bad, str(tmp_path / "o2.mkv"))


def test_concat_mkv_mp4_opus_original(tmp_path):
    """Opus-in-mp4 originals remux natively: the dOps box is repacked into
    an Ogg OpusHead CodecPrivate (RFC 7845 §5.1 — same fields, multi-byte
    ones flipped to little-endian behind the magic) with A_OPUS,
    CodecDelay=PreSkip (48 kHz timebase) and the 80 ms SeekPreRoll.  The
    reference's `-c copy` concat carries Opus audio untouched
    (reve-shared/src/lib.rs:181-204); dropping it silently was the one
    audio-codec gap left in the native muxer."""
    import os
    import struct

    import mp4_mutate

    if not os.path.exists(TEST_MP4):
        pytest.skip("reference asset missing")
    opus_orig = str(tmp_path / "opus.mp4")
    assert mp4_mutate.mp4a_to_opus(TEST_MP4, opus_orig)
    parts = _write_parts(tmp_path, [3, 2])
    out = str(tmp_path / "o.mkv")
    native.concat_mkv(parts, opus_orig, out)
    info = native.probe_mkv(out)
    assert info["has_audio"] is True and info["n_tracks"] == 2
    blob = open(out, "rb").read()
    assert b"A_OPUS" in blob
    i = blob.index(b"OpusHead")
    head = blob[i:i + 19]
    assert head[8] == 1 and head[9] == 2            # version, channels
    assert struct.unpack("<H", head[10:12])[0] == 312     # PreSkip
    assert struct.unpack("<I", head[12:16])[0] == 48000   # InputSampleRate
    assert head[18] == 0                                  # mapping family
    # CodecDelay (0x56AA) = 312/48000 s = 6_500_000 ns, minimal-length uint
    assert b"\x56\xaa\x83" + (6_500_000).to_bytes(3, "big") in blob
    # SeekPreRoll (0x56BB) = 80 ms
    assert b"\x56\xbb\x84" + (80_000_000).to_bytes(4, "big") in blob


def test_concat_mkv_mp4_chapter_track(tmp_path):
    """A QuickTime chapter text track (tref/chap-referenced) in an mp4
    original converts to a Matroska Chapters element — ChapterAtoms with
    ChapterTimeStart (ns) and the title as ChapterDisplay — and is NOT
    remuxed as a subtitle stream (ffmpeg's handling of -map_chapters 1,
    reve-shared/src/lib.rs:196)."""
    import mp4_mutate

    base = _write_parts(tmp_path, [12])[0]
    chaptered = str(tmp_path / "chap.mp4")
    assert mp4_mutate.add_tx3g_track(
        base, chaptered,
        [("Intro", 1000), ("Action", 2000), ("Credits", 500)],
        as_chapters=True)
    parts_dir = tmp_path / "parts"
    parts_dir.mkdir()
    parts = _write_parts(parts_dir, [3, 2])
    out = str(tmp_path / "o.mkv")
    native.concat_mkv(parts, chaptered, out)
    info = native.probe_mkv(out)
    assert info["n_tracks"] == 1          # chapter track is not a stream
    blob = open(out, "rb").read()
    assert b"\x10\x43\xa7\x70" in blob    # Chapters element
    for title in (b"Intro", b"Action", b"Credits"):
        assert title in blob
    assert b"S_TEXT" not in blob
    # ChapterTimeStart of 'Action': 1000 ticks @ timescale 1000 = 1e9 ns,
    # minimal-length EBML uint (4 bytes) behind id 0x91
    assert b"\x91\x84" + (10 ** 9).to_bytes(4, "big") in blob
    # 'Credits' starts at 3e9 ns
    assert b"\x91\x84" + (3 * 10 ** 9).to_bytes(4, "big") in blob


def test_concat_mkv_mp4_flac_original(tmp_path):
    """FLAC-in-mp4 originals remux natively: A_FLAC CodecPrivate is the
    native stream header — 'fLaC' magic + the dfLa box's METADATA_BLOCKs
    verbatim (STREAMINFO first)."""
    import os

    import mp4_mutate

    if not os.path.exists(TEST_MP4):
        pytest.skip("reference asset missing")
    flac_orig = str(tmp_path / "flac.mp4")
    assert mp4_mutate.mp4a_to_flac(TEST_MP4, flac_orig)
    parts = _write_parts(tmp_path, [3, 2])
    out = str(tmp_path / "o.mkv")
    native.concat_mkv(parts, flac_orig, out)
    info = native.probe_mkv(out)
    assert info["has_audio"] is True and info["n_tracks"] == 2
    blob = open(out, "rb").read()
    assert b"A_FLAC" in blob
    i = blob.index(b"fLaC")
    # magic, then the last-block STREAMINFO header (0x80, len 34)
    assert blob[i + 4] == 0x80
    assert blob[i + 5:i + 8] == (34).to_bytes(3, "big")


def test_concat_mkv_mp4_tx3g_subtitles(tmp_path):
    """3GPP timed-text (tx3g) subtitle tracks in an mp4 original remux
    into mkv as S_TEXT/UTF8: the u16 length prefix is stripped, display
    time rides BlockDuration (BlockGroup), and empty-text gap samples
    produce no block.  The reference's `-map 1:s?` concat carries
    subtitle streams (reve-shared/src/lib.rs:181-204); dropping them on
    the mp4->mkv path was the last subtitle gap in the native muxer."""
    import os

    import mp4_mutate

    base = _write_parts(tmp_path, [12])[0]
    subbed = str(tmp_path / "subbed.mp4")
    assert mp4_mutate.add_tx3g_track(
        base, subbed, [("Hello world", 1000), ("", 500), ("Second cue", 750)])
    parts_dir = tmp_path / "parts"
    parts_dir.mkdir()
    parts = _write_parts(parts_dir, [3, 2])
    out = str(tmp_path / "o.mkv")
    native.concat_mkv(parts, subbed, out)
    info = native.probe_mkv(out)
    assert info["n_tracks"] == 2 and info["has_audio"] is False
    blob = open(out, "rb").read()
    assert b"S_TEXT/UTF8" in blob
    assert blob.count(b"Hello world") == 1      # payload, length stripped
    assert blob.count(b"Second cue") == 1
    assert b"\x9b\x82\x03\xe8" in blob          # BlockDuration 1000 ms
    assert b"\x9b\x82\x02\xee" in blob          # BlockDuration 750 ms
    # the empty gap cue produced no block: exactly two BlockGroups
    assert blob.count(b"\x9b\x82") == 2
    # mp4 -> mp4 concat copies the tx3g track verbatim (regression guard)
    out2 = str(tmp_path / "o.mp4")
    native.concat_mp4(parts, subbed, out2)
    blob2 = open(out2, "rb").read()
    assert b"tx3g" in blob2 and b"Hello world" in blob2


# ---------------------------------------------------------------- y4m concat


def _write_y4m_parts(tmp_path, sizes, w=32, h=16):
    import fractions

    from reve_tpu.io import writer

    parts, shade = [], 0
    for i, n in enumerate(sizes):
        p = str(tmp_path / f"y{i}.y4m")
        with writer.Y4MWriter(p, w, h, fractions.Fraction(24)) as wr:
            for _ in range(n):
                wr.write(np.full((h, w, 3), 16 + shade % 200, np.uint8))
                shade += 13
        parts.append(p)
    return parts


def test_concat_y4m_byte_exact_stream_copy(tmp_path):
    """Native y4m concat = first header + every part's frame bytes verbatim
    (the reference's `-c copy` semantics; no YUV->RGB round trip)."""
    parts = _write_y4m_parts(tmp_path, [3, 2, 4])
    out = str(tmp_path / "all.y4m")
    native.concat_y4m(parts, out)
    expected = b""
    for i, p in enumerate(parts):
        with open(p, "rb") as f:
            data = f.read()
        expected += data if i == 0 else data[data.index(b"\n") + 1:]
    with open(out, "rb") as f:
        assert f.read() == expected
    info = native.probe_y4m(out)
    assert info == {"width": 32, "height": 16, "fps_num": 24,
                    "fps_den": 1, "frames": 9}


def test_concat_y4m_geometry_mismatch_rejected(tmp_path):
    parts = _write_y4m_parts(tmp_path, [2])
    other = _write_y4m_parts(tmp_path / "..", [1], w=64)  # different width
    with pytest.raises(native.NativeError, match="geometry mismatch"):
        native.concat_y4m(parts + other, str(tmp_path / "o.y4m"))


def test_concat_y4m_garbage_rejected(tmp_path):
    bad = str(tmp_path / "bad.y4m")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 200)
    with pytest.raises(native.NativeError):
        native.concat_y4m([bad], str(tmp_path / "o.y4m"))
    with pytest.raises(native.NativeError):
        native.probe_y4m(bad)


def test_probe_y4m_torn_tail_frame(tmp_path):
    """A part truncated mid-frame counts only the complete frames."""
    (part,) = _write_y4m_parts(tmp_path, [3])
    size = __import__("os").path.getsize(part)
    with open(part, "rb+") as f:
        f.truncate(size - 10)
    assert native.probe_y4m(part)["frames"] == 2


def test_probe_y4m_torn_marker_line(tmp_path):
    """EOF in the middle of a FRAME marker line = torn tail (count the
    complete frames), not an error — byte-level truncation can land
    anywhere, including inside the marker."""
    (part,) = _write_y4m_parts(tmp_path, [2])
    with open(part, "ab") as f:
        f.write(b"FRA")  # marker cut mid-line at EOF
    assert native.probe_y4m(part)["frames"] == 2


def test_probe_y4m_marker_line_bounded(tmp_path):
    """A corrupt file whose 'marker' never hits a newline must error out
    at a bounded length, not allocate toward the file size (the native
    twin of the Python reader's 4 KB marker cap)."""
    bad = str(tmp_path / "long.y4m")
    with open(bad, "wb") as f:
        f.write(b"YUV4MPEG2 W8 H4 F24:1\n" + b"FRAME" + b"X" * 100_000)
    with pytest.raises(native.NativeError, match="too long"):
        native.probe_y4m(bad)


def test_probe_y4m_implausible_header_rejected(tmp_path):
    """Hostile W/H/F header values are rejected before any frame-size
    arithmetic (atol on huge literals would otherwise feed overflowing
    products into frame_bytes / the fps cross-check)."""
    bad = str(tmp_path / "big.y4m")
    with open(bad, "wb") as f:
        f.write(b"YUV4MPEG2 W99999999999 H4 F24:1\nFRAME\n")
    with pytest.raises(native.NativeError, match="implausible"):
        native.probe_y4m(bad)


def test_io_concat_routes_y4m_to_native(tmp_path):
    from fractions import Fraction

    from reve_tpu.io import concat as concat_mod, reader

    parts = _write_y4m_parts(tmp_path, [2, 3])
    out = str(tmp_path / "out.y4m")
    report = concat_mod.concatenate(parts, "", out, Fraction(24),
                                    backend="y4m")
    assert report == {"backend": "native", "audio_copied": False}
    rd = reader.Y4MReader(out)
    assert rd.frame_count() == 5
    # decoded content matches reading the parts back-to-back
    got = [f.tobytes() for f in rd.read_range(0, 5)]
    want = []
    for p in parts:
        want += [f.tobytes() for f in reader.Y4MReader(p).read_range(0, 5)]
    assert got == want


def test_concat_mixed_ctts_parts(tmp_path):
    """One part with composition offsets (B-frame-style ctts) + one
    without: the merged trak must keep a ctts covering ALL samples
    (zero offsets synthesized for the ctts-less part), not drop it."""
    import struct

    import mp4_mutate

    parts = _write_parts(tmp_path, [6, 6])
    with_ctts = str(tmp_path / "bframes.mp4")
    assert mp4_mutate.insert_ctts(parts[0], with_ctts,
                                  offset_ticks=512, sample_count=6)
    out = str(tmp_path / "out.mp4")
    native.concat_mp4([with_ctts, parts[1]], None, out)
    info = native.probe_mp4(out)
    assert info["video_samples"] == 12

    data = open(out, "rb").read()
    off, size = mp4_mutate.find_box_path(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"ctts"])
    assert off is not None, "merged ctts box missing"
    n = struct.unpack(">I", data[off + 12:off + 16])[0]
    entries = [struct.unpack(">Ii", data[off + 16 + 8 * i:
                                         off + 24 + 8 * i])
               for i in range(n)]
    assert sum(c for c, _ in entries) == 12
    # part 1's offsets survive; part 2 contributes explicit zeros
    assert entries[0] == (6, 512)
    assert entries[-1] == (6, 0)
    # output still decodes
    import cv2

    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()
