"""Run the native core under AddressSanitizer + UBSan.

Builds a standalone test binary from the same sources and drives
probe/concat/remux/corrupt-input paths; any heap overflow, use-after-free,
or UB in the MP4 parser aborts the binary with a sanitizer report.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "reve_tpu",
                          "_native")
TEST_MP4 = "/root/reference/reve-cli/assets/test.mp4"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ unavailable"
)


@pytest.fixture(scope="module")
def san_binary(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("san") / "reve_core_test")
    cmd = [
        "g++", "-std=c++17", "-g", "-O1",
        "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
        os.path.join(NATIVE_DIR, "mp4.cpp"),
        os.path.join(NATIVE_DIR, "mkv.cpp"),
        os.path.join(NATIVE_DIR, "y4m.cpp"),
        os.path.join(NATIVE_DIR, "core.cpp"),
        os.path.join(NATIVE_DIR, "test_main.cpp"),
        "-o", out,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        pytest.skip(f"sanitized build failed: {res.stderr[:300]}")
    return out


def _mk_parts(tmp_path):
    import cv2

    parts = []
    for i in range(2):
        p = str(tmp_path / f"p{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48))
        for j in range(6):
            wr.write(np.full((48, 64, 3), 30 + i * 60 + j * 5, np.uint8))
        wr.release()
        parts.append(p)
    return parts


def test_sanitized_concat_and_corrupt(san_binary, tmp_path):
    import mp4_mutate

    parts = _mk_parts(tmp_path)
    # parts[0] gets a version-1 mvhd so patch_mvhd's v1 layout (the round-1
    # out-of-bounds-write finding) runs under ASan in the video-only concat
    mp4_mutate.mvhd_v0_to_v1(parts[0])
    # corrupt variants: truncations at several points + garbage
    corrupts = []
    data = open(parts[0], "rb").read()
    for frac_i, frac in enumerate((0.1, 0.5, 0.9)):
        p = str(tmp_path / f"trunc{frac_i}.mp4")
        with open(p, "wb") as f:
            f.write(data[: int(len(data) * frac)])
        corrupts.append(p)
    junk = str(tmp_path / "junk.mp4")
    with open(junk, "wb") as f:
        f.write(os.urandom(8192))
    corrupts.append(junk)
    # sample tables whose in-file entry counts exceed the box payload
    for table in (b"stts", b"ctts", b"stss", b"stsc", b"stsz", b"stco",
                  b"co64"):
        p = str(tmp_path / f"lie_{table.decode()}.mp4")
        if mp4_mutate.lie_table_count(parts[1], p, table):
            corrupts.append(p)
    # uint64-wrapping largesize and cross-table stsc/stsz inconsistency
    # (third-review-pass memory-safety findings)
    p = str(tmp_path / "largesize_wrap.mp4")
    if mp4_mutate.largesize_wrap(parts[1], p):
        corrupts.append(p)
    p = str(tmp_path / "stsc_lie.mp4")
    if mp4_mutate.stsc_lies_bigger_than_stsz(parts[1], p):
        corrupts.append(p)
    # boxes too small for their fixed-offset fields
    for path, plen in [([b"moov", b"mvhd"], 4),
                       ([b"moov", b"trak", b"tkhd"], 2),
                       ([b"moov", b"trak", b"mdia", b"mdhd"], 3)]:
        p = str(tmp_path / ("short_" + path[-1].decode() + ".mp4"))
        if mp4_mutate.truncate_box(parts[1], p, path, plen):
            corrupts.append(p)
    # hostile Matroska inputs: a valid mkv (from our own muxer) truncated,
    # bit-flipped, and with a lying EBML size vint — exercised through
    # rc_concat_mkv's original-parsing and rc_probe_mkv under the sanitizers
    from reve_tpu import native

    if native.available():
        mkv_src = str(tmp_path / "src.mkv")
        native.concat_mkv([parts[1]], None, mkv_src)
        data = open(mkv_src, "rb").read()
        for frac_i, frac in enumerate((0.2, 0.6, 0.95)):
            p = str(tmp_path / f"mkv_trunc{frac_i}.mkv")
            with open(p, "wb") as f:
                f.write(data[: int(len(data) * frac)])
            corrupts.append(p)
        rs = np.random.RandomState(7)
        for k in range(3):
            buf = bytearray(data)
            for pos in rs.randint(4, len(buf), 40):
                buf[pos] ^= 1 << rs.randint(8)
            p = str(tmp_path / f"mkv_flip{k}.mkv")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            corrupts.append(p)
        # size-vint lie: make the Segment claim 8 bytes
        buf = bytearray(data)
        seg = buf.find(bytes.fromhex("18538067"))
        if seg >= 0:
            buf[seg + 4:seg + 12] = bytes([0x01, 0, 0, 0, 0, 0, 0, 8])
            p = str(tmp_path / "mkv_sizelie.mkv")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            corrupts.append(p)

    original = TEST_MP4 if os.path.exists(TEST_MP4) else "-"
    out = str(tmp_path / "out.mp4")
    res = subprocess.run(
        [san_binary, parts[0], parts[1], original, out] + corrupts,
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "sanitized native core: ok" in res.stdout
    assert "ERROR: AddressSanitizer" not in res.stderr
    assert "runtime error" not in res.stderr  # UBSan
