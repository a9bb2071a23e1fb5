"""Helpers that mutate real mp4 files into hostile/edge-case fixtures for
the native ISO-BMFF core (reve_tpu/_native/mp4.cpp).  Used by both the
Python-level tests and the ASan/UBSan harness."""

import struct


def _walk_boxes(data, start, end):
    """Yield (offset, size, type) for each box in data[start:end]."""
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", data[off:off + 4])[0]
        typ = bytes(data[off + 4:off + 8])
        if size == 1:
            size = struct.unpack(">Q", data[off + 8:off + 16])[0]
        elif size == 0:
            size = end - off
        if size < 8:
            return
        yield off, size, typ
        off += size


def _find_box(data, start, end, typ):
    for off, size, t in _walk_boxes(data, start, end):
        if t == typ:
            return off, size
    return None, None


def find_box_path(data, path):
    """Locate a nested box by path, e.g. [b'moov', b'trak', b'mdia',
    b'minf', b'stbl', b'stts'].  Returns (offset, size) of the final box or
    (None, None)."""
    start, end = 0, len(data)
    off = size = None
    for typ in path:
        off, size = _find_box(data, start, end, typ)
        if off is None:
            return None, None
        start, end = off + 8, off + size
    return off, size


def mvhd_v0_to_v1(path):
    """Rewrite an mp4 in place, upgrading its moov/mvhd box from version 0
    (100-byte payload) to version 1 (112-byte: 64-bit times/duration).
    Requires moov to come after mdat (cv2's layout) so expanding it does
    not shift chunk offsets."""
    data = bytearray(open(path, "rb").read())
    moov_off, moov_size = _find_box(data, 0, len(data), b"moov")
    assert moov_off is not None, "no moov"
    mvhd_off, mvhd_size = _find_box(
        data, moov_off + 8, moov_off + moov_size, b"mvhd")
    assert mvhd_off is not None and mvhd_size == 108, (mvhd_off, mvhd_size)
    p = mvhd_off + 8
    assert data[p] == 0, "mvhd already v1"
    ctime, mtime, ts, dur = struct.unpack(">IIII", data[p + 4:p + 20])
    rest = bytes(data[p + 20:p + 100])  # rate .. next_track_ID (80 bytes)
    payload = struct.pack(">B3sQQIQ", 1, b"\0\0\0", ctime, mtime, ts,
                          dur) + rest
    assert len(payload) == 112
    data[mvhd_off:mvhd_off + mvhd_size] = (
        struct.pack(">I", 8 + 112) + b"mvhd" + payload)
    struct.pack_into(">I", data, moov_off, moov_size + 12)
    with open(path, "wb") as f:
        f.write(data)


_TABLE_COUNT_OFF = {  # offset of the entry-count field within the payload
    b"stts": 4, b"ctts": 4, b"stss": 4, b"stsc": 4, b"stsz": 8,
    b"stco": 4, b"co64": 4,
}


def lie_table_count(src, dst, table, count=0xFFFFFFFF):
    """Copy src->dst, then overwrite the named sample-table box's in-file
    entry count with `count` (far larger than the payload holds) — the
    heap-overread shape ADVICE.md flagged for parse_stbl."""
    data = bytearray(open(src, "rb").read())
    off, size = find_box_path(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl", table])
    if off is None:
        return False
    struct.pack_into(">I", data, off + 8 + _TABLE_COUNT_OFF[table], count)
    with open(dst, "wb") as f:
        f.write(data)
    return True


def stts_sample_flood(src, dst, count=0x7FFFFFF0):
    """Copy src->dst, then make the video track claim ~2^31 samples
    without a per-sample size table: stsz switches to a fixed sample size
    (entry table empty) and stts's first entry count is inflated.  Found
    by scripts/fuzz_native.py — sample_count() sums attacker-controlled
    stts counts, and every O(n) sample-table expansion must clamp what it
    trusts (mp4_internal.h bounded_sample_count) or a 1 KB file drives a
    multi-GB allocation."""
    data = bytearray(open(src, "rb").read())
    off, _size = find_box_path(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stsz"])
    if off is None:
        return False
    # fullbox payload: verflags(4) sample_size(4) sample_count(4)
    struct.pack_into(">I", data, off + 8 + 4, 1)  # fixed sample_size = 1
    struct.pack_into(">I", data, off + 8 + 8, 0)  # no per-sample entries
    off, _size = find_box_path(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stts"])
    if off is None:
        return False
    # verflags(4) entry_count(4) then (count, delta) pairs
    struct.pack_into(">I", data, off + 8 + 8, count)  # first entry count
    with open(dst, "wb") as f:
        f.write(data)
    return True


def truncate_box(src, dst, path, new_payload_len):
    """Copy src->dst shrinking a box's declared size so fixed-offset reads
    (tkhd/mdhd/mvhd) would fall past it if unchecked.  Only the size field
    is changed; following boxes become garbage — parsers must fail cleanly."""
    data = bytearray(open(src, "rb").read())
    off, size = find_box_path(data, path)
    if off is None:
        return False
    struct.pack_into(">I", data, off, 8 + new_payload_len)
    with open(dst, "wb") as f:
        f.write(data)
    return True


def largesize_wrap(src, dst):
    """Copy src->dst, then rewrite the moov header as a 64-bit largesize
    box whose size wraps uint64 when added to its offset — the
    overflow-defeats-bounds-check shape.  Parsers must reject cleanly."""
    data = bytearray(open(src, "rb").read())
    off, size = find_box_path(data, [b"moov"])
    if off is None:
        return False
    # size==1 switches to largesize; keep the payload in place by writing
    # the 16-byte header over the first 8 payload bytes (content becomes
    # garbage — irrelevant, the size check must fire first)
    struct.pack_into(">I4sQ", data, off, 1, b"moov",
                     0xFFFFFFFFFFFFFF00)
    with open(dst, "wb") as f:
        f.write(data)
    return True


def stsc_lies_bigger_than_stsz(src, dst):
    """stsc claims a huge samples_per_chunk while stsz stays small: the
    cross-table inconsistency that drove sample_sizes[] out of bounds."""
    data = bytearray(open(src, "rb").read())
    off, size = find_box_path(
        data, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stsc"])
    if off is None or size < 8 + 8 + 12:
        return False
    # first entry: samples_per_chunk (payload: verflags 4, count 4,
    # then entries of first_chunk 4 / spc 4 / desc 4)
    struct.pack_into(">I", data, off + 8 + 8 + 4, 0x00FFFFFF)
    with open(dst, "wb") as f:
        f.write(data)
    return True


def insert_ctts(src, dst, offset_ticks, sample_count):
    """Copy src->dst adding a one-entry ctts box ({sample_count,
    offset_ticks}) into the first trak's stbl, growing every ancestor's
    size field.  Valid only when moov follows mdat (OpenCV's layout), so
    chunk offsets don't shift."""
    data = bytearray(open(src, "rb").read())
    path = [b"moov", b"trak", b"mdia", b"minf", b"stbl"]
    stbl_off, stbl_size = find_box_path(data, path)
    if stbl_off is None:
        return False
    mdat_off, _ = find_box_path(data, [b"mdat"])
    moov_off, _ = find_box_path(data, [b"moov"])
    if mdat_off is None or moov_off is None or moov_off < mdat_off:
        return False  # moov before mdat: insertion would shift chunks
    ctts = struct.pack(">I4sIIIi", 24, b"ctts", 0, 1,
                       sample_count, offset_ticks)
    # grow each ancestor on the path
    start, end = 0, len(data)
    for typ in path:
        off, size = _find_box(data, start, end, typ)
        struct.pack_into(">I", data, off, size + len(ctts))
        start, end = off + 8, off + size
    data[stbl_off + stbl_size:stbl_off + stbl_size] = ctts
    with open(dst, "wb") as f:
        f.write(bytes(data))
    return True


def _swap_mp4a_entry(src, dst, fourcc, new_box, rate, channels):
    """Shared rewrite: find the audio trak's mp4a sample entry, swap its
    fourcc and overwrite the esds box with `new_box` (+ free padding so
    every offset/size in the file is preserved)."""
    data = bytearray(open(src, "rb").read())
    # find the audio trak: the one whose mdia/hdlr handler_type is 'soun'
    moov_off, moov_size = _find_box(data, 0, len(data), b"moov")
    if moov_off is None:
        return False
    for t_off, t_size, t_typ in _walk_boxes(data, moov_off + 8,
                                            moov_off + moov_size):
        if t_typ != b"trak":
            continue
        m_off, m_size = _find_box(data, t_off + 8, t_off + t_size, b"mdia")
        if m_off is None:
            continue
        h_off, h_size = _find_box(data, m_off + 8, m_off + m_size, b"hdlr")
        if h_off is None or bytes(data[h_off + 16:h_off + 20]) != b"soun":
            continue
        start, end = m_off + 8, m_off + m_size
        for typ in (b"minf", b"stbl", b"stsd"):
            off, size = _find_box(data, start, end, typ)
            if off is None:
                return False
            start, end = off + 8, off + size
        chain = [(moov_off, moov_size), (t_off, t_size), (m_off, m_size)]
        entry = start + 8  # skip stsd verflags(4) + entry count(4)
        if bytes(data[entry + 4:entry + 8]) != b"mp4a":
            return False
        data[entry + 4:entry + 8] = fourcc
        # AudioSampleEntry samplerate (16.16) at +32 from entry start
        struct.pack_into(">I", data, entry + 32, rate << 16)
        struct.pack_into(">H", data, entry + 24, channels)
        e_off, e_size = _find_box(data, entry + 36, end, b"esds")
        n = len(new_box)
        if e_off is None:
            return False
        if e_size >= n + 8:
            # fits: overwrite + free padding, zero offsets move
            data[e_off:e_off + n] = new_box
            data[e_off + n:e_off + n + 8] = struct.pack(
                ">I4s", e_size - n, b"free")
        else:
            # new box larger than esds: splice it in and grow every
            # ancestor box size.  mdat must not move (absolute chunk
            # offsets), so the growth is absorbed either by file end
            # (moov-last layout) or by shrinking a top-level free box
            # between moov and mdat (faststart layout).
            delta = n - e_size
            free_off = None
            if moov_off + moov_size != len(data):
                for o, s, t in _walk_boxes(data, moov_off + moov_size,
                                           len(data)):
                    if t == b"mdat":
                        break
                    if t == b"free" and s >= delta + 8:
                        free_off = o
                        free_size = s
                        break
                if free_off is None:
                    return False
            # re-locate the minf/stbl/stsd chain for size patching
            s2, e2 = m_off + 8, m_off + m_size
            for typ in (b"minf", b"stbl", b"stsd"):
                off, size = _find_box(data, s2, e2, typ)
                chain.append((off, size))
                s2, e2 = off + 8, off + size
            chain.append((entry, struct.unpack_from(">I", data, entry)[0]))
            for off, size in chain:
                struct.pack_into(">I", data, off, size + delta)
            data[e_off:e_off + e_size] = new_box
            if free_off is not None:
                # everything between moov and the free box shifted +delta;
                # delete delta bytes from the free payload so mdat stays put
                free_off += delta
                struct.pack_into(">I", data, free_off, free_size - delta)
                del data[free_off + 8:free_off + 8 + delta]
        with open(dst, "wb") as f:
            f.write(data)
        return True
    return False


def mp4a_to_opus(src, dst, preskip=312, rate=48000, channels=2):
    """Copy src->dst rewriting its (first) AAC audio sample entry into an
    Opus one IN PLACE: fourcc mp4a->Opus, the esds box overwritten with a
    dOps box (+ free padding to preserve every offset/size).  Produces a
    structurally valid Opus-in-mp4 track over the original AAC packet data
    — good enough for mux/codec-mapping tests (no decoder runs here)."""
    dops = struct.pack(">I4sBBHIHB", 19, b"dOps", 0, channels,
                       preskip, rate, 0, 0)
    return _swap_mp4a_entry(src, dst, b"Opus", dops, rate, channels)


def mp4a_to_flac(src, dst, rate=48000, channels=2):
    """Copy src->dst rewriting the AAC audio entry into FLAC-in-mp4:
    fourcc mp4a->fLaC, esds overwritten with a dfLa box (FullBox verflags
    + a last-block STREAMINFO METADATA_BLOCK, 34 zero-filled bytes plus
    plausible rate/channel fields)."""
    # STREAMINFO: min/max blocksize(2+2) min/max framesize(3+3)
    # rate(20 bits) channels-1(3) bits-1(5) total(36) md5(16) = 34 bytes
    streaminfo = bytearray(34)
    struct.pack_into(">HH", streaminfo, 0, 4096, 4096)
    packed = (rate << 12) | ((channels - 1) << 9) | ((16 - 1) << 4)
    struct.pack_into(">I", streaminfo, 10, packed << 4)
    block = struct.pack(">B", 0x80) + len(streaminfo).to_bytes(3, "big") \
        + bytes(streaminfo)
    dfla = struct.pack(">I4sI", 8 + 4 + len(block), b"dfLa", 0) + block
    return _swap_mp4a_entry(src, dst, b"fLaC", dfla, rate, channels)


def add_tx3g_track(src, dst, cues, timescale=1000, track_id=9,
                   as_chapters=False):
    """Copy src->dst appending a 3GPP timed-text (tx3g) subtitle track:
    a new trak in moov (handler 'text', one chunk of u16-length-prefixed
    samples) + a new mdat at EOF holding the cue bytes.  `cues` is a list
    of (text_or_empty, duration_ticks); empty text = a display gap.
    `as_chapters`: also insert a tref/chap box into the FIRST (video)
    trak referencing the new track — the QuickTime chapter convention
    (the track is then chapter metadata, not a subtitle stream).
    Requires moov to be the LAST top-level box (cv2's layout) so growing
    it shifts nothing."""
    data = bytearray(open(src, "rb").read())
    moov_off, moov_size = _find_box(data, 0, len(data), b"moov")
    if moov_off is None or moov_off + moov_size != len(data):
        return False
    if as_chapters:
        # tref{chap{track_id}} appended inside the first trak
        v_off, v_size = _find_box(data, moov_off + 8, moov_off + moov_size,
                                  b"trak")
        if v_off is None:
            return False
        tref = struct.pack(">I4sI4sI", 20, b"tref", 12, b"chap", track_id)
        struct.pack_into(">I", data, v_off, v_size + len(tref))
        struct.pack_into(">I", data, moov_off, moov_size + len(tref))
        data[v_off + v_size:v_off + v_size] = tref
        moov_size += len(tref)

    samples = []
    for text, _dur in cues:
        raw = text.encode() if text else b""
        samples.append(struct.pack(">H", len(raw)) + raw)
    payload = b"".join(samples)

    def box(typ, body):
        return struct.pack(">I4s", 8 + len(body), typ) + body

    def full(typ, body, verflags=0):
        return box(typ, struct.pack(">I", verflags) + body)

    total_dur = sum(d for _, d in cues)
    tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, track_id, 0)
                + struct.pack(">I", total_dur) + b"\0" * 52
                + struct.pack(">II", 0, 0), verflags=7)
    mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                     total_dur, 0x55C4, 0))
    hdlr = full(b"hdlr", struct.pack(">I4s", 0, b"text") + b"\0" * 12
                + b"tx3g\0")
    # tx3g sample entry: 8 reserved/dataref + 30 bytes of default style
    tx3g_entry = struct.pack(">I4s", 8 + 8 + 30, b"tx3g") \
        + b"\0" * 6 + struct.pack(">H", 1) + b"\0" * 30
    stsd = full(b"stsd", struct.pack(">I", 1) + tx3g_entry)
    stts = full(b"stts", struct.pack(">I", len(cues)) + b"".join(
        struct.pack(">II", 1, d) for _, d in cues))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = full(b"stsz", struct.pack(">II", 0, len(samples)) + b"".join(
        struct.pack(">I", len(s)) for s in samples))
    # chunk offset: after the grown moov, into the appended mdat's payload
    trak_sizes_guess = 0
    for _ in range(2):  # stco size depends on the final offset: iterate
        stco = full(b"stco", struct.pack(">II", 1,
                                         len(data) + trak_sizes_guess + 8))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        trak_sizes_guess = len(trak)
    struct.pack_into(">I", data, moov_off, moov_size + len(trak))
    data += trak
    data += box(b"mdat", payload)
    with open(dst, "wb") as f:
        f.write(data)
    return True
