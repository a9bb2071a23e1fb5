"""Image channel-layout semantics (io/image.py): grayscale, alpha, 16-bit.

The replaced engine (realesrgan-ncnn-vulkan, reve-shared/src/lib.rs:134-147)
upscales still images in these layouts; the model is RGB-only, so each is
routed through the 3-channel engine per the upstream Real-ESRGAN
conventions (gray replicated/reduced, alpha through the model, 16-bit
reduced and re-widened)."""

import cv2
import numpy as np
import pytest

from reve_tpu import cli
from reve_tpu.io import image as image_mod
from reve_tpu.pipeline.engine import UpscaleEngine


def _engine():
    return UpscaleEngine(scale=2, batch_size=1, compute_dtype="float32")


def _rs(seed=0):
    return np.random.RandomState(seed)


def test_classify_and_u8():
    assert image_mod.classify(np.zeros((4, 4), np.uint8)) == "gray"
    assert image_mod.classify(np.zeros((4, 4, 3), np.uint8)) == "bgr"
    assert image_mod.classify(np.zeros((4, 4, 4), np.uint8)) == "bgra"
    with pytest.raises(ValueError, match="unsupported image shape"):
        image_mod.classify(np.zeros((4, 4, 2), np.uint8))
    u16 = np.array([[0, 257, 65535]], np.uint16)
    u8, was16 = image_mod.to_u8(u16)
    assert was16 and u8.tolist() == [[0, 1, 255]]
    with pytest.raises(ValueError, match="unsupported image dtype"):
        image_mod.to_u8(u16.astype(np.float32))


def test_gray_roundtrip_matches_replicated_rgb():
    gray = _rs(1).randint(0, 256, (10, 14), np.uint8)
    out, was16 = image_mod.upscale_image_array(_engine(), gray)
    assert not was16 and out.shape == (20, 28) and out.dtype == np.uint8
    # equals luma of the replicated-channel model output
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    want = image_mod._luma(
        _engine().upscale_frames(rgb[None])[0][:, :, ::-1])
    np.testing.assert_array_equal(out, want)


def test_bgra_color_plane_matches_bgr_path():
    rs = _rs(2)
    bgra = rs.randint(0, 256, (8, 12, 4), np.uint8)
    out, _ = image_mod.upscale_image_array(_engine(), bgra)
    assert out.shape == (16, 24, 4)
    color_only, _ = image_mod.upscale_image_array(
        _engine(), np.ascontiguousarray(bgra[:, :, :3]))
    np.testing.assert_array_equal(out[:, :, :3], color_only)
    # alpha plane equals the gray path applied to the alpha channel
    alpha_as_gray, _ = image_mod.upscale_image_array(
        _engine(), np.ascontiguousarray(bgra[:, :, 3]))
    np.testing.assert_array_equal(out[:, :, 3], alpha_as_gray)


def test_16bit_widening_exact_at_extremes():
    out = image_mod.to_output_depth(np.array([0, 255], np.uint8), True)
    assert out.dtype == np.uint16 and out.tolist() == [0, 65535]
    same = image_mod.to_output_depth(np.array([7], np.uint8), False)
    assert same.dtype == np.uint8


def test_cli_alpha_png(tmp_path, capsys):
    inp = str(tmp_path / "in.png")
    bgra = _rs(3).randint(0, 256, (10, 10, 4), np.uint8)
    assert cv2.imwrite(inp, bgra)
    out = str(tmp_path / "out.png")
    rc = cli.run(["-i", inp, "-s", "2", out, "--dtype", "float32"])
    assert rc == 0
    got = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert got.shape == (20, 20, 4)
    want, _ = image_mod.upscale_image_array(
        _engine(), cv2.imread(inp, cv2.IMREAD_UNCHANGED))
    np.testing.assert_array_equal(got, want)


def test_cli_alpha_requires_alpha_capable_output(tmp_path, capsys):
    inp = str(tmp_path / "in.png")
    assert cv2.imwrite(inp, np.zeros((8, 8, 4), np.uint8))
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "out.jpg")])
    assert rc == 2
    assert "alpha" in capsys.readouterr().err


def test_cli_gray_png(tmp_path):
    inp = str(tmp_path / "in.png")
    gray = _rs(4).randint(0, 256, (9, 11), np.uint8)
    assert cv2.imwrite(inp, gray)
    out = str(tmp_path / "out.png")
    rc = cli.run(["-i", inp, "-s", "2", out, "--dtype", "float32"])
    assert rc == 0
    got = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert got.shape == (18, 22) and got.dtype == np.uint8


def test_cli_16bit_png(tmp_path, capsys):
    inp = str(tmp_path / "in.png")
    img16 = (_rs(5).randint(0, 65536, (8, 10, 3))).astype(np.uint16)
    assert cv2.imwrite(inp, img16)
    out = str(tmp_path / "out.png")
    rc = cli.run(["-i", inp, "-s", "2", out, "--dtype", "float32"])
    assert rc == 0
    assert "16-bit" in capsys.readouterr().err
    got = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert got.dtype == np.uint16 and got.shape == (16, 20, 3)
    assert (got % 257 == 0).all(), "widening must be exact *257"


def test_cli_image_dir_batch(tmp_path, capsys):
    """`-i dir/ -s 2 outdir/` — the ncnn binary's folder surface: every
    image upscaled through ONE shared engine, alpha retargeted to .png
    when the extension can't carry it, existing outputs skipped on
    re-run (resume idiom), failures reported per file with exit 2."""
    ind = tmp_path / "in"
    ind.mkdir()
    rs = _rs(6)
    cv2.imwrite(str(ind / "a.png"), rs.randint(0, 256, (8, 10, 3),
                                               np.uint8))
    cv2.imwrite(str(ind / "b.jpg"), rs.randint(0, 256, (6, 6, 3),
                                               np.uint8))
    # alpha image with a jpg-style target -> must come out as .png
    cv2.imwrite(str(ind / "c.bmp"), rs.randint(0, 256, (5, 7, 4),
                                               np.uint8))
    (ind / "notes.txt").write_text("not an image")
    outd = tmp_path / "out"
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32"])
    err = capsys.readouterr().err
    assert rc == 0, err
    assert cv2.imread(str(outd / "a.png")).shape == (16, 20, 3)
    assert cv2.imread(str(outd / "b.jpg")).shape == (12, 12, 3)
    got_c = cv2.imread(str(outd / "c.png"), cv2.IMREAD_UNCHANGED)
    assert got_c.shape == (10, 14, 4) and not (outd / "c.bmp").exists()
    assert "alpha channel -> writing c.png" in err
    assert "done: 3 upscaled" in err

    # re-run: everything already present -> all skipped, still rc 0
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32"])
    assert rc == 0
    assert "0 upscaled, 3 already present (skipped)" in \
        capsys.readouterr().err

    # a corrupt image fails that file (exit 2) but the rest still run
    (ind / "z_bad.png").write_bytes(b"not a png")
    rc = cli.run(["-i", str(ind), "-s", "2", str(tmp_path / "out2"),
                  "--dtype", "float32"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "z_bad.png: cannot decode" in err
    assert "3 upscaled" in err and "1 FAILED" in err


def test_cli_image_dir_validation(tmp_path, capsys):
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = cli.run(["-i", str(empty), "-s", "2", str(tmp_path / "o")])
    assert rc == 2
    assert "no images" in capsys.readouterr().err

    ind = tmp_path / "in"
    ind.mkdir()
    cv2.imwrite(str(ind / "a.png"), np.zeros((4, 4, 3), np.uint8))
    # file output for a dir input is refused
    f = tmp_path / "afile"
    f.write_text("")
    rc = cli.run(["-i", str(ind), "-s", "2", str(f)])
    assert rc == 2
    assert "must be a directory" in capsys.readouterr().err
    # int8-gate never applies to image mode
    rc = cli.run(["-i", str(ind), "-s", "2", str(tmp_path / "o2"),
                  "--dtype", "int8", "--int8-gate", "50"])
    assert rc == 2
    assert "image mode" in capsys.readouterr().err


def test_cli_16bit_to_jpg_stays_8bit(tmp_path, capsys):
    """A 16-bit input written to an extension that can't carry 16 bits
    must NOT be widened (cv2's CV_8U fallback saturate-casts u16*257 to
    near-white); it stays 8-bit with a note."""
    inp = str(tmp_path / "in.png")
    img16 = (_rs(7).randint(0, 65536, (8, 10, 3))).astype(np.uint16)
    assert cv2.imwrite(inp, img16)
    out = str(tmp_path / "out.jpg")
    rc = cli.run(["-i", inp, "-s", "2", out, "--dtype", "float32"])
    err = capsys.readouterr().err
    assert rc == 0
    assert "cannot carry 16-bit" in err
    got = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert got.dtype == np.uint8 and got.shape == (16, 20, 3)
    # not blown out: the mean must track the (8-bit-reduced) input mean,
    # nowhere near the 255 saturation the u16 widening used to cause
    assert abs(float(got.mean()) - float(img16.mean()) / 257.0) < 30


def test_cli_image_dir_alpha_retarget_collision(tmp_path, capsys):
    """An alpha c.bmp retargeting to c.png must not shadow a sibling
    INPUT named c.png (which the skip-exists check would then silently
    never upscale) — the retarget falls back to c.bmp.png."""
    ind = tmp_path / "in"
    ind.mkdir()
    rs = _rs(8)
    cv2.imwrite(str(ind / "c.bmp"), rs.randint(0, 256, (5, 7, 4),
                                               np.uint8))
    cv2.imwrite(str(ind / "c.png"), rs.randint(0, 256, (6, 8, 3),
                                               np.uint8))
    outd = tmp_path / "out"
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32"])
    err = capsys.readouterr().err
    assert rc == 0, err
    assert "done: 2 upscaled" in err
    assert "alpha channel -> writing c.bmp.png" in err
    assert cv2.imread(str(outd / "c.bmp.png"),
                      cv2.IMREAD_UNCHANGED).shape == (10, 14, 4)
    assert cv2.imread(str(outd / "c.png"),
                      cv2.IMREAD_UNCHANGED).shape == (12, 16, 3)


def test_cli_image_dir_refuses_output_into_input_dir(tmp_path, capsys):
    ind = tmp_path / "in"
    ind.mkdir()
    cv2.imwrite(str(ind / "a.png"), np.zeros((4, 4, 3), np.uint8))
    rc = cli.run(["-i", str(ind), "-s", "2", str(ind)])
    assert rc == 2
    assert "must differ" in capsys.readouterr().err


def test_api_alpha_refuses_jpg(tmp_path):
    import reve_tpu

    inp = str(tmp_path / "in.png")
    assert cv2.imwrite(inp, np.zeros((8, 8, 4), np.uint8))
    with pytest.raises(ValueError, match="alpha"):
        reve_tpu.upscale_image(inp, str(tmp_path / "o.jpg"), scale=2,
                               dtype="float32")


def test_cli_image_dir_format(tmp_path, capsys):
    """-f jpg (the replaced ncnn engine's -f switch): every output
    re-encodes to the requested format; two inputs whose stems collide
    under the shared extension divert to <name>.<fmt>; alpha inputs
    still retarget to .png (jpg cannot carry the plane)."""
    ind = tmp_path / "in"
    ind.mkdir()
    rs = _rs(9)
    cv2.imwrite(str(ind / "a.png"), rs.randint(0, 256, (8, 10, 3),
                                               np.uint8))
    # sorts before a.png -> claims a.jpg first
    cv2.imwrite(str(ind / "a.bmp"), rs.randint(0, 256, (6, 6, 3),
                                               np.uint8))
    cv2.imwrite(str(ind / "c.bmp"), rs.randint(0, 256, (5, 7, 4),
                                               np.uint8))
    outd = tmp_path / "out"
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32", "-f", "jpg"])
    err = capsys.readouterr().err
    assert rc == 0, err
    assert cv2.imread(str(outd / "a.jpg")).shape == (12, 12, 3)
    assert "a.png: output name taken -> writing a.png.jpg" in err
    assert cv2.imread(str(outd / "a.png.jpg")).shape == (16, 20, 3)
    assert "c.bmp: alpha channel -> writing c.png" in err
    assert cv2.imread(str(outd / "c.png"),
                      cv2.IMREAD_UNCHANGED).shape == (10, 14, 4)
    assert sorted(p.name for p in outd.iterdir()) == [
        "a.jpg", "a.png.jpg", "c.png"]


def test_cli_image_dir_format_webp_keeps_alpha(tmp_path, capsys):
    """-f webp can carry alpha, so the alpha input does NOT retarget."""
    ind = tmp_path / "in"
    ind.mkdir()
    cv2.imwrite(str(ind / "c.bmp"), _rs(10).randint(0, 256, (5, 7, 4),
                                                    np.uint8))
    outd = tmp_path / "out"
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32", "-f", "webp"])
    err = capsys.readouterr().err
    assert rc == 0, err
    assert "alpha channel" not in err
    assert cv2.imread(str(outd / "c.webp"),
                      cv2.IMREAD_UNCHANGED).shape == (10, 14, 4)


def test_cli_single_image_format_must_match_output(tmp_path, capsys):
    """In single-file mode the output path names the format; a
    conflicting -f is refused (writing jpg bytes under .png would lie),
    a matching one (incl. jpg==jpeg) is accepted."""
    inp = str(tmp_path / "in.png")
    assert cv2.imwrite(inp, _rs(11).randint(0, 256, (6, 8, 3), np.uint8))
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o.png"),
                  "--dtype", "float32", "-f", "jpg"])
    assert rc == 2
    assert "conflicts with the output extension" in \
        capsys.readouterr().err
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o.jpeg"),
                  "--dtype", "float32", "-f", "jpg"])
    assert rc == 0
    assert cv2.imread(str(tmp_path / "o.jpeg")).shape == (12, 16, 3)


def test_cli_video_mode_rejects_format(tmp_path, capsys):
    import fractions

    from reve_tpu.io import writer as writer_mod
    from reve_tpu.io.reader import SyntheticReader

    inp = str(tmp_path / "in.y4m")
    with writer_mod.Y4MWriter(inp, 24, 16, fractions.Fraction(24)) as wr:
        for i in range(4):
            wr.write(SyntheticReader.frame(i, 16, 24))
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o.y4m"),
                  "--yes", "--io-backend", "y4m", "-f", "png"])
    assert rc == 2
    assert "--format applies to image" in capsys.readouterr().err


def test_cli_image_dir_format_literal_name_owns_slot(tmp_path, capsys):
    """An input whose filename already IS the --format target name owns
    that output slot even when a sibling's stem maps onto it earlier in
    sort order — otherwise the sibling's output shadows it and the
    skip-exists check silently never upscales the real a.jpg."""
    ind = tmp_path / "in"
    ind.mkdir()
    rs = _rs(12)
    a_bmp = rs.randint(0, 256, (6, 6, 3), np.uint8)   # sorts first
    a_jpg = rs.randint(0, 256, (8, 10, 3), np.uint8)
    cv2.imwrite(str(ind / "a.bmp"), a_bmp)
    cv2.imwrite(str(ind / "a.jpg"), a_jpg)
    outd = tmp_path / "out"
    rc = cli.run(["-i", str(ind), "-s", "2", str(outd),
                  "--dtype", "float32", "-f", "jpg"])
    err = capsys.readouterr().err
    assert rc == 0, err
    assert "a.bmp: output name taken -> writing a.bmp.jpg" in err
    # a.jpg keeps its identity slot, upscaled from a.jpg's own content
    assert cv2.imread(str(outd / "a.jpg")).shape == (16, 20, 3)
    assert cv2.imread(str(outd / "a.bmp.jpg")).shape == (12, 12, 3)
    assert "done: 2 upscaled" in err
