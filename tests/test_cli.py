"""CLI tests: arg validation parity with the reference (lib.rs:209-280) and
non-interactive end-to-end runs with the real engine."""

import fractions
import os

import numpy as np
import pytest

from reve_tpu import cli
from reve_tpu.io import reader, writer

TEST_MP4 = "/root/reference/reve-cli/assets/test.mp4"


# -- validation parity -----------------------------------------------------

def test_missing_input_rejected(tmp_path, capsys):
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["-i", str(tmp_path / "nope.mp4"), "-s", "2", "out.mp4"]
        )


def test_bad_extension_rejected(tmp_path):
    p = tmp_path / "x.avi"
    p.write_text("")
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(["-i", str(p), "-s", "2", "out.mp4"])


def test_scale_range(tmp_path):
    p = tmp_path / "x.mp4"
    p.write_text("")
    for bad in ("1", "5", "0"):
        with pytest.raises(SystemExit):
            cli.build_parser().parse_args(
                ["-i", str(p), "-s", bad, "out.mp4"]
            )
    args = cli.build_parser().parse_args(["-i", str(p), "-s", "3", "o.mp4"])
    assert args.scale == 3


def test_crf_and_preset_validation(tmp_path):
    p = tmp_path / "x.mp4"
    p.write_text("")
    base = ["-i", str(p), "-s", "2", "o.mp4"]
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(base + ["-c", "52"])
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(base + ["-p", "turbo"])
    args = cli.build_parser().parse_args(base + ["-c", "0", "-p", "veryslow"])
    assert args.crf == 0 and args.preset == "veryslow"


def test_defaults_match_reference(tmp_path):
    p = tmp_path / "x.mp4"
    p.write_text("")
    args = cli.build_parser().parse_args(["-i", str(p), "-s", "2", "o.mp4"])
    assert args.segmentsize == 1000
    assert args.crf == 15
    assert args.preset == "slow"
    assert args.x265params == "psy-rd=2:aq-strength=1:deblock=0,0:bframes=8"


def test_existing_output_refused(tmp_path):
    inp = tmp_path / "in.mp4"
    inp.write_text("")
    out = tmp_path / "out.mp4"
    out.write_text("")
    rc = cli.run(["-i", str(inp), "-s", "2", str(out), "--yes"])
    assert rc == 2


def test_mkv_to_mp4_refused(tmp_path):
    inp = tmp_path / "in.mkv"
    inp.write_text("")
    rc = cli.run(["-i", str(inp), "-s", "2",
                  str(tmp_path / "out.mp4"), "--yes"])
    assert rc == 2


# -- weights are a product requirement (round-4 VERDICT #1) ----------------

def test_cli_refuses_video_job_without_weights(tmp_path, monkeypatch,
                                               capsys):
    """A default run with no resolvable weights exits non-zero BEFORE any
    decode or workspace creation, naming the model, the search path, and
    how to supply weights (the reference cannot run without model files,
    reve-shared/src/lib.rs:140-143)."""
    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)
    inp = tmp_path / "in.mp4"
    inp.write_text("")  # never decoded: the refusal comes first
    out = tmp_path / "out.mp4"
    rc = cli.run(["-i", str(inp), "-s", "2", str(out), "--yes"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "no weights found for model 'realesr-animevideov3'" in err
    assert "realesr-animevideov3-x2.pth" in err
    assert "--allow-random-init" in err
    assert "REVE_TPU_ALLOW_RANDOM_INIT" in err
    assert not os.path.exists(str(out) + ".revework")  # no workspace made


def test_cli_refuses_image_job_without_weights(tmp_path, monkeypatch,
                                               capsys):
    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)
    inp = tmp_path / "in.png"
    inp.write_bytes(b"")
    rc = cli.run(["-i", str(inp), "-s", "4", str(tmp_path / "out.png")])
    assert rc == 2
    assert "no weights found" in capsys.readouterr().err


def test_cli_allow_random_init_flag(tmp_path, monkeypatch):
    """--allow-random-init restores the hermetic-test behavior: the full
    pipeline runs on deterministic random weights."""
    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "out.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--allow-random-init",
                  "--io-backend", "y4m", "-S", "4", "--batch", "3",
                  "--dtype", "float32"])
    assert rc == 0
    assert reader.Y4MReader(out).frame_count() == 10


def test_cli_real_weights_need_no_optin(tmp_path, monkeypatch):
    """With actual weights on disk (-m DIR), no opt-in is needed — the
    product flow users run."""
    pytest.importorskip("torch")
    import jax

    from reve_tpu.models import srvgg
    from reve_tpu.weights.torch_loader import save_srvgg_pth

    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)
    mdir = tmp_path / "models"
    mdir.mkdir()
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8, upscale=2)
    save_srvgg_pth(str(mdir / "realesr-animevideov3-x2.pth"), cfg,
                   srvgg.init_params(jax.random.key(3), cfg))
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "out.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "-m", str(mdir),
                  "--io-backend", "y4m", "-S", "4", "--batch", "3",
                  "--dtype", "float32"])
    assert rc == 0
    assert reader.Y4MReader(out).frame_count() == 10


def test_api_refuses_without_weights(tmp_path, monkeypatch):
    import reve_tpu
    from reve_tpu.models import registry

    monkeypatch.delenv("REVE_TPU_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "out.y4m")
    with pytest.raises(registry.MissingWeightsError):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m")
    assert not os.path.exists(out + ".revework")  # raised before workspace
    with pytest.raises(registry.MissingWeightsError):
        reve_tpu.upscale_image(str(tmp_path / "in.png"),
                               str(tmp_path / "out.png"), scale=2)


# -- end-to-end with the real engine (random-init weights, CPU) ------------

def _small_y4m(tmp_path, frames=10, w=24, h=16):
    path = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(path, w, h, fractions.Fraction(24)) as wr:
        for i in range(frames):
            wr.write(reader.SyntheticReader.frame(i, h, w))
    return path


def test_cli_end_to_end_y4m(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "out.y4m")
    rc = cli.run([
        "-i", inp, "-s", "2", out, "--yes",
        "--io-backend", "y4m", "-S", "4", "--batch", "3",
        "--dtype", "float32",
    ])
    assert rc == 0
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height) == (48, 32)
    assert rd.frame_count() == 10
    assert not os.path.exists(out + ".revework")  # workspace cleaned


@pytest.mark.skipif(not os.path.exists(TEST_MP4), reason="asset missing")
def test_cli_end_to_end_mp4(tmp_path):
    """Short clip of the reference's own test asset through the cv2 stack —
    the analog of reve-cli/tests/run_test.rs."""
    import cv2

    # take the first 12 frames of the reference fixture
    clip = str(tmp_path / "clip.mp4")
    cap = cv2.VideoCapture(TEST_MP4)
    wr = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 24, (100, 100))
    for _ in range(12):
        ok, frame = cap.read()
        assert ok
        wr.write(frame)
    wr.release()
    cap.release()

    out = str(tmp_path / "out.mp4")
    rc = cli.run([
        "-i", clip, "-s", "2", out, "--yes", "-S", "5", "--batch", "4",
        "--io-backend", "cv2", "--dtype", "float32",
    ])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 200
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


def test_cli_end_to_end_mkv(tmp_path):
    """mkv -> mkv through the cv2 stack (the reference's second container;
    mkv output requires mkv input rule already covered above).  The input
    mkv carries an audio track, which must survive into the output with no
    re-encode and no ffmpeg binary (reve-shared/src/lib.rs:181-204)."""
    import cv2

    from reve_tpu import native

    clip_mp4 = str(tmp_path / "clip.mp4")
    wr = cv2.VideoWriter(clip_mp4, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                         (64, 48))
    for i in range(8):
        wr.write(np.full((48, 64, 3), 30 + i * 20, np.uint8))
    wr.release()
    clip = str(tmp_path / "clip.mkv")
    audio_src = TEST_MP4 if os.path.exists(TEST_MP4) else None
    native.concat_mkv([clip_mp4], audio_src, clip)

    out = str(tmp_path / "out.mkv")
    rc = cli.run([
        "-i", clip, "-s", "2", out, "--yes", "-S", "5", "--batch", "4",
        "--io-backend", "cv2", "--dtype", "float32",
    ])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    # NB: CAP_PROP_FRAME_COUNT estimates from duration x fps for mkv (the
    # audio track outlives the video) — count actual decoded frames instead
    decoded = 0
    while cap.read()[0]:
        decoded += 1
    cap.release()
    assert decoded == 8
    info = native.probe_mkv(out)
    assert info["video_blocks"] == 8
    if audio_src:
        assert info["has_audio"] is True  # audio carried, no re-encode


def test_list_models(capsys):
    rc = cli.run(["--list-models"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "realesr-animevideov3" in out
    assert "realesrgan-x4plus" in out


def test_non_tty_resume_requires_yes(tmp_path, monkeypatch):
    """A non-interactive run (no tty) that finds prior work must abort with
    a message instead of silently resuming — the reference requires an
    explicit confirm (reve-cli/src/main.rs:47-90); --yes is the scripted
    consent."""
    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "out.y4m")
    args = ["-i", inp, "-s", "2", out, "--io-backend", "y4m", "-S", "4",
            "--batch", "3", "--dtype", "float32"]
    # plant an interrupted job
    rc = cli.run(args + ["--yes", "--keep-workspace"])
    assert rc == 0
    os.unlink(out)
    with pytest.raises(SystemExit, match="pass --yes"):
        cli.run(args)  # pytest runs without a tty stdin
    # with --yes it resumes (all parts already present)
    assert cli.run(args + ["--yes"]) == 0
    assert reader.Y4MReader(out).frame_count() == 10


@pytest.mark.slow
def test_ctrl_c_graceful_interrupt(tmp_path):
    """SIGINT mid-job: clean message, exit 130, committed parts + state
    survive, and rerunning the same command resumes to a frame-exact
    output."""
    import signal
    import subprocess
    import sys
    import time as time_mod

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(36):
            wr.write(np.full((24, 32, 3), 10 + 5 * i, np.uint8))
    out = str(tmp_path / "out.y4m")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["REVE_TEST_SLOW_SEGMENT"] = "0.4"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\nfrom reve_tpu import cli\n"
        f"sys.exit(cli.run(['-i', {inp!r}, '-s', '2', {out!r}, '--yes',"
        "'--io-backend', 'y4m', '-S', '6', '--batch', '4',"
        "'--dtype', 'float32']))"
    )
    p = subprocess.Popen([sys.executable, "-c", code], env=env,
                         cwd=str(tmp_path), stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    ws_parts = os.path.join(out + ".revework", "parts")
    deadline = time_mod.time() + 90
    while time_mod.time() < deadline:
        if os.path.isdir(ws_parts) and any(
            f.endswith(".y4m") for f in os.listdir(ws_parts)
        ):
            break
        time_mod.sleep(0.05)
    else:
        p.kill()
        raise AssertionError("no part committed in time")
    p.send_signal(signal.SIGINT)
    stdout, stderr = p.communicate(timeout=60)
    assert p.returncode == 130, (p.returncode, stderr[-800:])
    assert "interrupted" in stderr and "resume" in stderr
    assert os.path.exists(os.path.join(out + ".revework", "state.json"))

    env.pop("REVE_TEST_SLOW_SEGMENT")
    p2 = subprocess.run([sys.executable, "-c", code], env=env,
                        cwd=str(tmp_path), capture_output=True, text=True,
                        timeout=120)
    assert p2.returncode == 0, p2.stderr[-800:]
    assert "resuming" in p2.stderr
    rd = reader.Y4MReader(out)
    assert rd.frame_count() == 36


def test_cli_end_to_end_odd_dims(tmp_path, monkeypatch):
    """Odd width/height e2e via the cv2/mp4 stack (yuv420 containers cannot
    carry odd dims — the writers reject those with a clear message; mp4v
    via cv2 handles the padding internally).  The s2d stack pads+masks
    internally for the odd heights."""
    import cv2

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "odd.mp4")
    wr = cv2.VideoWriter(inp, cv2.VideoWriter_fourcc(*"mp4v"), 24, (25, 17))
    for i in range(7):
        wr.write(np.full((17, 25, 3), 40 + 20 * i, np.uint8))
    wr.release()
    # cv2/mp4v itself rounds odd dims down (stores 24x16) — 4:2:0 video
    # containers cannot carry odd dims anywhere in this ecosystem; the
    # pipeline must stay consistent with the dims the probe reports
    out = str(tmp_path / "out.mp4")
    rc = cli.run(["-i", inp, "-s", "3", out, "--yes", "--io-backend", "cv2",
                  "-S", "3", "--batch", "2", "--dtype", "float32"])
    assert rc == 0
    from reve_tpu.io import probe as probe_mod

    info = probe_mod.probe(inp, backend="cv2")
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == info.width * 3
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == info.height * 3
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 7


def test_y4m_writer_rejects_odd_dims(tmp_path):
    with pytest.raises(ValueError, match="even dimensions"):
        writer.Y4MWriter(str(tmp_path / "x.y4m"), 25, 16,
                         fractions.Fraction(24))


@pytest.mark.slow
def test_repeated_kill_resume_soak(tmp_path):
    """Kill the job at several different points; every resume must pick up
    from committed parts and the final output must be frame-exact — the
    reference's flagship property (README.md:19), stress-tested."""
    import subprocess
    import sys
    import time as time_mod

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = str(tmp_path / "in.y4m")
    n_frames = 30
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(n_frames):
            wr.write(np.full((24, 32, 3), 15 + 7 * i, np.uint8))
    out = str(tmp_path / "out.y4m")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["REVE_TEST_SLOW_SEGMENT"] = "0.25"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\nfrom reve_tpu import cli\n"
        f"sys.exit(cli.run(['-i', {inp!r}, '-s', '2', {out!r}, '--yes',"
        "'--io-backend', 'y4m', '-S', '5', '--batch', '4',"
        "'--dtype', 'float32']))"
    )
    parts_dir = os.path.join(out + ".revework", "parts")

    def run_until_parts(min_parts, timeout=120):
        p = subprocess.Popen([sys.executable, "-c", code], env=env,
                             cwd=str(tmp_path), stdout=subprocess.DEVNULL,
                             stderr=subprocess.PIPE, text=True)
        deadline = time_mod.time() + timeout
        while time_mod.time() < deadline:
            if p.poll() is not None:
                return p  # finished on its own
            done = [f for f in os.listdir(parts_dir)
                    if f.endswith(".y4m") and ".tmp" not in f] \
                if os.path.isdir(parts_dir) else []
            if len(done) >= min_parts:
                p.kill()  # SIGKILL mid-flight
                p.wait(timeout=30)
                return p
            time_mod.sleep(0.05)
        p.kill()
        raise AssertionError("timeout waiting for parts")

    for kill_at in (1, 2, 4):
        p = run_until_parts(kill_at)
        if p.returncode == 0:
            break  # finished before we could kill it — fine
    # final run to completion (no slow hook)
    env.pop("REVE_TEST_SLOW_SEGMENT")
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=str(tmp_path), capture_output=True, text=True,
                         timeout=180)
    assert res.returncode == 0, res.stderr[-800:]
    rd = reader.Y4MReader(out)
    assert rd.frame_count() == n_frames
    lumas = [int(f[12, 16, 0]) for f in rd.read_range(0, n_frames)]
    diffs = [b - a for a, b in zip(lumas, lumas[1:])]
    assert all(5 <= d <= 9 for d in diffs), (lumas, diffs)


def test_segmentsize_accepts_both_spellings(tmp_path):
    """The reference README documents -P; its source implements -S — accept
    both (README.md:54 vs reve-shared/src/lib.rs:220)."""
    p = tmp_path / "x.mp4"
    p.write_text("")
    for flag in ("-S", "-P", "--segmentsize"):
        args = cli.build_parser().parse_args(
            ["-i", str(p), "-s", "2", flag, "77", "o.mp4"])
        assert args.segmentsize == 77


def test_cli_mp4_input_mkv_output(tmp_path):
    """mp4 in -> mkv out is allowed (the reference only forbids mkv->mp4,
    reve-cli/src/main.rs:124-140); audio from the mp4 original is remuxed
    into the Matroska output by the native muxer."""
    import cv2

    from reve_tpu import native

    clip = str(tmp_path / "clip.mp4")
    wr = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48))
    for i in range(6):
        wr.write(np.full((48, 64, 3), 40 + i * 20, np.uint8))
    wr.release()
    out = str(tmp_path / "out.mkv")
    rc = cli.run(["-i", clip, "-s", "2", out, "--yes", "-S", "4",
                  "--batch", "3", "--io-backend", "cv2",
                  "--dtype", "float32"])
    assert rc == 0
    info = native.probe_mkv(out)
    assert info["video_blocks"] == 6 and info["width"] == 128
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 6


def test_progress_json_stream(tmp_path, monkeypatch):
    import json

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path, frames=12)
    out = str(tmp_path / "out.y4m")
    pj = str(tmp_path / "progress.jsonl")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                  "-S", "4", "--batch", "3", "--dtype", "float32",
                  "--progress-json", pj])
    assert rc == 0
    lines = [json.loads(x) for x in open(pj) if x.strip()]
    assert lines, "no progress snapshots written"
    last = lines[-1]
    assert {"decode", "upscale", "encode"} <= set(last)


# ---------------------------------------------------------------- image mode


def test_cli_single_image(tmp_path, monkeypatch):
    """`-i in.png -s 2 out.png` — the replaced ncnn engine's own surface."""
    import cv2

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "in.png")
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (20, 28, 3), np.uint8)
    assert cv2.imwrite(inp, img[:, :, ::-1])
    out = str(tmp_path / "out.png")
    rc = cli.run(["-i", inp, "-s", "2", out, "--dtype", "float32",
                  "--batch", "1"])
    assert rc == 0
    got = cv2.imread(out, cv2.IMREAD_COLOR)[:, :, ::-1]
    assert got.shape == (40, 56, 3)
    # matches the engine's own output exactly (png is lossless)
    from reve_tpu.pipeline.engine import UpscaleEngine

    eng = UpscaleEngine(scale=2, batch_size=1, compute_dtype="float32")
    want = eng.upscale_frames(img[None])[0]
    np.testing.assert_array_equal(got, want)


def test_cli_image_requires_image_output(tmp_path, capsys):
    import cv2

    inp = str(tmp_path / "in.jpg")
    cv2.imwrite(inp, np.zeros((8, 8, 3), np.uint8))
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "out.mp4")])
    assert rc == 2
    assert "image output" in capsys.readouterr().err


def test_cli_image_existing_output_refused(tmp_path, capsys):
    import cv2

    inp = str(tmp_path / "in.png")
    cv2.imwrite(inp, np.zeros((8, 8, 3), np.uint8))
    out = str(tmp_path / "out.png")
    open(out, "w").close()
    rc = cli.run(["-i", inp, "-s", "2", out])
    assert rc == 2
    assert "already exists" in capsys.readouterr().err


# --------------------------------------------------------------- python api


def test_api_upscale_video_and_resume_signature(tmp_path, monkeypatch):
    import reve_tpu

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "api_out.y4m")
    report = reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                                    segment_size=4, batch=3,
                                    dtype="float32")
    assert report["backend"] in ("native", "y4m")
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (48, 32, 10)
    with pytest.raises(FileExistsError):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m")


def test_api_progress_callback(tmp_path, monkeypatch):
    import reve_tpu

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "prog_out.y4m")
    snaps = []
    reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                           segment_size=4, batch=3, dtype="float32",
                           on_progress=snaps.append)
    assert snaps, "callback never fired"
    last = snaps[-1]
    assert set(last) == {"decode", "upscale", "encode", "total",
                         "x_realtime"}
    assert last["encode"]["done"] == last["encode"]["total"] == 10
    assert last["total"]["done"] == last["total"]["total"] == 3


def test_api_scene_align(tmp_path, monkeypatch):
    """scene_align=True plans cut-snapped segments; output stays exact."""
    import reve_tpu

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "cuts.y4m")
    w = writer.Y4MWriter(inp, 48, 32, fractions.Fraction(30, 1))
    for i in range(12):
        w.write(np.full((32, 48, 3), 20 if i < 6 else 220, np.uint8))
    w.close()
    out = str(tmp_path / "sa_out.y4m")
    reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                           segment_size=5, batch=3, dtype="float32",
                           scene_align=True)
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (96, 64, 12)


def test_api_scene_align_plan_survives_resume(tmp_path, monkeypatch):
    """A crashed scene-aligned job must resume with the SAME (non-uniform)
    boundaries: the plan is persisted in state, not re-derived uniform."""
    import reve_tpu
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.state import Workspace

    monkeypatch.chdir(tmp_path)
    inp = str(tmp_path / "cuts.y4m")
    w = writer.Y4MWriter(inp, 48, 32, fractions.Fraction(30, 1))
    for i in range(12):
        w.write(np.full((32, 48, 3), 20 if i < 6 else 220, np.uint8))
    w.close()
    out = str(tmp_path / "sa_out.y4m")

    real_run = sched_mod.PipelineJob.run

    def crash(self):
        raise RuntimeError("simulated crash before any segment")

    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    with pytest.raises(RuntimeError):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                               segment_size=5, batch=3, dtype="float32",
                               scene_align=True)
    st = Workspace(out + ".revework").load()
    assert st.plan is not None
    aligned = [(s.start, s.size) for s in st.plan]
    assert aligned != [(0, 5), (5, 5), (10, 2)], "plan was not snapped"

    monkeypatch.setattr(sched_mod.PipelineJob, "run", real_run)
    reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                           segment_size=5, batch=3, dtype="float32",
                           scene_align=True)
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (96, 64, 12)


def test_api_resume_restores_saved_opts(tmp_path, monkeypatch):
    """upscale_video's resume must restore weights/dtype/io_backend from
    the saved state (and refuse a model/scale mismatch) exactly like
    cli.run — different kwargs on the resume call must not orphan
    committed parts (changed part_ext) or switch engines mid-job."""
    import reve_tpu
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.state import Workspace

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "opts_out.y4m")
    real_run = sched_mod.PipelineJob.run

    def crash(self):
        raise RuntimeError("simulated crash before any segment")

    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    with pytest.raises(RuntimeError):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                               segment_size=4, batch=3, dtype="float32")
    st = Workspace(out + ".revework").load()
    assert st.opts == {"weights": None, "dtype": "float32",
                       "int8_calib": "p99.9", "tta": False,
                       "io_backend": "y4m", "allow_random_init": True}

    monkeypatch.setattr(sched_mod.PipelineJob, "run", real_run)
    with pytest.raises(ValueError, match="holds progress"):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                               segment_size=4, model="some-other-model")
    # resume with DIFFERENT dtype/io_backend kwargs: saved opts win
    reve_tpu.upscale_video(inp, out, scale=2, io_backend=None,
                           segment_size=4, batch=3, dtype="bfloat16")
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (48, 32, 10)


def test_cli_resume_restores_saved_opts(tmp_path, monkeypatch, capsys):
    """A resume run uses the SETTINGS the job was started with (reference
    semantics: args.temp, main.rs:92-101) — a different --io-backend or
    --dtype on the resume command line must not orphan committed parts or
    change the engine mid-job."""
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.state import Workspace

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "r_out.y4m")

    real_run = sched_mod.PipelineJob.run

    def crash(self):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    with pytest.raises(RuntimeError):
        cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                 "-S", "4", "--batch", "3", "--dtype", "float32"])
    st = Workspace(out + ".revework").load()
    assert st.opts["io_backend"] == "y4m"
    assert st.opts["dtype"] == "float32"

    monkeypatch.setattr(sched_mod.PipelineJob, "run", real_run)
    # resume WITHOUT --io-backend/--dtype and with a DIFFERENT -s: saved
    # opts and saved scale win (reference args.temp semantics), noisily
    rc = cli.run(["-i", inp, "-s", "3", out, "--yes", "-S", "4",
                  "--batch", "3"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "using saved --io-backend" in err
    assert "using saved -s 2" in err
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (48, 32, 10)

    # different --model on resume is refused with guidance
    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    out2 = str(tmp_path / "r2_out.y4m")
    with pytest.raises(RuntimeError):
        cli.run(["-i", inp, "-s", "2", out2, "--yes", "--io-backend",
                 "y4m", "-S", "4", "--dtype", "float32"])
    monkeypatch.setattr(sched_mod.PipelineJob, "run", real_run)
    rc = cli.run(["-i", inp, "-s", "2", out2, "--yes", "--io-backend",
                  "y4m", "--model", "realesr-general-x4v3", "-s", "4"])
    assert rc == 2
    assert "same --model" in capsys.readouterr().err


def test_api_upscale_image(tmp_path):
    import cv2

    import reve_tpu

    inp = str(tmp_path / "in.png")
    cv2.imwrite(inp, np.zeros((12, 16, 3), np.uint8))
    out = str(tmp_path / "out.png")
    w, h = reve_tpu.upscale_image(inp, out, scale=3, dtype="float32")
    assert (w, h) == (48, 36)
    assert cv2.imread(out).shape == (36, 48, 3)


def test_int8_flags_require_int8_dtype(tmp_path, capsys):
    """--int8-gate/--int8-calib silently doing nothing would let an
    operator believe certification ran on a bf16 job (round-3 review):
    both are refused up front unless --dtype int8 (or auto, where they
    configure the turbo candidate) is selected."""
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 16, 16, fractions.Fraction(24)) as wr:
        for _ in range(3):
            wr.write(np.zeros((16, 16, 3), np.uint8))
    out = str(tmp_path / "out.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "--dtype", "bfloat16", "--int8-gate", "50"])
    assert rc == 2
    assert "--dtype int8 or auto" in capsys.readouterr().err
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "--dtype", "float32", "--int8-calib", "p99.9"])
    assert rc == 2
    assert not os.path.exists(out)

    # image mode never certifies: a gate there is an error, not a no-op
    import cv2

    img = str(tmp_path / "in.png")
    cv2.imwrite(img, np.zeros((8, 8, 3), np.uint8))
    rc = cli.run(["-i", img, "-s", "2", str(tmp_path / "o.png"), "--yes",
                  "--dtype", "int8", "--int8-gate", "50"])
    assert rc == 2
    assert "image" in capsys.readouterr().err


def test_cli_resume_restores_tta(tmp_path, monkeypatch, capsys):
    """A job started with --tta must finish with --tta on resume even if
    the resume command line drops the flag (mixing ensembled and
    single-pass segments in one output would violate the restore
    contract like a dtype flip)."""
    from reve_tpu.pipeline import scheduler as sched_mod
    from reve_tpu.pipeline.state import Workspace

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "tta_out.y4m")

    real_run = sched_mod.PipelineJob.run

    def crash(self):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(sched_mod.PipelineJob, "run", crash)
    with pytest.raises(RuntimeError):
        cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend", "y4m",
                 "-S", "4", "--batch", "3", "--dtype", "float32", "--tta"])
    assert Workspace(out + ".revework").load().opts["tta"] is True

    captured_engines = []
    monkeypatch.setattr(sched_mod.PipelineJob, "run",
                        lambda self: (captured_engines.append(self.engine),
                                      real_run(self))[1])
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "-S", "4",
                  "--batch", "3"])
    assert rc == 0
    assert "using saved --tta=True" in capsys.readouterr().err
    assert captured_engines[0].tta is True
    rd = reader.Y4MReader(out)
    assert (rd.width, rd.height, rd.frame_count()) == (48, 32, 10)


def test_cli_device_pinning(tmp_path, monkeypatch, capsys):
    """--device N pins the engine to jax.devices()[N] (the ncnn engine's
    -g gpu-id: one --shard-worker per chip on a multi-chip host); out of
    range is a clean exit-2 error naming the device count."""
    import jax

    from reve_tpu.pipeline import scheduler as sched_mod

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "dev_out.y4m")

    captured = []
    real_run = sched_mod.PipelineJob.run
    monkeypatch.setattr(sched_mod.PipelineJob, "run",
                        lambda self: (captured.append(self.engine),
                                      real_run(self))[1])
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "--dtype", "float32", "--device", "3"])
    assert rc == 0
    assert captured[0].device == jax.devices()[3]  # conftest: 8 virtual

    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "dev2.y4m"),
                  "--yes", "--io-backend", "y4m", "--device", "99"])
    assert rc == 2
    assert "out of range" in capsys.readouterr().err


def test_api_resume_refuses_denoise_opts(tmp_path, monkeypatch):
    """upscale_video() has no denoise kwarg: resuming a CLI --denoise
    workspace must refuse (the committed segments were upscaled with
    dni-interpolated weights the API cannot reconstruct), not silently
    finish the video with plain weights."""
    import reve_tpu
    from reve_tpu.pipeline import state as state_mod
    from reve_tpu.pipeline.planner import plan_segments as plan

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "dni_out.y4m")
    ws = state_mod.Workspace(out + ".revework")
    ws.create()
    ws.save(state_mod.JobState(
        input_path=inp, output_path=out, scale=2, segment_size=4,
        frame_count=10, fps_num=24, fps_den=1, width=24, height=16,
        pending=plan(10, 4),
        opts={"denoise": 0.5, "weights_wdn": "wdn.pth",
              "io_backend": "y4m"},
    ))
    with pytest.raises(ValueError, match="denoise"):
        reve_tpu.upscale_video(inp, out, scale=2, io_backend="y4m",
                               segment_size=4, batch=3, dtype="float32")
    assert ws.has_state()  # untouched: the CLI can still resume it


def test_cli_multi_device_mesh(tmp_path, monkeypatch):
    """--device 0,1 (the ncnn engine's multi-GPU `-g 0,1`) builds a local
    dp mesh and shards each batch over it; the output is bit-identical to
    the single-device run (frames are independent)."""
    from reve_tpu.pipeline import scheduler as sched_mod

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    out1 = str(tmp_path / "one.y4m")
    out2 = str(tmp_path / "two.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out1, "--yes", "--io-backend",
                  "y4m", "--dtype", "float32", "--batch", "2"])
    assert rc == 0

    captured = []
    real_run = sched_mod.PipelineJob.run
    monkeypatch.setattr(sched_mod.PipelineJob, "run",
                        lambda self: (captured.append(self.engine),
                                      real_run(self))[1])
    rc = cli.run(["-i", inp, "-s", "2", out2, "--yes", "--io-backend",
                  "y4m", "--dtype", "float32", "--batch", "2",
                  "--device", "0,1"])
    assert rc == 0
    eng = captured[0]
    assert eng.device is None
    assert eng.mesh is not None and eng.mesh.shape["dp"] == 2
    with open(out1, "rb") as f1, open(out2, "rb") as f2:
        assert f1.read() == f2.read()


def test_cli_multi_device_validation(tmp_path, capsys):
    inp = _small_y4m(tmp_path)
    for i, (extra, msg) in enumerate([
        (["--device", "0,0"], "must be distinct"),
        (["--device", "0,junk"], "comma list"),
        (["--device", "0,99"], "out of range"),
        # default --batch 4 is not a multiple of 3 devices
        (["--device", "0,1,2"], "must be a multiple of the --device"),
    ]):
        rc = cli.run(["-i", inp, "-s", "2",
                      str(tmp_path / f"o{i}.y4m"), "--yes",
                      "--io-backend", "y4m"] + extra)
        assert rc == 2, (extra, msg)
        assert msg in capsys.readouterr().err, (extra, msg)


def test_cli_image_mode_rejects_multi_device(tmp_path, capsys):
    import cv2
    import numpy as np

    inp = str(tmp_path / "in.png")
    assert cv2.imwrite(inp, np.zeros((6, 8, 3), np.uint8))
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o.png"),
                  "--dtype", "float32", "--device", "0,1"])
    assert rc == 2
    assert "single --device index" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_models_dir(tmp_path, monkeypatch, capsys):
    """--models-dir DIR (the ncnn engine's -m model-path): --model's
    weights resolve from DIR; a directory holding no matching weights is
    a clean exit-2 error, NOT a silent random-init fallback."""
    pytest.importorskip("torch")
    import jax as jax_mod

    from test_acceptance import make_pth
    from reve_tpu.models import srvgg as srvgg_mod
    from reve_tpu.pipeline import scheduler as sched_mod

    cfg = srvgg_mod.SRVGGConfig(num_feat=8, num_conv=2, upscale=2)
    params = srvgg_mod.init_params(jax_mod.random.key(1), cfg)
    mdir = tmp_path / "zoo"
    mdir.mkdir()
    make_pth(cfg, params, mdir / "realesr-animevideov3-x2.pth")

    monkeypatch.chdir(tmp_path)
    inp = _small_y4m(tmp_path)
    captured = []
    real_run = sched_mod.PipelineJob.run
    monkeypatch.setattr(sched_mod.PipelineJob, "run",
                        lambda self: (captured.append(self.engine),
                                      real_run(self))[1])
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "out.y4m"),
                  "--yes", "--io-backend", "y4m", "--dtype", "float32",
                  "-m", str(mdir)])
    assert rc == 0
    # the 8-feat zoo checkpoint, not the registry's 64-feat random init
    assert captured[0].cfg.num_feat == 8

    empty = tmp_path / "empty"
    empty.mkdir()
    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o2.y4m"),
                  "--yes", "--io-backend", "y4m", "-m", str(empty)])
    assert rc == 2
    assert "no weights for" in capsys.readouterr().err

    rc = cli.run(["-i", inp, "-s", "2", str(tmp_path / "o3.y4m"),
                  "--yes", "--io-backend", "y4m",
                  "-m", str(tmp_path / "nosuch")])
    assert rc == 2
    assert "not a directory" in capsys.readouterr().err


def test_api_device_and_mesh(tmp_path):
    """Library parity with --device: an int pins to jax.devices()[N]; a
    dp mesh shards batches (bit-identical output); both together raise
    BEFORE any workspace is created."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    import reve_tpu

    inp = _small_y4m(tmp_path)
    out1 = str(tmp_path / "a1.y4m")
    out2 = str(tmp_path / "a2.y4m")
    reve_tpu.upscale_video(inp, out1, scale=2, io_backend="y4m",
                           dtype="float32", batch=2, segment_size=4,
                           device=3)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    reve_tpu.upscale_video(inp, out2, scale=2, io_backend="y4m",
                           dtype="float32", batch=2, segment_size=4,
                           mesh=mesh)
    with open(out1, "rb") as f1, open(out2, "rb") as f2:
        assert f1.read() == f2.read()

    out3 = str(tmp_path / "a3.y4m")
    with pytest.raises(ValueError, match="mutually exclusive"):
        reve_tpu.upscale_video(inp, out3, scale=2, io_backend="y4m",
                               device=0, mesh=mesh)
    with pytest.raises(ValueError, match="multiple of"):
        reve_tpu.upscale_video(inp, out3, scale=2, io_backend="y4m",
                               batch=3, mesh=mesh)
    # the early validation must not leave a workspace behind
    assert not os.path.exists(out3 + ".revework")


def test_int8_calib_grammar_shared_with_engine(tmp_path, capsys):
    """--int8-calib accepts the full engine grammar (any p<percentile>),
    not just the frontier's measured points; invalid specs fail at parse
    with the engine's own message."""
    inp = _small_y4m(tmp_path)
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["-i", inp, "-s", "2", str(tmp_path / "o.y4m"),
             "--int8-calib", "p0"])
    args = cli.build_parser().parse_args(
        ["-i", inp, "-s", "2", str(tmp_path / "o.y4m"),
         "--dtype", "int8", "--int8-calib", "p97.5"])
    assert args.int8_calib == "p97.5"


def test_cli_device_rejection_leaves_no_workspace(tmp_path, capsys):
    """--device/--batch validation runs BEFORE the workspace exists: a
    rejected invocation must not persist a fresh state file whose saved
    opts would hijack the user's next, corrected command."""
    inp = _small_y4m(tmp_path)
    out = str(tmp_path / "o.y4m")
    rc = cli.run(["-i", inp, "-s", "2", out, "--yes", "--io-backend",
                  "y4m", "--dtype", "int8", "--device", "0,1,2"])
    assert rc == 2
    assert "must be a multiple" in capsys.readouterr().err
    assert not os.path.exists(out + ".revework")


def test_list_models_honors_models_dir(tmp_path, capsys):
    pytest.importorskip("torch")
    import jax as jax_mod

    from test_acceptance import make_pth
    from reve_tpu.models import srvgg as srvgg_mod

    cfg = srvgg_mod.SRVGGConfig(num_feat=8, num_conv=2, upscale=2)
    params = srvgg_mod.init_params(jax_mod.random.key(1), cfg)
    mdir = tmp_path / "zoo"
    mdir.mkdir()
    make_pth(cfg, params, mdir / "realesr-animevideov3-x2.pth")
    rc = cli.run(["--list-models", "-m", str(mdir)])
    assert rc == 0
    out = capsys.readouterr().out
    line = next(l for l in out.splitlines()
                if l.startswith("realesr-animevideov3 "))
    assert "weights: x2" in line


def test_api_device_index_validated(tmp_path):
    import reve_tpu

    inp = _small_y4m(tmp_path)
    with pytest.raises(ValueError, match="out of range"):
        reve_tpu.upscale_video(inp, str(tmp_path / "o.y4m"), scale=2,
                               io_backend="y4m", device=99)
    with pytest.raises(ValueError, match="out of range"):
        reve_tpu.upscale_video(inp, str(tmp_path / "o.y4m"), scale=2,
                               io_backend="y4m", device=-1)
    assert not os.path.exists(str(tmp_path / "o.y4m") + ".revework")
    import cv2
    import numpy as np

    png = str(tmp_path / "in.png")
    assert cv2.imwrite(png, np.zeros((6, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        reve_tpu.upscale_image(png, str(tmp_path / "o.png"), device=99)
