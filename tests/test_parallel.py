"""Multi-device tests on the 8-device virtual CPU mesh: sharded-batch
inference, distributed training step, and segment lease sharding."""

import dataclasses
import fractions
import threading

import numpy as np
import pytest
import jax

from reve_tpu.parallel import mesh as mesh_lib
from reve_tpu.pipeline import leases, planner, scheduler, state
from reve_tpu.io import writer, reader


def test_mesh_factoring():
    assert mesh_lib.factor_devices(8) == (4, 2, 1)
    assert mesh_lib.factor_devices(8, max_sp=1) == (8, 1, 1)
    assert mesh_lib.factor_devices(8, max_sp=2, max_tp=2) == (2, 2, 2)
    assert mesh_lib.factor_devices(1) == (1, 1, 1)
    assert mesh_lib.factor_devices(7) == (7, 1, 1)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices"
    )


def test_sharded_engine_matches_single_device():
    from reve_tpu.pipeline.engine import UpscaleEngine

    mesh = mesh_lib.make_mesh(jax.devices(), max_sp=1)  # dp=8
    frames = np.random.RandomState(0).randint(
        0, 256, (8, 16, 20, 3), np.uint8
    )
    kw = dict(model="realesr-animevideov3", scale=2, batch_size=8,
              compute_dtype="float32", tile=-1)
    sharded = UpscaleEngine(mesh=mesh, **kw)
    single = UpscaleEngine(**kw)
    out_s = sharded.submit(frames).result()
    out_1 = single.submit(frames).result()
    assert out_s.shape == (8, 32, 40, 3)
    np.testing.assert_array_equal(out_s, out_1)


def test_sharded_engine_batch_divisibility():
    from reve_tpu.pipeline.engine import UpscaleEngine

    mesh = mesh_lib.make_mesh(jax.devices(), max_sp=1)
    with pytest.raises(ValueError, match="not divisible"):
        UpscaleEngine(batch_size=3, mesh=mesh)


def test_trainer_loss_decreases():
    from reve_tpu.models import srvgg
    from reve_tpu.train.trainer import Trainer, TrainConfig

    mesh = mesh_lib.make_mesh(jax.devices())
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    tr = Trainer(cfg, TrainConfig(learning_rate=3e-3), mesh=mesh)
    rs = np.random.RandomState(0)
    hr = rs.rand(8, 32, 32, 3).astype(np.float32)
    lr = hr[:, ::2, ::2, :]
    losses = [tr.step(lr, hr) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.9, losses[::10]
    assert np.isfinite(tr.eval_psnr(lr, hr))


def test_trainer_ema_tracks_params():
    """EMA follows the upstream convention: ema <- d*ema + (1-d)*params,
    seeded from the init params; export_params returns the EMA copy."""
    from reve_tpu.models import srvgg
    from reve_tpu.train.trainer import Trainer, TrainConfig

    mesh = mesh_lib.make_mesh(jax.devices())
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    tr = Trainer(cfg, TrainConfig(learning_rate=3e-3, ema_decay=0.5),
                 mesh=mesh, seed=3)
    p0 = jax.tree_util.tree_map(np.asarray, tr.params)
    rs = np.random.RandomState(0)
    hr = rs.rand(8, 16, 16, 3).astype(np.float32)
    lr = hr[:, ::2, ::2, :]
    tr.step(lr, hr)
    p1 = jax.tree_util.tree_map(np.asarray, tr.params)
    want = jax.tree_util.tree_map(lambda a, b: 0.5 * a + 0.5 * b, p0, p1)
    got = jax.tree_util.tree_map(np.asarray, tr.ema_params)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, w, rtol=1e-6)
    assert tr.export_params() is tr.ema_params

    # disabled EMA: exports the live params
    tr2 = Trainer(cfg, TrainConfig(ema_decay=0.0), mesh=mesh)
    tr2.step(lr, hr)
    assert tr2.ema_params is None
    assert tr2.export_params() is tr2.params


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


# -- segment lease sharding -------------------------------------------------

class FakeEngine:
    batch_size = 3
    scale = 2

    def submit(self, frames):
        out = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)

        class _P:
            def result(self):
                return out

        return _P()


def _make_job(tmp_path, num_frames=24, seg=4):
    path = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(path, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(num_frames):
            wr.write(np.full((24, 32, 3), 20 + 8 * i, np.uint8))
    ws = state.Workspace(str(tmp_path / "work"))
    ws.create()
    st = state.JobState(
        input_path=path, output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=seg, frame_count=num_frames,
        fps_num=24, fps_den=1, width=32, height=24,
        pending=planner.plan_segments(num_frames, seg),
    )
    ws.save(st)
    return ws, st


def test_lease_claim_release(tmp_path):
    ws, st = _make_job(tmp_path)
    q1 = leases.SegmentLeaseQueue(ws, "w1", part_ext=".y4m")
    q2 = leases.SegmentLeaseQueue(ws, "w2", part_ext=".y4m")
    s1 = q1.claim(st.pending)
    s2 = q2.claim(st.pending)
    assert s1.index != s2.index  # no double-claim
    q1.release(s1)
    s3 = q2.claim(st.pending)
    assert s3.index == s1.index  # released -> claimable


def test_lease_skips_completed(tmp_path):
    ws, st = _make_job(tmp_path)
    with open(ws.part_tmp_path(0, ".y4m"), "w") as f:
        f.write("x")
    ws.commit_part(0, ".y4m")
    q = leases.SegmentLeaseQueue(ws, "w1", part_ext=".y4m")
    assert q.claim(st.pending).index == 1


def test_stale_lease_takeover(tmp_path):
    import os
    import time

    ws, st = _make_job(tmp_path)
    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.2, part_ext=".y4m")
    s = q1.claim(st.pending)
    # w1 "crashes" (no renew); w2 takes over after staleness
    q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.2, part_ext=".y4m")
    assert q2.claim(st.pending).index != s.index  # fresh lease not stolen
    time.sleep(0.3)
    stolen = q2.claim(st.pending)
    assert stolen.index == s.index
    with open(q2._lease_path(s.index)) as f:
        assert f.read() == "w2"
    assert os.path.exists(q2._lease_path(s.index))


def test_renew_reports_lost_ownership(tmp_path):
    """renew() must return False once the lease was stolen (the worker
    stalled past stale_after) so the stalled worker abandons the segment
    instead of racing the takeover worker; a steal racing the utime is
    caught by the post-touch owner re-read."""
    import time

    ws, st = _make_job(tmp_path)
    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.2, part_ext=".y4m")
    s = q1.claim(st.pending)
    assert q1.renew(s) is True
    time.sleep(0.3)
    q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.2, part_ext=".y4m")
    assert q2.claim(st.pending).index == s.index  # stolen
    assert q1.renew(s) is False                   # w1 must notice
    # ...and the thief's lease file still names the thief
    with open(q1._lease_path(s.index)) as f:
        assert f.read() == "w2"


def test_heartbeat_lost_lease_aborts_segment(tmp_path):
    """A worker whose lease is stolen mid-segment must cancel its pipeline
    (on_lost -> job.cancel) and run_sharded must neither raise nor count
    the abandoned segment — two workers must never keep encoding the same
    part."""
    import time

    ws, st = _make_job(tmp_path, num_frames=4, seg=4)  # 1 segment

    class SlowEngine(FakeEngine):
        def submit(self, frames):
            time.sleep(0.8)  # long enough for the steal + heartbeat tick
            return super().submit(frames)

    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.2, part_ext=".y4m")

    # the "takeover" worker force-steals the lease mid-segment (in real
    # life this requires staleness; _steal is called directly to simulate
    # w1 stalling past stale_after without actually sleeping 10 min) and
    # then heartbeats it like a live worker would — otherwise w1 would
    # legitimately re-steal the now-stale lease
    stop_thief = threading.Event()

    def thief():
        time.sleep(0.3)
        q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.2,
                                      part_ext=".y4m")
        q2._steal(q2._lease_path(0))
        seg0 = st.pending[0]
        while not stop_thief.wait(0.05):
            q2.renew(seg0)

    t = threading.Thread(target=thief)
    t.start()
    done = leases.run_sharded(st, ws, SlowEngine(), "w1",
                              io_backend="y4m", part_ext=".y4m",
                              stale_after=0.2, queue=q1)
    stop_thief.set()
    t.join()
    assert done == 0  # abandoned, not counted
    assert ws.completed_parts(".y4m") == []  # w1 did not commit the part
    # the thief's lease survived w1's exit path (owner-checked release)
    with open(q1._lease_path(0)) as f:
        assert f.read() == "w2"


def test_two_workers_complete_job(tmp_path):
    """Two concurrent workers share one segment queue; every frame appears
    exactly once in the final concat (BASELINE.json config #5's CPU-mesh
    analog)."""
    ws, st = _make_job(tmp_path, num_frames=24, seg=4)  # 6 segments
    counts = {}

    def worker(wid):
        counts[wid] = leases.run_sharded(
            st, ws, FakeEngine(), wid, io_backend="y4m", part_ext=".y4m"
        )

    ts = [threading.Thread(target=worker, args=(w,)) for w in ("w1", "w2")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert sum(counts.values()) == 6
    q = leases.SegmentLeaseQueue(ws, "main", part_ext=".y4m")
    assert q.all_done(st.pending)

    final = dataclasses.replace(st, pending=[])
    scheduler.finalize(final, ws, io_backend="y4m", part_ext=".y4m")
    rd = reader.Y4MReader(str(tmp_path / "out.y4m"))
    lumas = [int(f[12, 16, 0]) for f in rd.read_range(0, rd.frame_count())]
    assert len(lumas) == 24
    for i, v in enumerate(lumas):
        assert abs(v - (20 + 8 * i)) <= 2, (i, v)


def test_trainer_with_tensor_parallel_axis():
    """dp x sp x tp mesh: conv kernels sharded on output channels; the
    training step compiles, runs, and converges like the unsharded one."""
    from reve_tpu.models import srvgg
    from reve_tpu.train.trainer import Trainer, TrainConfig

    mesh = mesh_lib.make_mesh(jax.devices(), axis_names=("dp", "sp", "tp"),
                              max_sp=2, max_tp=2)
    assert mesh.shape["tp"] == 2
    cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=1, upscale=2)
    tr = Trainer(cfg, TrainConfig(learning_rate=3e-3), mesh=mesh)
    # verify a conv kernel is actually sharded over tp
    w = tr.params["convs"][1]["w"]
    assert "tp" in str(w.sharding.spec)
    rs = np.random.RandomState(0)
    hr = rs.rand(4, 32, 32, 3).astype(np.float32)
    lr = hr[:, ::2, ::2, :]
    losses = [tr.step(lr, hr) for _ in range(20)]
    assert losses[-1] < losses[0] * 0.95, losses[::5]


def test_distributed_identity_single_process():
    from reve_tpu.parallel import distributed

    ident = distributed.initialize()  # no coordinator env -> no-op path
    assert ident.process_index == 0
    assert ident.process_count == 1
    assert ident.worker_id.endswith("-p0")


def test_finalize_election(tmp_path):
    """Exactly one of N workers that all observe all_done may finalize
    (O_EXCL finalize lease); a stale finalize lease with no output is
    stealable (elected finalizer crashed)."""
    import os
    import time

    ws, st = _make_job(tmp_path)
    out = st.output_path
    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.3, part_ext=".y4m")
    q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.3, part_ext=".y4m")
    wins = [q.claim_finalize(out) for q in (q1, q2)]
    assert wins == [True, False]
    # winner crashed without producing output: lease goes stale -> stealable
    time.sleep(0.4)
    assert not os.path.exists(out)
    assert q2.claim_finalize(out) is True
    # but with the output present, nobody re-finalizes even when stale
    with open(out, "w") as f:
        f.write("x")
    time.sleep(0.4)
    assert q1.claim_finalize(out) is False


def test_heartbeat_prevents_steal(tmp_path):
    """A live worker's lease is renewed by the heartbeat, so a long segment
    (longer than stale_after) is never stolen mid-flight — the round-1
    double-writer hazard (ADVICE.md: run_sharded never called renew)."""
    import time

    ws, st = _make_job(tmp_path)
    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.5, part_ext=".y4m")
    q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.5, part_ext=".y4m")
    seg = q1.claim(st.pending)
    with leases._Heartbeat(q1, seg, interval=0.1):
        time.sleep(1.2)  # well past stale_after
        other = q2.claim(st.pending)
        assert other is not None and other.index != seg.index
        q2.release(other)
    # heartbeat stopped ("crash"): now it goes stale and is stealable
    time.sleep(0.7)
    stolen = q2.claim(st.pending)
    assert stolen is not None and stolen.index == seg.index


@pytest.mark.slow
def test_cross_process_kill9_takeover(tmp_path):
    """Two OS-process shard workers; one is SIGKILLed mid-job. The survivor
    steals the stale lease, completes every segment, and finalizes exactly
    once (VERDICT round-1: thread-only takeover coverage was not enough)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    inp = str(tmp_path / "in.y4m")
    n_frames = 48
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(n_frames):
            wr.write(np.full((24, 32, 3), 10 + 4 * i, np.uint8))
    out = str(tmp_path / "out.y4m")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def spawn(wid, extra_env=None):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        if extra_env:
            env.update(extra_env)
        code = (
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "import sys\n"
            "from reve_tpu import cli\n"
            f"sys.exit(cli.run(['-i', {inp!r}, '-s', '2', {out!r}, '--yes',"
            "'--io-backend', 'y4m', '-S', '6', '--batch', '4',"
            "'--dtype', 'float32', '--lease-stale-after', '2',"
            f"'--shard-worker', {wid!r}, '--keep-workspace']))"
        )
        return subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(tmp_path),
        )

    ws_dir = out + ".revework"
    p1 = spawn("w1", {"REVE_TEST_SLOW_SEGMENT": "0.6"})
    # wait until w1 holds a lease (is mid-segment), then SIGKILL it
    lease_dir = os.path.join(ws_dir, "leases")
    deadline = time.time() + 60
    while time.time() < deadline:
        if os.path.isdir(lease_dir) and any(
            f.endswith(".lease") for f in os.listdir(lease_dir)
        ):
            break
        time.sleep(0.05)
    else:
        p1.kill()
        raise AssertionError("w1 never claimed a lease")
    os.kill(p1.pid, signal.SIGKILL)
    p1.wait(timeout=30)

    p2 = spawn("w2")
    stdout, stderr = p2.communicate(timeout=300)
    assert p2.returncode == 0, stderr[-2000:]
    rd = reader.Y4MReader(out)
    assert rd.frame_count() == n_frames
    # frame-exactness across the takeover: the input is a luma ramp with
    # step 4, and the (deterministic) model preserves ordering — a duplicated
    # frame would give a ~0 step, a dropped one ~8 (the engine runs with
    # random-init weights here, so absolute values carry a small DC offset)
    lumas = [int(f[12, 16, 0]) for f in rd.read_range(0, n_frames)]
    diffs = [b - a for a, b in zip(lumas, lumas[1:])]
    assert all(2 <= d <= 6 for d in diffs), (lumas, diffs)
    # w2 won the finalize election (its id is in the lease)
    with open(os.path.join(lease_dir, "finalize.lease")) as f:
        assert f.read() == "w2"


def test_stolen_lease_owner_checks(tmp_path):
    """A presumed-dead worker that resumes must neither delete nor freshen
    the thief's lease (release/renew are owner-checked); stealing goes
    through an atomic rename so racing stealers cannot double-claim."""
    import os
    import time

    ws, st = _make_job(tmp_path)
    q1 = leases.SegmentLeaseQueue(ws, "w1", stale_after=0.2, part_ext=".y4m")
    s = q1.claim(st.pending)
    time.sleep(0.3)
    q2 = leases.SegmentLeaseQueue(ws, "w2", stale_after=0.2, part_ext=".y4m")
    assert q2.claim(st.pending).index == s.index  # stolen
    path = q2._lease_path(s.index)
    # w1 resumes: its release must be a no-op on w2's lease...
    q1.release(s)
    assert os.path.exists(path)
    with open(path) as f:
        assert f.read() == "w2"
    # ...and its heartbeat must not freshen it
    old = os.path.getmtime(path)
    os.utime(path, (old - 100, old - 100))
    q1.renew(s)
    assert os.path.getmtime(path) < old - 50
    # the rightful owner's renew does freshen
    q2.renew(s)
    assert os.path.getmtime(path) >= old - 1


def test_clean_stale_tmp_keeps_live_workers_tmps(tmp_path):
    """repair on worker B must not delete worker A's in-flight tmp part
    (pid-suffixed, owner alive); dead owners' and own tmps are removed."""
    import os

    ws, st = _make_job(tmp_path)
    os.makedirs(ws.parts_dir, exist_ok=True)
    own = ws.part_tmp_path(0, ".y4m")
    alive = os.path.join(ws.parts_dir, "000001.tmp1.y4m")      # pid 1 lives
    dead = os.path.join(ws.parts_dir, "000002.tmp999999.y4m")  # no such pid
    for p in (own, alive, dead):
        with open(p, "w") as f:
            f.write("x")
    n = ws.clean_stale_tmp()
    assert n == 2
    assert os.path.exists(alive)
    assert not os.path.exists(own) and not os.path.exists(dead)


def test_finalize_refuses_missing_parts(tmp_path):
    """finalize must not silently concat a truncated output when a planned
    segment's part never committed (e.g. a hung encoder)."""
    import os

    import pytest as _pytest

    from reve_tpu.pipeline.scheduler import PipelineError, finalize

    ws, st = _make_job(tmp_path)
    os.makedirs(ws.parts_dir, exist_ok=True)
    # commit only segment 0 of the multi-segment plan
    with writer.Y4MWriter(ws.part_tmp_path(0, ".y4m"), 32, 32,
                          fractions.Fraction(24)) as wr:
        wr.write(np.zeros((32, 32, 3), np.uint8))
    ws.commit_part(0, ".y4m")
    with _pytest.raises(PipelineError, match="missing"):
        finalize(st, ws, io_backend="y4m", part_ext=".y4m")


def test_sharded_engine_hbm_chunking_matches_single_device(monkeypatch):
    """A dp mesh must not bypass the HBM execution planner (round-3
    review: the whole-frame chunker early-returned on mesh engines, so a
    sharded 4K batch would compile the full batch and OOM where the
    single-device path chunks).  The chunk must stay a dp multiple so the
    P('dp') sharding survives the split, and outputs stay byte-identical
    to the unchunked single-device engine."""
    from reve_tpu.pipeline import engine as engine_mod
    from reve_tpu.pipeline.engine import UpscaleEngine

    mesh = mesh_lib.make_mesh(jax.devices(), max_sp=1)  # dp=8
    frames = np.random.RandomState(7).randint(
        0, 256, (16, 16, 20, 3), np.uint8)
    kw = dict(model="realesr-animevideov3", scale=2, batch_size=16,
              compute_dtype="float32", tile=0)
    ref = UpscaleEngine(**kw).submit(frames).result()

    sharded = UpscaleEngine(mesh=mesh, **kw)
    # budget of one frame: per-device share is 2 frames -> must chunk
    per = sharded._frame_bytes(16, 20) + sharded._epi_bytes(16, 20)
    monkeypatch.setattr(engine_mod, "_HBM_BUDGET_BYTES", per)
    tile, wf_chunk, _ = sharded._plan_execution(16, 20)
    assert tile == 0
    assert wf_chunk == 8  # 1 frame/device x dp=8; two dispatches of 8
    out = sharded.submit(frames).result()
    np.testing.assert_array_equal(out, ref)


def test_int8_sharded_engine_matches_single_device():
    """int8 turbo on a dp mesh: calibration runs on the dp-sharded batch
    and the quantized body is replicated — with identical injected scales
    the sharded output must equal the single-device int8 output exactly
    (integer hidden stack; the determinism contract that makes sharded
    int8 jobs byte-stable across workers)."""
    from jax.sharding import Mesh
    from reve_tpu.pipeline.engine import UpscaleEngine

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    frames = np.random.RandomState(3).randint(
        0, 256, (4, 16, 20, 3), np.uint8
    )
    kw = dict(model="realesr-animevideov3", scale=2, batch_size=4,
              compute_dtype="int8", tile=-1)
    single = UpscaleEngine(**kw)
    out_1 = single.submit(frames).result()
    maxima = single.get_calibration()
    assert maxima is not None

    sharded = UpscaleEngine(mesh=mesh, **kw)
    sharded.set_calibration(maxima)
    out_s = sharded.submit(frames).result()
    np.testing.assert_array_equal(out_s, out_1)
    np.testing.assert_array_equal(sharded.get_calibration(), maxima)
