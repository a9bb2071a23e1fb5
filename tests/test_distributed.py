"""Multi-process jax.distributed burn-in (the multi-host story, for real).

Everything else in the suite simulates multi-chip with ONE process and 8
virtual devices; these tests spawn two REAL processes that join a
Gloo-backed jax.distributed cluster over loopback (tests/dist_worker.py)
— the exact bootstrap a 2-host deployment uses
(reve_tpu/parallel/distributed.py, SURVEY.md §2.4) — and prove:

  * the Trainer runs SPMD over the cross-process global mesh: both
    processes see identical losses, and those equal a single-process run
    on the same mesh shape (gradient psums really crossed the process
    boundary);
  * the lease-queue segment shard works with jax.distributed-derived
    worker identities across real process boundaries, with exactly one
    finalize election winner and a frame-exact output.

ROADMAP item 6 ("multi-host burn-in") minus the physical second host.
"""

import fractions
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two real OS processes over Gloo

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(mode, workdir, nproc=2, local_devices=2, timeout=420):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env.pop("JAX_PLATFORMS", None)  # the worker forces cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(i), str(nproc), str(port),
             workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-2000:]}"
        results.append(json.loads(line[-1][len("RESULT "):]))
    return results


def test_two_process_trainer_spmd(tmp_path):
    results = _spawn("trainer", str(tmp_path))
    a, b = sorted(results, key=lambda r: r["pid"])
    assert a["process_count"] == b["process_count"] == 2
    assert a["global_devices"] == 4 and a["local_devices"] == 2
    # SPMD: every process computes the same global losses
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=0, atol=0)
    assert a["losses"][-1] < a["losses"][0]  # it actually optimizes

    # the same mesh SHAPE in one process must agree numerically — the
    # cross-process psum computed the same gradients
    import jax

    from reve_tpu.models import srvgg
    from reve_tpu.parallel import mesh as mesh_lib
    from reve_tpu.train.trainer import Trainer, TrainConfig

    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    assert dict(mesh.shape) == a["mesh"]
    tr = Trainer(srvgg.SRVGGConfig(num_feat=8, num_conv=2, upscale=2),
                 TrainConfig(ema_decay=0.0), mesh=mesh, seed=0)
    rng = np.random.default_rng(0)
    lr = rng.random((4, 16, 16, 3), np.float32)
    hr = rng.random((4, 32, 32, 3), np.float32)
    want = [tr.step(lr, hr) for _ in range(3)]
    np.testing.assert_allclose(a["losses"], want, rtol=1e-5)


def test_two_process_lease_shard(tmp_path):
    from reve_tpu.io import reader, writer
    from reve_tpu.pipeline import planner, state

    num_frames, seg = 24, 4
    inp = str(tmp_path / "in.y4m")
    with writer.Y4MWriter(inp, 32, 24, fractions.Fraction(24)) as wr:
        for i in range(num_frames):
            wr.write(np.full((24, 32, 3), 20 + 8 * i, np.uint8))
    ws = state.Workspace(str(tmp_path / "ws"))
    ws.create()
    st = state.JobState(
        input_path=inp, output_path=str(tmp_path / "out.y4m"),
        scale=2, segment_size=seg, frame_count=num_frames,
        fps_num=24, fps_den=1, width=32, height=24,
        pending=planner.plan_segments(num_frames, seg),
    )
    ws.save(st)

    results = _spawn("leases", str(tmp_path), local_devices=1)
    assert sum(r["segments_done"] for r in results) == 6
    assert sum(1 for r in results if r["finalized"]) == 1
    ids = {r["worker_id"] for r in results}
    assert len(ids) == 2  # process_index-derived identities are distinct

    rd = reader.Y4MReader(str(tmp_path / "out.y4m"))
    assert rd.frame_count() == num_frames
    assert (rd.width, rd.height) == (64, 48)
