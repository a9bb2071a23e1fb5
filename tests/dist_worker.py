"""Worker entry for the 2-process jax.distributed burn-in tests.

Run as: python tests/dist_worker.py <mode> <pid> <nproc> <port> <workdir>

Each worker is a REAL separate process joining a Gloo-backed
jax.distributed cluster over 127.0.0.1 (the multi-host story of
reve_tpu.parallel.distributed, exercised for real instead of the
single-process virtual mesh).  Results are printed as one JSON line so
the parent test can assert across processes.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    mode, pid, nproc, port, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    from reve_tpu.parallel import distributed

    ident = distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    out = {"pid": pid, "worker_id": ident.worker_id,
           "process_count": ident.process_count,
           "local_devices": jax.local_device_count(),
           "global_devices": jax.device_count()}

    if mode == "trainer":
        from reve_tpu.models import srvgg
        from reve_tpu.parallel import mesh as mesh_lib
        from reve_tpu.train.trainer import Trainer, TrainConfig

        cfg = srvgg.SRVGGConfig(num_feat=8, num_conv=2, upscale=2)
        mesh = mesh_lib.make_mesh()  # GLOBAL devices across both processes
        tr = Trainer(cfg, TrainConfig(ema_decay=0.0), mesh=mesh, seed=0)
        # every process draws the same GLOBAL batch, then feeds only its
        # process-local shard (multi-host contract: the global batch is
        # the concatenation over process_index)
        rng = np.random.default_rng(0)
        lr = rng.random((4, 16, 16, 3), np.float32)
        hr = rng.random((4, 32, 32, 3), np.float32)
        per = lr.shape[0] // nproc
        sl = slice(pid * per, (pid + 1) * per)
        out["losses"] = [tr.step(lr[sl], hr[sl]) for _ in range(3)]
        out["mesh"] = dict(mesh.shape)
    elif mode == "leases":
        import dataclasses

        from reve_tpu.pipeline import leases, state
        from reve_tpu.pipeline.engine import UpscaleEngine

        ws = state.Workspace(os.path.join(workdir, "ws"))
        st = ws.load()
        engine = UpscaleEngine(scale=2, batch_size=4)
        done = leases.run_sharded(st, ws, engine, ident.worker_id,
                                  io_backend="y4m", part_ext=".y4m")
        out["segments_done"] = done
        queue = leases.SegmentLeaseQueue(ws, ident.worker_id,
                                         part_ext=".y4m")
        out["finalized"] = False
        if queue.all_done(list(st.pending)) and queue.claim_finalize(
                st.output_path):
            from reve_tpu.pipeline.scheduler import finalize
            finalize(dataclasses.replace(st, pending=[]), ws,
                     io_backend="y4m", part_ext=".y4m")
            out["finalized"] = True
    else:
        raise SystemExit(f"unknown mode {mode}")

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
