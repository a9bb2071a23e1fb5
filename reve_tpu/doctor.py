"""`python -m reve_tpu.doctor` — environment diagnostics for deployments.

Checks every layer an operator depends on and prints one line per probe
(plus a JSON summary with --json): accelerator visibility and a tiny
compile, the native C++ core (build + mp4/mkv round trip), codec
availability (ffmpeg binaries / cv2 fallback), model registry + weight
resolution, and a micro end-to-end pipeline run.  Exit code 0 = all
required probes passed (warnings allowed), 1 otherwise.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

#: whole-run deadline (--timeout N overrides).  Normal runs finish in well
#: under a minute off-TPU and a few minutes on it (first compiles ~8 s
#: each); a dead accelerator relay blocks backend init/compiles FOREVER
#: inside native code (seen live in round 3: jax.devices() never
#: returned), so diagnostics must self-terminate with an honest verdict.
DEFAULT_TIMEOUT_S = 600.0


def _arm_hang_watchdog(timeout_s: float, results: list, want_json: bool):
    """Daemon thread that reports a wedged accelerator stack and
    hard-exits (code 2) if the probes haven't all completed in time —
    no Python-level deadline can interrupt a native-code hang, so the
    whole process goes.  Call .set() on the returned event when done."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if done.wait(timeout_s):
            return
        where = (f"hung after the {results[-1]['probe']!r} probe"
                 if results else "hung in the first ('accelerator') probe")
        entry = {"probe": "watchdog", "status": "fail", "required": True,
                 "detail": f"no response in {timeout_s:.0f}s ({where}) — "
                           f"accelerator stack wedged: backend init or "
                           f"compile is blocking in native code (dead "
                           f"TPU-relay link?)"}
        results.append(entry)
        print(f" [x] watchdog: {entry['detail']}", flush=True)
        if want_json:
            print(json.dumps({"ok": False, "probes": results}), flush=True)
        print("FAILURES above", file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done


def _probe(name, fn, required=True, results=None):
    try:
        detail = fn() or "ok"
        status = "ok"
    except Exception as e:  # noqa: BLE001 — diagnostics must not die
        detail = f"{type(e).__name__}: {e}"
        status = "fail" if required else "warn"
    results.append({"probe": name, "status": status, "detail": str(detail),
                    "required": required})
    mark = {"ok": "+", "warn": "!", "fail": "x"}[status]
    print(f" [{mark}] {name}: {detail}")
    return status


def _jax_device():
    import jax

    d = jax.devices()[0]
    return f"{d.platform} ({d.device_kind}), {len(jax.devices())} device(s)"


def _jax_compile():
    import jax
    import jax.numpy as jnp

    r = jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((128, 128)))
    assert float(r) == 3 * 128 * 128
    return "tiny jit compiled and ran"


def _native_core():
    from reve_tpu import native

    if not native.available():
        raise RuntimeError("reve_core.so unavailable (g++/make missing?)")
    assert native.plan_segments(10, 4) == [(0, 4), (4, 4), (8, 2)]
    return "built + planner parity"


def _native_mp4_mkv():
    import os

    import numpy as np

    from reve_tpu import native

    cv2 = __import__("cv2")
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "p.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                             (32, 32))
        for _ in range(3):
            wr.write(np.zeros((32, 32, 3), np.uint8))
        wr.release()
        native.concat_mp4([p], None, os.path.join(tmp, "o.mp4"))
        native.concat_mkv([p], None, os.path.join(tmp, "o.mkv"))
        assert native.probe_mp4(os.path.join(tmp, "o.mp4"))[
            "video_samples"] == 3
        assert native.probe_mkv(os.path.join(tmp, "o.mkv"))[
            "video_blocks"] == 3
    return "mp4 + mkv mux round trip"


def _codecs():
    notes = []
    for exe in ("ffmpeg", "ffprobe"):
        notes.append(f"{exe}: {'found' if shutil.which(exe) else 'absent'}")
    try:
        import cv2

        notes.append(f"cv2 {cv2.__version__}")
    except ImportError:
        notes.append("cv2: absent")
    return "; ".join(notes)


def _models():
    from reve_tpu.models import registry

    names = [n for n, _ in registry.list_models()]
    found = []
    for n in names:
        spec, _ = registry.parse_model_name(n)
        if registry._find_weight_files(spec.canonical):
            found.append(n)
    return (f"{len(names)} registered; weights on disk for "
            f"{found or 'none (deterministic random-init fallback)'}")


def _mini_pipeline():
    import fractions
    import os

    import numpy as np

    from reve_tpu import cli
    from reve_tpu.io import reader, writer

    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in.y4m")
        with writer.Y4MWriter(inp, 24, 16, fractions.Fraction(24)) as wr:
            for i in range(4):
                wr.write(np.full((16, 24, 3), 40 + i * 10, np.uint8))
        out = os.path.join(tmp, "out.y4m")
        rc = cli.run(["-i", inp, "-s", "2", out, "--yes",
                      "--io-backend", "y4m", "-S", "2", "--batch", "2",
                      "--dtype", "float32"])
        assert rc == 0
        rd = reader.Y4MReader(out)
        assert rd.frame_count() == 4 and rd.width == 48
    return "4-frame x2 upscale through the full pipeline"


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    timeout_s = DEFAULT_TIMEOUT_S
    if "--timeout" in argv:
        try:
            timeout_s = float(argv[argv.index("--timeout") + 1])
        except (IndexError, ValueError):
            print("--timeout needs a number of seconds", file=sys.stderr)
            return 1
    results: list = []
    print("reve-tpu doctor")
    done = _arm_hang_watchdog(timeout_s, results, "--json" in argv)
    _probe("accelerator", _jax_device, results=results)
    _probe("jit compile", _jax_compile, results=results)
    _probe("native core", _native_core, results=results)
    _probe("native mp4/mkv mux", _native_mp4_mkv, results=results)
    _probe("codecs", _codecs, required=False, results=results)
    _probe("model registry", _models, required=False, results=results)
    _probe("mini pipeline e2e", _mini_pipeline, results=results)
    done.set()
    ok = all(r["status"] != "fail" for r in results)
    if "--json" in argv:
        print(json.dumps({"ok": ok, "probes": results}))
    print("all good" if ok else "FAILURES above", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
