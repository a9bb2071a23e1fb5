"""Web service: the GUI analog, as a thin HTTP layer over the pipeline core.

The reference bundles a Tauri+Vue3 desktop GUI (reve-gui/) whose backend
re-spawns the upscaler binary directly, bypassing segmentation and resume
(SURVEY.md §1).  The idiomatic equivalent for a TPU host is a small web
service sharing the real pipeline: a single-page UI plus a JSON API.

API (cf. the six Tauri commands, reve-gui/src-tauri/src/main.rs:12-19):
    GET  /api/version            <- get_version
    GET  /api/config             <- load_configuration
    POST /api/config             <- write_configuration
    POST /api/log                <- write_log (config-gated)
    POST /api/jobs {input,scale,model[,output]}  <- upscale_single_video
    GET  /api/jobs               job list + live progress
    GET  /api/jobs/<id>
    POST /api/suffix {path,factor,ext}           <- replace_file_suffix
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from reve_tpu.service import config as config_mod
from reve_tpu.service.jobs import JobManager, replace_file_suffix
from reve_tpu.service.logger import ServiceLogger
from reve_tpu.version import __version__

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>reve-tpu</title>
<style>
 body{font-family:system-ui;margin:2rem;max-width:720px;background:#14141a;color:#eee}
 input,select,button{font-size:1rem;margin:.25rem;padding:.35rem;background:#232330;color:#eee;border:1px solid #444}
 .job{border:1px solid #333;padding:.6rem;margin:.5rem 0;border-radius:6px}
 .bar{height:8px;background:#333;border-radius:4px;overflow:hidden}
 .bar>div{height:100%;background:#4a9eff}
 .err{color:#f66;white-space:pre-wrap}
</style></head><body>
<h2>reve-tpu <small id=v></small></h2>
<div>
 <input id=path placeholder="/path/to/video.mp4" size=42>
 <select id=model></select>
 <select id=scale><option>2</option><option>3</option><option>4</option></select>x
 <button onclick="go()">Upscale</button>
</div>
<div id=jobs></div>
<script>
fetch('/api/version').then(r=>r.json()).then(d=>v.textContent=d.version);
fetch('/api/models').then(r=>r.json()).then(ms=>{
 model.innerHTML=ms.map(m=>`<option>${m.name}</option>`).join('');
});
async function go(){
 await fetch('/api/jobs',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({input:path.value,scale:+scale.value,model:model.value})});
 refresh();
}
async function refresh(){
 const js=await (await fetch('/api/jobs')).json();
 jobs.innerHTML=js.map(j=>{
  const p=j.progress?j.progress.encode:null;
  const pct=p&&p.total?Math.round(100*p.done/p.total):0;
  return `<div class=job><b>#${j.id}</b> ${j.input} &rarr; x${j.scale} [${j.status}]
   <div class=bar><div style="width:${pct}%"></div></div>
   ${p?`${p.done}/${p.total} frames (${p.rate} fps)`:''}
   ${j.error?`<div class=err>${j.error}</div>`:''}</div>`;
 }).join('');
}
setInterval(refresh,1000);refresh();
</script></body></html>"""


class Handler(BaseHTTPRequestHandler):
    manager: JobManager = None
    cfg: config_mod.ServiceConfig = None
    logger: ServiceLogger = None

    def log_message(self, *args):  # quiet
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self):
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/api/version":
            self._json({"version": __version__})
        elif self.path == "/api/models":
            from reve_tpu.models import registry

            self._json([
                {"name": name, "arch": spec.arch,
                 "scales": [spec.upscale] if spec.upscale else [2, 3, 4]}
                for name, spec in registry.list_models()
            ])
        elif self.path == "/api/config":
            self._json(self.cfg.to_json())
        elif self.path == "/api/jobs":
            self._json(self.manager.list_jobs())
        elif self.path.startswith("/api/jobs/"):
            try:
                job = self.manager.get(int(self.path.rsplit("/", 1)[1]))
            except ValueError:
                job = None
            if job is None:
                self._json({"error": "no such job"}, 404)
            else:
                self._json(job.to_json())
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        try:
            data = self._body()
        except json.JSONDecodeError:
            return self._json({"error": "bad json"}, 400)
        if self.path == "/api/config":
            cfg = config_mod.ServiceConfig.from_json(data)
            if not cfg.validate():
                return self._json({"error": "invalid configuration"}, 400)
            config_mod.save(cfg)
            self.cfg.__dict__.update(cfg.__dict__)
            self._json(cfg.to_json())
        elif self.path == "/api/log":
            written = self.logger.write(str(data.get("message", "")))
            self._json({"written": written})
        elif self.path == "/api/suffix":
            self._json({
                "path": replace_file_suffix(
                    data["path"], int(data.get("factor", 2)),
                    data.get("ext", "mp4"),
                )
            })
        elif self.path == "/api/jobs":
            import os

            inp = data.get("input", "")
            if not inp or not os.path.exists(inp):
                return self._json({"error": "input path not found"}, 400)
            job = self.manager.submit(
                inp, scale=data.get("scale"), model=data.get("model"),
                output_path=data.get("output"),
            )
            self._json(job.to_json(), 201)
        else:
            self._json({"error": "not found"}, 404)


    def do_DELETE(self):
        if self.path.startswith("/api/jobs/"):
            try:
                job_id = int(self.path.rsplit("/", 1)[1])
            except ValueError:
                return self._json({"error": "bad job id"}, 400)
            if self.manager.cancel(job_id):
                self._json({"cancelled": job_id})
            else:
                self._json({"error": "not cancellable"}, 409)
        else:
            self._json({"error": "not found"}, 404)


def make_server(host="127.0.0.1", port=8321, cfg=None, manager=None,
                io_backend: Optional[str] = None) -> ThreadingHTTPServer:
    cfg = cfg or config_mod.load()
    handler = type("BoundHandler", (Handler,), {})
    handler.cfg = cfg
    handler.manager = manager or JobManager(cfg, io_backend=io_backend)
    handler.logger = ServiceLogger(cfg)
    return ThreadingHTTPServer((host, port), handler)


def main():
    import argparse

    ap = argparse.ArgumentParser(prog="reve-serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    args = ap.parse_args()
    server = make_server(args.host, args.port)
    print(f"reve-tpu service on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
