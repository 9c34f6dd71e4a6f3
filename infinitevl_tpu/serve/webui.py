"""Training web board: the dependency-free counterpart of the reference's
Gradio LlamaBoard (src/llamafactory/webui/, 5.5K LoC).

One page served from the stdlib HTTP server:
- a config form covering the common TrainArgs/DataArgs/FinetuneArgs knobs,
  with YAML preview (LlamaBoard's "preview command")
- start/abort for a single background training run (run_exp in a thread;
  LlamaBoard's Runner also serializes to one run)
- live metric charts polled from the run's trainer_log.jsonl (one small
  chart per metric — loss / reward / kl / tokens_per_sec have different
  scales, so they never share an axis)

Launch: `python -m infinitevl_tpu.cli board --port 7860` or
`from infinitevl_tpu.serve.webui import run_board`.
"""

from __future__ import annotations

import json
import os
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional


class TrainRunner:
    """Single in-flight training run (webui/runner.py equivalent)."""

    def __init__(self):
        self.thread: Optional[threading.Thread] = None
        self.abort_event = threading.Event()
        self.status: Dict[str, Any] = {"running": False}
        self.lock = threading.Lock()

    def start(self, config: Dict[str, Any]) -> Dict[str, Any]:
        from ..hparams import parse_args
        from ..train import trainer as trainer_mod

        with self.lock:
            if self.thread is not None and self.thread.is_alive():
                return {"error": "a run is already in progress"}
            try:
                args = parse_args(config)
            except (ValueError, TypeError) as e:
                return {"error": f"bad config: {e}"}
            self.abort_event.clear()
            self.status = {
                "running": True,
                "stage": args.finetune.stage,
                "output_dir": args.train.output_dir,
                "error": None,
            }

            def work():
                try:
                    trainer_mod.ABORT_EVENT = self.abort_event
                    trainer_mod.run_exp(args)
                    self.status["running"] = False
                except Exception as e:  # surfaced to the board
                    self.status["running"] = False
                    self.status["error"] = f"{type(e).__name__}: {e}"
                    traceback.print_exc()
                finally:
                    trainer_mod.ABORT_EVENT = None

            self.thread = threading.Thread(target=work, daemon=True)
            self.thread.start()
            return {"ok": True, "output_dir": args.train.output_dir}

    def abort(self) -> Dict[str, Any]:
        self.abort_event.set()
        return {"ok": True, "aborting": self.thread is not None and self.thread.is_alive()}


class ExportRunner:
    """Background HF-safetensors + ollama-Modelfile export (the reference
    LlamaBoard's export tab, webui/components/export.py role)."""

    def __init__(self):
        self.status: Dict[str, Any] = {"state": "idle"}
        self._thread = None
        self._lock = threading.Lock()

    def start(self, config: Dict[str, Any]) -> Dict[str, Any]:
        with self._lock:
            if self._thread and self._thread.is_alive():
                return {"error": "export already running"}
            # set synchronously: the UI polls right after POST and must not
            # observe 'idle' while the worker is still importing/parsing
            self.status = {
                "state": "running",
                "output_dir": config.get("output_dir", "output"),
            }

            def work():
                try:
                    from ..cli import _build_generator
                    from ..data.template import (
                        get_ollama_modelfile,
                        get_template,
                    )
                    from ..hparams import parse_args
                    from ..utils.checkpoint import export_hf_safetensors

                    args = parse_args(dict(config))
                    out = args.train.output_dir
                    self.status = {"state": "running", "output_dir": out}
                    gen, cfg = _build_generator(args)
                    export_hf_safetensors(gen.params, cfg, out)
                    with open(os.path.join(out, "Modelfile"), "w") as f:
                        f.write(
                            get_ollama_modelfile(
                                get_template(args.data.template)
                            )
                        )
                    self.status = {"state": "done", "output_dir": out}
                except Exception as e:  # noqa: BLE001 - surfaced to the UI
                    self.status = {
                        "state": "error",
                        "error": f"{type(e).__name__}: {e}",
                    }

            self._thread = threading.Thread(target=work, daemon=True)
            self._thread.start()
            return {
                "ok": True,
                "output_dir": config.get("output_dir", "output"),
            }


def _read_log(output_dir: str, limit: int = 2000):
    path = os.path.join(output_dir, "trainer_log.jsonl")
    if not os.path.exists(path):
        return []
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs[-limit:]


def make_board_handler(
    runner: TrainRunner,
    runs_root: str = "output",
    exporter: Optional[ExportRunner] = None,
):
    exporter = exporter or ExportRunner()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/board"):
                body = _BOARD_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/api/status":
                return self._json(200, runner.status)
            if self.path == "/api/export/status":
                return self._json(200, exporter.status)
            if self.path.startswith("/api/log"):
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                run = q.get("run", [runner.status.get("output_dir", "")])[0]
                # constrain to the runs root (no path traversal)
                full = os.path.realpath(run)
                roots = (os.path.realpath(runs_root), os.path.realpath("."))
                if not any(full.startswith(r + os.sep) or full == r for r in roots):
                    return self._json(400, {"error": "run outside runs root"})
                return self._json(200, {"records": _read_log(full)})
            if self.path == "/api/runs":
                runs = []
                if os.path.isdir(runs_root):
                    for name in sorted(os.listdir(runs_root)):
                        d = os.path.join(runs_root, name)
                        if os.path.exists(os.path.join(d, "trainer_log.jsonl")):
                            runs.append(d)
                return self._json(200, {"runs": runs})
            self._json(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError as e:
                return self._json(400, {"error": str(e)})
            if self.path == "/api/train":
                res = runner.start(req)
                return self._json(400 if "error" in res else 200, res)
            if self.path == "/api/abort":
                return self._json(200, runner.abort())
            if self.path == "/api/export":
                res = exporter.start(req)
                return self._json(400 if "error" in res else 200, res)
            self._json(404, {"error": "not found"})

    return Handler


def create_board_server(host="0.0.0.0", port=7860, runs_root="output"):
    runner = TrainRunner()
    server = ThreadingHTTPServer(
        (host, port), make_board_handler(runner, runs_root)
    )
    server.runner = runner  # type: ignore[attr-defined]
    return server


def run_board(host="0.0.0.0", port=7860, runs_root="output"):
    server = create_board_server(host, port, runs_root)
    print(f"training board at http://{host}:{port}/")
    server.serve_forever()


# Single-page board. Chart styling follows the dataviz spec: one metric per
# chart (no shared axes), single 2px series line (slot-1 blue #2a78d6),
# recessive 1px grid (#f0efec), text in ink tokens (#0b0b0b / #52514e) on the
# light surface (#fcfcfb), hover crosshair + tooltip.
_BOARD_HTML = """<!doctype html><html><head><title>InfiniteVL-TPU board</title>
<style>
body{font-family:system-ui,sans-serif;max-width:980px;margin:1.5em auto;
     background:#fcfcfb;color:#0b0b0b}
h2{margin:.2em 0} .sub{color:#52514e;font-size:13px;margin-bottom:1em}
fieldset{border:1px solid #e4e3df;border-radius:6px;margin-bottom:1em}
label{display:inline-block;margin:.25em .9em .25em 0;font-size:13px;color:#52514e}
input,select{font-size:13px;padding:2px 4px}
button{padding:.45em 1.1em;font-size:14px;margin-right:.5em;cursor:pointer}
#status{font-size:13px;color:#52514e;margin:.6em 0}
.chart{margin:10px 0} .chart h4{margin:0 0 2px;font-size:13px;color:#0b0b0b}
svg{background:#fcfcfb;border:1px solid #eeede9;border-radius:4px}
.tip{position:absolute;pointer-events:none;background:#fff;border:1px solid
 #d8d7d2;border-radius:4px;padding:2px 6px;font-size:12px;color:#0b0b0b;
 display:none}
pre{background:#f6f5f2;padding:8px;border-radius:4px;font-size:12px}
</style></head><body>
<h2>InfiniteVL-TPU training board</h2>
<div class=sub>configure &rarr; preview &rarr; start; metrics stream from trainer_log.jsonl</div>
<fieldset><legend>config</legend>
<label>stage <select id=stage>
 <option>sft</option><option>pt</option><option>dt</option><option>rm</option>
 <option>dpo</option><option>kto</option><option>ppo</option></select></label>
<label>preset <select id=config_preset><option>tiny</option><option>infinitevl_3b</option></select></label>
<label>dataset <input id=dataset value=demo size=12></label>
<label>dataset_dir <input id=dataset_dir value=data size=8></label>
<label>finetuning <select id=finetuning_type><option>full</option><option>lora</option><option>freeze</option></select></label>
<label>lr <input id=learning_rate value=1e-4 size=7></label>
<label>batch <input id=per_device_train_batch_size value=1 size=3></label>
<label>cutoff <input id=cutoff_len value=1024 size=6></label>
<label>max_steps <input id=max_steps value=100 size=6></label>
<label>output_dir <input id=output_dir value=output/board_run size=16></label>
<label><input type=checkbox id=bf16 checked> bf16</label>
</fieldset>
<button onclick=preview()>Preview YAML</button>
<button onclick=start()>Start</button>
<button onclick=abortRun()>Abort</button>
<div id=status>idle</div>
<fieldset><legend>export (HF safetensors + ollama Modelfile)</legend>
<label>checkpoint <input id=exp_model_path placeholder="(blank = random init)" size=22></label>
<label>preset <select id=exp_preset><option>tiny</option><option>infinitevl_3b</option></select></label>
<label>template <select id=exp_template><option>qwen2_vl</option><option>qwen</option><option>chatml</option><option>llama3</option></select></label>
<label>output_dir <input id=exp_out value=output/export size=16></label>
<button onclick=doExport()>Export</button>
<span id=exp_status></span>
</fieldset>
<pre id=yaml style="display:none"></pre>
<div id=charts></div>
<div id=tip class=tip></div>
<script>
const FORM=["stage","config_preset","dataset","dataset_dir","finetuning_type",
 "learning_rate","per_device_train_batch_size","cutoff_len","max_steps","output_dir"];
const NUM=new Set(["learning_rate","per_device_train_batch_size","cutoff_len","max_steps"]);
function cfg(){const c={};for(const k of FORM){let v=document.getElementById(k).value;
 if(NUM.has(k))v=Number(v);c[k]=v;}c.bf16=document.getElementById("bf16").checked;
 c.logging_steps=1;return c;}
function preview(){const c=cfg();const y=Object.entries(c).map(([k,v])=>k+": "+v).join("\\n");
 const el=document.getElementById("yaml");el.textContent=y;el.style.display="block";}
async function start(){const r=await fetch("/api/train",{method:"POST",
 headers:{"Content-Type":"application/json"},body:JSON.stringify(cfg())});
 const j=await r.json();
 document.getElementById("status").textContent=j.error?("error: "+j.error):("running -> "+j.output_dir);}
async function abortRun(){await fetch("/api/abort",{method:"POST",body:"{}"});}
async function doExport(){
 const c={config_preset:document.getElementById("exp_preset").value,
  template:document.getElementById("exp_template").value,
  output_dir:document.getElementById("exp_out").value};
 const mp=document.getElementById("exp_model_path").value;
 if(mp)c.model_name_or_path=mp;
 const r=await fetch("/api/export",{method:"POST",
  headers:{"Content-Type":"application/json"},body:JSON.stringify(c)});
 const j=await r.json();
 document.getElementById("exp_status").textContent=j.error||("started -> "+j.output_dir);
 pollExport();}
async function pollExport(){
 const s=await (await fetch("/api/export/status")).json();
 document.getElementById("exp_status").textContent=
  s.state+(s.error?" | "+s.error:"")+(s.state==="done"?" -> "+s.output_dir:"");
 if(s.state==="running")setTimeout(pollExport,2000);}
function chart(name,pts){
 const W=940,H=150,P=36;const xs=pts.map(p=>p[0]),ys=pts.map(p=>p[1]);
 const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
 const sx=s=>P+(x1>x0?(s-x0)/(x1-x0):0)*(W-2*P), sy=v=>H-24-(y1>y0?(v-y0)/(y1-y0):0.5)*(H-40);
 let g="";for(let i=0;i<4;i++){const yy=16+i*(H-40)/3;
  g+=`<line x1=${P} y1=${yy} x2=${W-8} y2=${yy} stroke="#f0efec"/>`
   + `<text x=4 y=${yy+4} font-size=10 fill="#52514e">${(y1-(y1-y0)*i/3).toPrecision(3)}</text>`;}
 const path=pts.map((p,i)=>(i?"L":"M")+sx(p[0]).toFixed(1)+","+sy(p[1]).toFixed(1)).join(" ");
 return `<div class=chart><h4>${name}</h4>
 <svg width=${W} height=${H} data-n="${name}" data-pts='${JSON.stringify(pts)}'>
 ${g}<path d="${path}" fill=none stroke="#2a78d6" stroke-width=2
  stroke-linejoin=round stroke-linecap=round/>
 <text x=${P} y=${H-6} font-size=10 fill="#52514e">step ${x0}</text>
 <text x=${W-60} y=${H-6} font-size=10 fill="#52514e">step ${x1}</text>
 <circle r=4 fill="#2a78d6" stroke="#fcfcfb" stroke-width=2 style="display:none"/>
 </svg></div>`;}
async function poll(){
 const st=await (await fetch("/api/status")).json();
 if(st.output_dir){
  const j=await (await fetch("/api/log?run="+encodeURIComponent(st.output_dir))).json();
  const recs=j.records||[];const metrics={};
  for(const r of recs)for(const k in r)if(k!=="step"&&typeof r[k]==="number")
   (metrics[k]=metrics[k]||[]).push([r.step,r[k]]);
  document.getElementById("charts").innerHTML=
   Object.entries(metrics).map(([k,v])=>chart(k,v)).join("");
  hookHover();
  const last=recs[recs.length-1];
  document.getElementById("status").textContent=
   (st.running?"running":"done")+(st.error?" | "+st.error:"")
   +(last?` | step ${last.step}`+(last.loss!==undefined?` loss ${last.loss}`:""):"");
 }
 setTimeout(poll,2000);}
function hookHover(){const tip=document.getElementById("tip");
 for(const svg of document.querySelectorAll("svg")){
  const pts=JSON.parse(svg.dataset.pts);const dot=svg.querySelector("circle");
  svg.onmousemove=e=>{const r=svg.getBoundingClientRect();
   const fx=(e.clientX-r.left-36)/(r.width-44);
   const i=Math.max(0,Math.min(pts.length-1,Math.round(fx*(pts.length-1))));
   const xs=pts.map(p=>p[0]),ys=pts.map(p=>p[1]);
   const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
   const cx=36+(x1>x0?(pts[i][0]-x0)/(x1-x0):0)*(r.width-44);
   const cy=150-24-(y1>y0?(pts[i][1]-y0)/(y1-y0):0.5)*(150-40);
   dot.setAttribute("cx",cx);dot.setAttribute("cy",cy);dot.style.display="block";
   tip.style.display="block";tip.style.left=(e.pageX+12)+"px";tip.style.top=(e.pageY-10)+"px";
   tip.textContent=`step ${pts[i][0]}: ${pts[i][1]}`;};
  svg.onmouseleave=()=>{dot.style.display="none";tip.style.display="none";};}}
poll();
</script></body></html>"""
