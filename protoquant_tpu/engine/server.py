"""Minimal HTTP serving frontend over the continuous-batching engine.

Stdlib-only (no FastAPI in scope): a ThreadingHTTPServer accepts JSON
requests and a single engine thread drives Engine.step() — requests enqueue
from any number of client connections and batch together on the device.

  POST /generate   {"tokens": [1,2,3], "max_new_tokens": 32, "eos_id": null}
      -> {"request": rid, "tokens": [...], "cancelled": false}
  (sampling temperature/top_k are engine-level EngineConfig settings)
  POST /cancel     {"request": rid} -> {"request": rid, "cancelled": bool}
      (the /generate call waiting on rid returns its partial tokens)
  GET  /metrics    -> Engine.metrics() + health
  GET  /health     -> {"ok": true}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .engine import Engine


class EngineServer:
    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 8199):
        self.engine = engine
        self._results: dict[int, list] = {}
        self._events: dict[int, threading.Event] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    return self._json(200, {"ok": True})
                if self.path == "/metrics":
                    return self._json(200, outer.engine.metrics())
                return self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path == "/cancel":
                    try:
                        n = int(self.headers.get("Content-Length", 0))
                        req = json.loads(self.rfile.read(n) or b"{}")
                        rid = int(req["request"])
                    except (KeyError, TypeError, ValueError, json.JSONDecodeError) as e:
                        return self._json(400, {"error": f"bad request: {e}"})
                    ok = outer.cancel(rid)
                    return self._json(200, {"request": rid, "cancelled": ok})
                if self.path != "/generate":
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    tokens = [int(t) for t in req["tokens"]]
                    max_new = int(req.get("max_new_tokens", 32))
                    eos_id = req.get("eos_id")
                    samp = {
                        k: (None if req.get(k) is None else cast(req[k]))
                        for k, cast in (
                            ("temperature", float), ("top_k", int),
                            ("top_p", float), ("min_p", float),
                        )
                    }
                    adapter_id = int(req.get("adapter_id", 0))
                    stop_sequences = [
                        [int(t) for t in seq]
                        for seq in (req.get("stop_sequences") or [])
                    ]
                except (KeyError, TypeError, ValueError, json.JSONDecodeError) as e:
                    return self._json(400, {"error": f"bad request: {e}"})
                try:
                    rid = outer.submit(
                        tokens, max_new, eos_id,
                        adapter_id=adapter_id,
                        stop_sequences=stop_sequences, **samp,
                    )
                except ValueError as e:  # engine-side validation (length etc.)
                    return self._json(400, {"error": str(e)})
                out = outer.wait(rid, timeout=float(req.get("timeout_s", 300)))
                if out is None:
                    return self._json(504, {"request": rid, "error": "timeout"})
                tokens, cancelled, logprobs = out
                return self._json(
                    200,
                    {
                        "request": rid,
                        "tokens": tokens,
                        "cancelled": cancelled,
                        **({"logprobs": logprobs} if logprobs else {}),
                    },
                )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._engine_thread = threading.Thread(target=self._engine_loop, daemon=True)

    # -- engine-side -------------------------------------------------------

    def submit(self, tokens, max_new, eos_id=None, **request_kwargs) -> int:
        with self._lock:
            rid = self.engine.add_request(
                tokens, max_new, eos_id=eos_id, **request_kwargs
            )
            self._events[rid] = threading.Event()
        return rid

    def cancel(self, rid: int) -> bool:
        with self._lock:
            return self.engine.cancel(rid)

    def wait(self, rid: int, timeout: float = 300.0):
        """Block until rid finishes; returns (tokens, cancelled, logprobs)
        or None on timeout."""
        ev = self._events[rid]
        if not ev.wait(timeout):
            return None
        with self._lock:
            self._events.pop(rid, None)
            return self._results.pop(rid)

    def _engine_loop(self):
        import time

        while not self._stop.is_set():
            with self._lock:
                has_work = self.engine.has_work()
                if has_work:
                    self.engine.step()
                    # Drain finished requests (once each) so neither the
                    # engine's finished list nor our maps grow unboundedly.
                    while self.engine.finished:
                        req = self.engine.finished.pop(0)
                        if req.rid in self._events:
                            self._results[req.rid] = (
                                req.out, req.cancelled, req.logprobs
                            )
                            self._events[req.rid].set()
            if not has_work:
                time.sleep(0.005)

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        self._http_thread.start()
        self._engine_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._httpd.shutdown()
