"""Minimal HTTP serving frontend over the continuous-batching engine.

Stdlib-only (no FastAPI in scope): a ThreadingHTTPServer accepts JSON
requests and a single engine thread drives Engine.step() — requests enqueue
from any number of client connections and batch together on the device.

  POST /generate   {"tokens": [1,2,3], "max_new_tokens": 32, "eos_id": null}
      -> {"request": rid, "tokens": [...], "cancelled": false}
  (sampling temperature/top_k default from EngineConfig; per-request
   overrides accepted in the body; "allowed_tokens": [ids] constrains
   every generated token to the set — the static slice of the engine's
   guided-decoding mask)
  POST /generate   {..., "stream": true}
      -> Server-Sent Events: one `data: {"request": rid, "token": t}` event
         per generated token AS IT DECODES, then a final
         `data: {"request": rid, "done": true, "tokens": [...], ...}`.
         A client disconnect mid-stream cancels the request (its slot and
         KV pages free on the next tick).
  POST /cancel     {"request": rid} -> {"request": rid, "cancelled": bool}
      (the /generate call waiting on rid returns its partial tokens)
  GET  /metrics    -> Engine.metrics() + health
  GET  /health     -> {"ok": true}

OpenAI-compatible surface (round 5) — drop-in for clients speaking the
completions API:

  POST /v1/completions   {"prompt": "...", "max_tokens": 32, "n": 2,
                          "logprobs": 3, "stop": ["\n"], "seed": 7, ...}
      -> {"id": "cmpl-<rid>", "object": "text_completion", "choices":
          [{"index", "text", "logprobs": {"tokens", "token_logprobs",
            "top_logprobs", "text_offset"}, "finish_reason"}], "usage"}
      ("prompt" may be a string (needs a server tokenizer) or a list of
       token ids; "logprobs": k maps onto the engine's top_logprobs=k;
       "stream": true sends OpenAI SSE chunks ending with `data: [DONE]`.
       Unsupported OpenAI fields raise 400 rather than silently ignoring:
       suffix, echo, best_of != n.)
  POST /v1/chat/completions  {"messages": [{"role", "content"}, ...], ...}
      -> chat.completion with an assistant message; messages render
         through a chat template (a generic ChatML-shaped default —
         deployments pass the served family's own via
         EngineServer(chat_template=...)); chat-layout logprobs
         (logprobs: true + top_logprobs: k); streaming sends
         chat.completion.chunk deltas (role in the first) then [DONE].
  GET  /v1/models -> the one served model
"""

from __future__ import annotations

import json
import queue as _queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .engine import Engine

_STREAM_DONE = object()  # sentinel closing a stream's token queue


def _default_chat_template(messages) -> str:
    """Generic role-tagged chat rendering (ChatML-shaped). Deployments
    should pass the served family's own template to EngineServer."""
    parts = [
        f"<|{m['role']}|>\n{m['content']}\n" for m in messages
    ]
    parts.append("<|assistant|>\n")
    return "".join(parts)


class EngineServer:
    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 8199,
                 tokenizer=None, model_name: str = "protoquant-tpu",
                 chat_template=None):
        self.engine = engine
        self.tokenizer = tokenizer  # optional protoquant_tpu.tokenizer.Tokenizer
        self.model_name = model_name  # echoed on the OpenAI surface
        # messages -> prompt text for /v1/chat/completions. The default is
        # a GENERIC role-tagged template; real deployments pass the model
        # family's own format (checkpoints are trained to one — a generic
        # template degrades instruction following, it does not break
        # decoding).
        self.chat_template = chat_template or _default_chat_template
        self._results: dict[int, list] = {}
        self._events: dict[int, threading.Event] = {}
        self._streams: dict[int, _queue.Queue] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()

        outer = self

        class Handler(BaseHTTPRequestHandler):
            # Chunked transfer (the streaming path) requires HTTP/1.1.
            protocol_version = "HTTP/1.1"

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
                if self.path == "/v1/models":
                    return self._json(200, {
                        "object": "list",
                        "data": [{"id": outer.model_name, "object": "model",
                                  "created": 0,
                                  "owned_by": "protoquant_tpu"}],
                    })
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
                chat = self.path == "/v1/chat/completions"
                oai = chat or self.path == "/v1/completions"
                if self.path != "/generate" and not oai:
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if oai:
                        req = outer._oai_translate(req, chat=chat)
                    if "prompt" in req and outer.tokenizer is not None:
                        tokens = outer.tokenizer.encode(str(req["prompt"]))
                    else:
                        tokens = [int(t) for t in req["tokens"]]
                    max_new = int(req.get("max_new_tokens", 32))
                    eos_id = req.get("eos_id")
                    samp = {
                        k: (None if req.get(k) is None else cast(req[k]))
                        for k, cast in (
                            ("temperature", float), ("top_k", int),
                            ("top_p", float), ("min_p", float),
                            ("presence_penalty", float),
                            ("frequency_penalty", float),
                        )
                    }
                    adapter_id = int(req.get("adapter_id", 0))
                    stop_sequences = [
                        [int(t) for t in seq]
                        for seq in (req.get("stop_sequences") or [])
                    ]
                    # Text-level stops (need a tokenizer): each string is
                    # encoded and matched as a token-suffix stop sequence.
                    if req.get("stop"):
                        if outer.tokenizer is None:
                            raise ValueError(
                                '"stop" strings need a server tokenizer '
                                '(use "stop_sequences" token ids instead)'
                            )
                        stops = req["stop"]
                        if isinstance(stops, str):
                            stops = [stops]
                        stop_sequences += [
                            outer.tokenizer.encode(str(t)) for t in stops
                        ]
                    min_new = int(req.get("min_new_tokens", 0))
                    # Guided decoding over HTTP (the static-set slice of
                    # Engine's logit_mask_fn): every generated token must
                    # come from "allowed_tokens".
                    logit_mask_fn = None
                    if req.get("allowed_tokens"):
                        import numpy as _np

                        V = outer.engine.model.cfg.vocab_size
                        ids = [int(t) for t in req["allowed_tokens"]]
                        if any(not 0 <= t < V for t in ids):
                            raise ValueError(
                                f"allowed_tokens ids out of range [0, {V})"
                            )
                        allow = _np.zeros(V, bool)
                        allow[ids] = True
                        logit_mask_fn = lambda toks, _m=allow: _m
                        # Static set: the engine skips the per-tick
                        # re-evaluation + full-vocab where().
                        logit_mask_fn.static_row = _np.where(
                            allow, 0.0, -1e30
                        ).astype(_np.float32)
                    # OpenAI-style logit_bias: {token_id: delta}
                    # (range-checked by Engine.add_request).
                    logit_bias = (
                        {int(k): float(v)
                         for k, v in req["logit_bias"].items()}
                        if req.get("logit_bias") else None
                    )
                    stream = bool(req.get("stream", False))
                    want_logprobs = bool(req.get("logprobs", False))
                    top_lp = int(req.get("top_logprobs", 0))
                    seed = req.get("seed")
                    n = int(req.get("n", 1))
                    if n < 1:
                        raise ValueError("n must be >= 1")
                except (KeyError, TypeError, ValueError, IndexError,
                        json.JSONDecodeError) as e:
                    return self._json(400, {"error": f"bad request: {e}"})
                if n > 1 and stream and not oai:
                    return self._json(
                        400, {"error": "n > 1 cannot stream on /generate "
                                       "(one SSE stream per completion; "
                                       "use /v1/completions, which "
                                       "interleaves indexed chunks)"}
                    )
                tok_q = _queue.Queue() if stream else None
                try:
                    # n > 1: admit n copies — they batch together on the
                    # device and sample independently (the categorical draw
                    # uses fresh noise per slot), OpenAI `n` semantics.
                    # Deterministic greedy copies would be identical, which
                    # is also the OpenAI behavior at temperature 0.
                    rids = [
                        outer.submit(
                            tokens, max_new, eos_id,
                            adapter_id=adapter_id,
                            stop_sequences=stop_sequences,
                            min_new_tokens=min_new,
                            stream_queue=tok_q,
                            logit_mask_fn=logit_mask_fn,
                            logit_bias=logit_bias,
                            logprobs=want_logprobs,
                            top_logprobs=top_lp,
                            # n seeded completions draw distinct streams
                            # (seed + i), each individually reproducible —
                            # the vLLM convention.
                            seed=(None if seed is None else int(seed) + i),
                            **samp,
                        )
                        for i in range(n)
                    ]
                    rid = rids[0]
                except ValueError as e:  # engine-side validation (length etc.)
                    return self._json(400, {"error": str(e)})
                timeout = float(req.get("timeout_s", 300))
                if stream:
                    if oai:
                        return self._stream_oai(
                            rids, tok_q, timeout, max_new, chat=chat,
                            usage_prompt_tokens=(
                                len(tokens)
                                if req.get("include_usage") else None
                            ),
                        )
                    return self._stream(rid, tok_q, timeout)
                import time as _time

                # One shared deadline across the n completions (NOT n full
                # timeouts in series — they decode concurrently anyway).
                deadline = _time.monotonic() + timeout

                def body(r):
                    out = outer.wait(
                        r, timeout=max(0.0, deadline - _time.monotonic())
                    )
                    if out is None:
                        return None
                    toks, cancelled, logprobs, top_lps = out
                    return {
                        "request": r,
                        "tokens": toks,
                        "cancelled": cancelled,
                        **({"text": outer.tokenizer.decode(toks)}
                           if outer.tokenizer is not None else {}),
                        **({"logprobs": logprobs} if logprobs else {}),
                        # OpenAI top_logprobs: per emitted token, the k
                        # most-likely [token_id, logprob] pairs.
                        **({"top_logprobs": top_lps} if top_lps else {}),
                    }

                results = [body(r) for r in rids]
                if any(r is None for r in results):
                    return self._json(504, {"request": rid, "error": "timeout"})
                if oai:
                    return self._json(200, outer._oai_response(
                        rid, results, len(tokens), max_new,
                        with_logprobs=want_logprobs or top_lp > 0,
                        chat=chat,
                    ))
                if n == 1:
                    return self._json(200, results[0])
                return self._json(200, {"choices": results})

            def _stream(self, rid: int, tok_q, timeout: float):
                """Server-Sent Events: one event per token as the engine
                emits it (the engine thread feeds tok_q from the request's
                on_token callback), then a final done event."""
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(obj) -> bool:
                    payload = f"data: {json.dumps(obj)}\n\n".encode()
                    try:
                        self.wfile.write(
                            f"{len(payload):x}\r\n".encode() + payload + b"\r\n"
                        )
                        self.wfile.flush()
                        return True
                    except (BrokenPipeError, ConnectionResetError):
                        return False

                import time

                deadline = time.monotonic() + timeout
                while True:
                    try:
                        item = tok_q.get(timeout=max(0.05, min(1.0, deadline - time.monotonic())))
                    except _queue.Empty:
                        if time.monotonic() > deadline:
                            chunk({"request": rid, "error": "timeout"})
                            outer.cancel(rid)
                            break
                        continue
                    item = item[0]  # (token | _STREAM_DONE, rid); one rid here
                    if item is _STREAM_DONE:
                        tokens, cancelled, logprobs, top_lps = outer.wait(
                            rid, timeout=5
                        )
                        # Per-token events carry ids only (a byte-level token
                        # can be a partial UTF-8 sequence); the done event
                        # carries the fully-decoded text.
                        chunk({
                            "request": rid, "done": True, "tokens": tokens,
                            "cancelled": cancelled,
                            **({"text": outer.tokenizer.decode(tokens)}
                               if outer.tokenizer is not None else {}),
                            **({"logprobs": logprobs} if logprobs else {}),
                            **({"top_logprobs": top_lps} if top_lps else {}),
                        })
                        break
                    if not chunk({"request": rid, "token": int(item)}):
                        # Client went away: free the slot/pages immediately.
                        outer.cancel(rid)
                        break
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass

            def _stream_oai(self, rids: list, tok_q, timeout: float,
                            max_new: int, chat: bool = False,
                            usage_prompt_tokens: int | None = None):
                """OpenAI streaming: one chunk per token, a final chunk per
                choice carrying its finish_reason, then `data: [DONE]`.
                n > 1 choices share one queue and interleave as indexed
                chunks — the official OpenAI n-streaming shape. Per-token
                text decodes ONE token at a time — byte-level tokens may
                render U+FFFD mid-multibyte; clients that need exact text
                reassemble from the non-stream endpoint."""
                import time

                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(payload: bytes) -> bool:
                    try:
                        self.wfile.write(
                            f"{len(payload):x}\r\n".encode() + payload
                            + b"\r\n"
                        )
                        self.wfile.flush()
                        return True
                    except (BrokenPipeError, ConnectionResetError):
                        return False

                def event(obj) -> bool:
                    return chunk(f"data: {json.dumps(obj)}\n\n".encode())

                created = int(time.time())
                index = {r: i for i, r in enumerate(rids)}
                rid0 = rids[0]  # one id per response, OpenAI-style
                need_role = set(rids)  # chat: role rides the first delta

                def piece(r, txt, fin):
                    if chat:
                        delta = {} if txt is None else {"content": txt}
                        if r in need_role and fin is None:
                            delta["role"] = "assistant"
                            need_role.discard(r)
                        choice = {"index": index[r], "delta": delta,
                                  "finish_reason": fin}
                        obj = "chat.completion.chunk"
                        pid = f"chatcmpl-{rid0}"
                    else:
                        choice = {"index": index[r], "text": txt or "",
                                  "finish_reason": fin}
                        obj = "text_completion"
                        pid = f"cmpl-{rid0}"
                    return {
                        "id": pid, "object": obj, "created": created,
                        "model": outer.model_name, "choices": [choice],
                    }

                live = set(rids)
                completion_total = 0
                deadline = time.monotonic() + timeout
                while live:
                    try:
                        item = tok_q.get(timeout=max(
                            0.05, min(1.0, deadline - time.monotonic())
                        ))
                    except _queue.Empty:
                        if time.monotonic() > deadline:
                            for r in live:
                                outer.cancel(r)
                                event(piece(r, None, "stop"))
                            live.clear()
                        continue
                    kind, r = item
                    if r not in live:
                        continue  # late token after a local cancel
                    if kind is _STREAM_DONE:
                        out = outer.wait(r, timeout=5)
                        tokens, cancelled = (
                            (out[0], out[1]) if out else ([], True)
                        )
                        fin = ("length"
                               if len(tokens) >= max_new and not cancelled
                               else "stop")
                        completion_total += len(tokens)
                        event(piece(r, None, fin))
                        live.discard(r)
                        continue
                    txt = (outer.tokenizer.decode([int(kind)])
                           if outer.tokenizer is not None else str(int(kind)))
                    if not event(piece(r, txt, None)):
                        for x in live:  # client went away: free everything
                            outer.cancel(x)
                        live.clear()
                if usage_prompt_tokens is not None:
                    # stream_options.include_usage: a final chunk with
                    # empty choices and the usage object, before [DONE].
                    event({
                        "id": (f"chatcmpl-{rid0}" if chat
                               else f"cmpl-{rid0}"),
                        "object": ("chat.completion.chunk" if chat
                                   else "text_completion"),
                        "created": created, "model": outer.model_name,
                        "choices": [],
                        "usage": {
                            "prompt_tokens": usage_prompt_tokens,
                            "completion_tokens": completion_total,
                            "total_tokens": (usage_prompt_tokens
                                             + completion_total),
                        },
                    })
                chunk(b"data: [DONE]\n\n")
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._engine_thread = threading.Thread(target=self._engine_loop, daemon=True)

    # -- OpenAI compatibility ---------------------------------------------

    def _oai_translate(self, req: dict, chat: bool = False) -> dict:
        """OpenAI completions / chat-completions body -> the internal
        /generate body. Raises ValueError (-> 400) on fields whose
        semantics we cannot honor — silent acceptance would lie to the
        client."""
        out = {}
        if chat:
            msgs = req.get("messages")
            if not isinstance(msgs, list) or not msgs or not all(
                isinstance(m, dict) and "role" in m and "content" in m
                for m in msgs
            ):
                raise ValueError(
                    'chat needs "messages": [{"role", "content"}, ...]'
                )
            if self.tokenizer is None:
                raise ValueError("chat completions need a server tokenizer")
            if req.get("tools") or req.get("tool_choice") \
                    or req.get("functions"):
                raise ValueError("tool/function calling is unsupported")
            out["prompt"] = self.chat_template(msgs)
        else:
            prompt = req.get("prompt", "")
            if isinstance(prompt, str):
                if self.tokenizer is None:
                    raise ValueError(
                        "string prompt needs a server tokenizer; pass a "
                        "list of token ids"
                    )
                out["prompt"] = prompt
            elif (isinstance(prompt, list)
                  and all(isinstance(t, int) for t in prompt)):
                out["tokens"] = prompt
            else:
                raise ValueError(
                    "prompt must be a string or a flat list of token ids "
                    "(batched prompts: issue one request per prompt)"
                )
            for bad in ("suffix", "echo"):
                if req.get(bad):
                    raise ValueError(f'"{bad}" is unsupported')
        n = int(req.get("n", 1))
        if req.get("best_of") not in (None, n):
            raise ValueError("best_of != n is unsupported (no server-side "
                             "reranking); set best_of == n or omit it")
        out["n"] = n
        out["max_new_tokens"] = int(
            req.get("max_completion_tokens") or req.get("max_tokens", 16)
        )
        # NOTE: an omitted temperature falls back to the SERVER's configured
        # EngineConfig default (not OpenAI's 1.0) — deployments pick their
        # own deterministic-vs-sampled default; pass temperature explicitly
        # for OpenAI-identical behavior.
        for k in ("temperature", "top_p", "presence_penalty",
                  "frequency_penalty", "seed", "logit_bias", "stop",
                  "stream", "timeout_s", "eos_id"):
            if req.get(k) is not None:
                out[k] = req[k]
        so = req.get("stream_options") or {}
        if so.get("include_usage"):
            out["include_usage"] = True
        if chat:
            # Chat API logprobs: bool + separate integer top_logprobs.
            if req.get("logprobs"):
                out["logprobs"] = True
                if req.get("top_logprobs") is not None:
                    out["top_logprobs"] = int(req["top_logprobs"])
        else:
            # Completions API "logprobs": int k -> chosen-token logprob
            # plus k alternatives per position (k=0: chosen-token only).
            lp = req.get("logprobs")
            if lp is not None:
                out["logprobs"] = True
                if int(lp):
                    out["top_logprobs"] = int(lp)
        return out

    def _oai_response(self, rid: int, results: list, prompt_tokens: int,
                      max_new: int, with_logprobs: bool,
                      chat: bool = False) -> dict:
        import time as _time

        def tstr(t):
            return (self.tokenizer.decode([t])
                    if self.tokenizer is not None else str(t))

        choices = []
        completion_tokens = 0
        for i, r in enumerate(results):
            toks = r["tokens"]
            completion_tokens += len(toks)
            fin = ("length" if len(toks) >= max_new and not r["cancelled"]
                   else "stop")
            fin = "stop" if r["cancelled"] else fin
            lp_obj = None
            if with_logprobs and chat:
                # Chat layout: logprobs.content = one entry per token with
                # nested top_logprobs [{token, logprob}].
                lp_obj = {"content": [
                    {
                        "token": tstr(t),
                        "logprob": lp,
                        "top_logprobs": [
                            {"token": tstr(at), "logprob": ap}
                            for at, ap in pairs
                        ],
                    }
                    for t, lp, pairs in zip(
                        toks, r.get("logprobs", []),
                        r.get("top_logprobs") or [[]] * len(toks),
                    )
                ]}
            elif with_logprobs:
                tok_strs = [tstr(t) for t in toks]
                offsets, pos = [], 0
                for s in tok_strs:
                    offsets.append(pos)
                    pos += len(s)
                lp_obj = {
                    "tokens": tok_strs,
                    "token_logprobs": r.get("logprobs", []),
                    "top_logprobs": ([
                        {tstr(t): p for t, p in pairs}
                        for pairs in r["top_logprobs"]
                    ] if r.get("top_logprobs") else None),
                    "text_offset": offsets,
                }
            body = {
                "index": i,
                "logprobs": lp_obj,
                "finish_reason": fin,
                # Extension: ids are authoritative when no tokenizer is
                # configured (text/content is empty then).
                "tokens": toks,
            }
            if chat:
                body["message"] = {"role": "assistant",
                                   "content": r.get("text", "")}
            else:
                body["text"] = r.get("text", "")
            choices.append(body)
        return {
            "id": f"{'chatcmpl' if chat else 'cmpl'}-{rid}",
            "object": "chat.completion" if chat else "text_completion",
            "created": int(_time.time()),
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": prompt_tokens,
                "completion_tokens": completion_tokens,
                "total_tokens": prompt_tokens + completion_tokens,
            },
        }

    # -- engine-side -------------------------------------------------------

    def submit(self, tokens, max_new, eos_id=None, stream_queue=None,
               **request_kwargs) -> int:
        on_token = None
        if stream_queue is not None:
            # Items are (token, rid) so n>1 OpenAI streams can share one
            # queue and interleave as indexed chunks.
            on_token = lambda rid, tok: stream_queue.put((tok, rid))
        with self._lock:
            rid = self.engine.add_request(
                tokens, max_new, eos_id=eos_id, on_token=on_token,
                **request_kwargs
            )
            self._events[rid] = threading.Event()
            if stream_queue is not None:
                self._streams[rid] = stream_queue
        return rid

    def cancel(self, rid: int) -> bool:
        with self._lock:
            return self.engine.cancel(rid)

    def wait(self, rid: int, timeout: float = 300.0):
        """Block until rid finishes; returns (tokens, cancelled, logprobs,
        top_lps) or None on timeout."""
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
                                req.out, req.cancelled, req.logprobs,
                                req.top_lps,
                            )
                            self._events[req.rid].set()
                        q = self._streams.pop(req.rid, None)
                        if q is not None:
                            q.put((_STREAM_DONE, req.rid))
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
