"""Multi-host failure recovery (SURVEY.md §5.3 — the recovery half).

Detection lives in engine/health.py (file heartbeats, step watchdog, NaN
probes). This module implements the documented recovery policy on top:

  1. every admitted request is journaled (prompt + params + progress) to an
     append-only JSONL file on shared storage;
  2. the serve loop runs under a peer-heartbeat monitor: a stale peer (or a
     hung collective — the step thread stops making progress while the
     monitor keeps polling) aborts serving instead of blocking forever on a
     collective that can never complete;
  3. a supervisor relaunches the surviving hosts as a smaller slice (the
     coordination service of a half-dead slice cannot be re-entered
     in-process — recovery is re-exec + ``jax.distributed.initialize`` over
     the survivors), restores params from the orbax checkpoint, and
     REPLAYS every unfinished journaled request from scratch. Greedy decode
     is deterministic, so a replay reproduces the exact token stream the
     lost run would have produced; live KV is never resharded or migrated
     (SURVEY §5.3: "no elastic resharding of live KV — requests replay").

End-to-end test: tests/test_multihost.py::test_engine_recovery_after_peer_death
(kills one of two serving processes mid-generation; the survivor detects,
re-serves the replayed request single-host, and the tokens match the
uninterrupted reference exactly).
"""

from __future__ import annotations

import json
import os
import threading
import time


class RequestJournal:
    """Append-only JSONL journal of request lifecycle events.

    One line per event: {"ev": "admit", "rid", "prompt", "max_new"} /
    {"ev": "token", "rid", "tok"} / {"ev": "done", "rid"}. Tolerates a torn
    final line (the writer may die mid-append). Tokens are journaled for
    observability; replay re-serves from the PROMPT (deterministic greedy
    makes the full stream reproducible, and re-running is the only correct
    option anyway — the emitted tokens' KV died with the slice).
    """

    def __init__(self, path: str):
        self.path = path
        self._f = None

    def _file(self):
        if self._f is None:
            self._f = open(self.path, "a", buffering=1)  # line-buffered
        return self._f

    def _write(self, rec: dict):
        self._file().write(json.dumps(rec) + "\n")
        self._file().flush()
        os.fsync(self._file().fileno())

    def record_admit(self, rid: int, prompt, max_new: int, **kw):
        self._write({"ev": "admit", "rid": rid, "prompt": list(prompt),
                     "max_new": max_new, **kw})

    def record_token(self, rid: int, tok: int):
        self._write({"ev": "token", "rid": rid, "tok": int(tok)})

    def record_done(self, rid: int):
        self._write({"ev": "done", "rid": rid})

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    @staticmethod
    def load(path: str) -> dict:
        """Parse a journal: {rid: {"prompt", "max_new", "tokens", "done"}}.
        Unparseable (torn) lines terminate the scan — everything before the
        tear is intact by construction (fsync per record)."""
        reqs: dict = {}
        if not os.path.exists(path):
            return reqs
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    break
                if rec["ev"] == "admit":
                    reqs[rec["rid"]] = {
                        "prompt": rec["prompt"], "max_new": rec["max_new"],
                        "tokens": [], "done": False,
                    }
                elif rec["ev"] == "token":
                    reqs[rec["rid"]]["tokens"].append(rec["tok"])
                elif rec["ev"] == "done":
                    reqs[rec["rid"]]["done"] = True
        return reqs

    @staticmethod
    def unfinished(path: str) -> dict:
        return {rid: r for rid, r in RequestJournal.load(path).items()
                if not r["done"]}


def journaled_add_request(engine, journal: RequestJournal, prompt,
                          max_new_tokens: int, **kw) -> int:
    """Engine.add_request + journal entry + token/done journaling hooks."""
    user_cb = kw.pop("on_token", None)

    def on_token(rid, tok):
        journal.record_token(rid, tok)
        if user_cb is not None:
            user_cb(rid, tok)

    rid = engine.add_request(prompt, max_new_tokens, on_token=on_token, **kw)
    journal.record_admit(rid, prompt, max_new_tokens)
    return rid


def serve_until_peer_failure(engine, peer_heartbeats, stale_after_s: float = 2.0,
                             poll_s: float = 0.1):
    """Drain the engine while monitoring peer heartbeat files.

    The engine loop runs in a worker thread; the caller's thread polls the
    peers. A dead peer leaves the step thread blocked inside a collective
    that can never complete (libtpu/XLA collectives are not interruptible
    from Python) — so on detection this returns ("peer_died", [paths]) with
    the thread abandoned; the caller must exit the process and let its
    supervisor re-exec into the recovery path.

    Returns ("ok", outputs) when the engine drains normally.
    """
    from .health import Heartbeat

    result: dict = {}

    def _run():
        try:
            result["outs"] = engine.run()
        except BaseException as e:  # surfaced to the caller below
            result["err"] = e

    def _dead():
        return [p for p in peer_heartbeats
                if not Heartbeat.is_alive(p, stale_after_s=stale_after_s)]

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    while t.is_alive():
        dead = _dead()
        if dead:
            return ("peer_died", dead)
        t.join(poll_s)
    if "err" in result:
        # The step may ERROR (rather than hang) when the distributed runtime
        # notices the lost peer first — give the heartbeat one staleness
        # window to confirm, and classify as peer death if it does.
        deadline = time.time() + 2 * stale_after_s
        while time.time() < deadline:
            dead = _dead()
            if dead:
                return ("peer_died", dead)
            time.sleep(poll_s)
        raise result["err"]
    return ("ok", result["outs"])


def replay_unfinished(engine, journal_path: str, journal: RequestJournal | None = None) -> dict:
    """Re-admit every unfinished journaled request into a fresh engine
    (typically single-host, params restored from the orbax checkpoint).

    Requests replay FROM THE PROMPT — the dead slice's KV is gone, and
    greedy decode reproduces the identical stream. Returns {old_rid:
    new_rid}. When ``journal`` is given, the replayed requests are journaled
    there too (so recovery itself is recoverable)."""
    mapping = {}
    for old_rid, rec in sorted(RequestJournal.unfinished(journal_path).items()):
        if journal is not None:
            mapping[old_rid] = journaled_add_request(
                engine, journal, rec["prompt"], rec["max_new"]
            )
        else:
            mapping[old_rid] = engine.add_request(rec["prompt"], rec["max_new"])
    return mapping


def wait_for_peers(hb_dir: str, nproc: int, timeout_s: float = 30.0):
    """Barrier on heartbeat-file existence (all peers up before serving)."""
    deadline = time.time() + timeout_s
    paths = [os.path.join(hb_dir, f"hb_{p}") for p in range(nproc)]
    while time.time() < deadline:
        if all(os.path.exists(p) for p in paths):
            return
        time.sleep(0.05)
    raise TimeoutError(f"peers not up after {timeout_s}s: {paths}")
