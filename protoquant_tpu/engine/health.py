"""Failure detection / watchdog / fault injection (SURVEY.md §5.3).

Serving-grade minimum: a host heartbeat, a decode-step timeout watchdog, and
NaN/Inf detection on the decode path (debug mode). Fault injection hooks let
tests verify the detection paths fire. Multi-host recovery policy (re-init
over the remaining slice + replay from checkpoint) is documented in
docs/ARCHITECTURE.md; the detection primitives here are what trigger it.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time

import jax.numpy as jnp
import numpy as np


class EngineHealthError(RuntimeError):
    pass


class Heartbeat:
    """Periodic liveness marker (file mtime), one per host process."""

    def __init__(self, path: str | None = None, interval_s: float = 5.0):
        self.path = path or os.path.join(
            tempfile.gettempdir(), f"protoquant_hb_{os.getpid()}"
        )
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self):
        with open(self.path, "w") as f:
            f.write(str(time.time()))

    def start(self):
        def loop():
            while not self._stop.wait(self.interval_s):
                self.beat()

        self.beat()
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()

    @staticmethod
    def is_alive(path: str, stale_after_s: float = 30.0) -> bool:
        try:
            with open(path) as f:
                return time.time() - float(f.read()) < stale_after_s
        except (OSError, ValueError):
            return False


class StepWatchdog:
    """Flags decode steps exceeding a wall-clock budget."""

    def __init__(self, budget_s: float = 30.0, on_timeout=None):
        self.budget_s = budget_s
        self.on_timeout = on_timeout
        self.timeouts = 0
        self.last_duration = 0.0

    def observe(self, duration_s: float):
        self.last_duration = duration_s
        if duration_s > self.budget_s:
            self.timeouts += 1
            if self.on_timeout is not None:
                self.on_timeout(duration_s)
            else:
                raise EngineHealthError(
                    f"decode step took {duration_s:.1f}s (> {self.budget_s}s budget)"
                )


def check_finite(name: str, arr) -> None:
    """NaN/Inf detection (debug mode — forces a device sync)."""
    a = np.asarray(arr, dtype=np.float32)
    if not np.all(np.isfinite(a)):
        bad = int(np.sum(~np.isfinite(a)))
        raise EngineHealthError(f"non-finite values in {name}: {bad} elements")


def inject_nan(cache, layer: int = 0):
    """Test-only fault injection: poison one layer's cache values."""
    import dataclasses

    c = cache[layer]
    if hasattr(c, "vs"):
        poisoned = dataclasses.replace(c, vs=c.vs.at[..., 0].set(jnp.nan))
    else:
        poisoned = dataclasses.replace(c, v=c.v.at[..., 0].set(jnp.nan))
    return cache[:layer] + [poisoned] + cache[layer + 1 :]
